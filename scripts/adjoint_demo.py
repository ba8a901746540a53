# Adjoint-based inverse problem with the differentiable stepper:
# recover the fluid viscosity from velocity observations.
#
#   1. run a lid-driven cavity for N steps at mu_true -> "observations"
#   2. define J(mu) = || u_N(mu) - u_obs ||^2
#   3. jax.grad(J) — reverse-mode through all N projection steps, each
#      linear solve differentiated implicitly (lax.custom_linear_solve,
#      flow_tpu/navier_stokes/diffstep.py) — and descend.
#
# The reference stack (flow + dolfin + PETSc) has no adjoint capability;
# this is the payoff of the solver being pure functional JAX.
#
# Runs on CPU in ~1 min:  python scripts/adjoint_demo.py
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from flow_tpu import (
    DirichletBC,
    FunctionSpace,
    VectorFunctionSpace,
    project,
    unit_square_mesh,
)
from flow_tpu.navier_stokes import DiffStepper


def main(n=12, n_steps=5, mu_true=0.04, mu_guess=0.10, iters=25):
    mesh = unit_square_mesh(n, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    u_bcs = [
        DirichletBC(V, (1.0, 0.0), lambda x: x[:, 1] > 1 - 1e-12),
        DirichletBC(
            V, (0.0, 0.0),
            lambda x: (x[:, 1] < 1e-12) | (x[:, 0] < 1e-12) | (x[:, 0] > 1 - 1e-12),
        ),
    ]
    ds = DiffStepper(V, Q, u_bcs, [], rho=1.0, mu=mu_true, rotational_form=False)
    u0 = project((0.0, 0.0), V).vector
    p0 = project(0.0, Q).vector
    dt = jnp.asarray(1e-2)

    def forward(mu):
        U, P = u0, p0
        for _ in range(n_steps):
            U, P = ds.step(U, P, dt, mu=mu)
        return U

    u_obs = forward(jnp.asarray(mu_true))

    def J(lm):
        d = forward(jnp.exp(lm)) - u_obs
        return jnp.sum(d * d)

    # Newton's method on the scalar parameter: the curvature comes from
    # forward-over-reverse AD through every linear solve of every step
    # (second-order implicit differentiation "for free")
    val_grad = jax.jit(jax.value_and_grad(J))
    hess = jax.jit(jax.jacfwd(jax.grad(J)))

    lm = jnp.log(jnp.asarray(mu_guess))
    print(f"target mu = {mu_true}, initial guess = {mu_guess}")
    for k in range(iters):
        Jv, g = val_grad(lm)
        H = hess(lm)
        step = jnp.where(H > 0, -g / H, -jnp.sign(g) * 0.25)
        lm = lm + jnp.clip(step, -0.5, 0.5)
        print(f"  iter {k:3d}: J = {float(Jv):.6e}  mu = {float(jnp.exp(lm)):.6f}")
        if float(Jv) < 1e-22:
            break
    mu_rec = float(jnp.exp(lm))
    print(f"recovered mu = {mu_rec:.6f} (true {mu_true})")
    return mu_rec


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
