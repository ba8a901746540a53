# DiffStepper: reverse-mode differentiable projection step.
#
# (1) forward equivalence vs FastStepper's lagged branch (same discrete
#     step, increment-form solves) on both pressure paths (Dirichlet /
#     pure-Neumann), (2) adjoint gradients vs central finite differences
#     for d(QoI)/d(mu) and directional d(QoI)/d(U0) through TWO chained
#     steps (exercises the custom_linear_solve transpose solves).
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow_tpu import (
    DirichletBC,
    FunctionSpace,
    VectorFunctionSpace,
    project,
    unit_square_mesh,
)
from flow_tpu.navier_stokes.diffstep import DiffStepper
from flow_tpu.navier_stokes.fast import FastStepper


def _cavity(n=8):
    mesh = unit_square_mesh(n, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return x[:, 1] > 1.0 - 1e-12

    def walls(x):
        return (x[:, 1] < 1e-12) | (x[:, 0] < 1e-12) | (x[:, 0] > 1.0 - 1e-12)

    u_bcs = [
        DirichletBC(V, (1.0, 0.0), lid),
        DirichletBC(V, (0.0, 0.0), walls),
    ]
    return mesh, V, Q, u_bcs


def _channel(n=8):
    # open right boundary with p=0: exercises the Dirichlet pressure path
    mesh = unit_square_mesh(n, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    u_bcs = [
        DirichletBC(
            V,
            (lambda x: 4.0 * x[:, 1] * (1.0 - x[:, 1]), 0.0),
            lambda x: x[:, 0] < 1e-12,
        ),
        DirichletBC(
            V, (0.0, 0.0),
            lambda x: (x[:, 1] < 1e-12) | (x[:, 1] > 1.0 - 1e-12),
        ),
    ]
    p_bcs = [DirichletBC(Q, 0.0, lambda x: x[:, 0] > 1.0 - 1e-12)]
    return mesh, V, Q, u_bcs, p_bcs


@pytest.mark.parametrize("case", ["neumann", "dirichlet"])
def test_diffstep_forward_matches_faststepper(case):
    if case == "neumann":
        _, V, Q, u_bcs = _cavity()
        p_bcs = []
    else:
        _, V, Q, u_bcs, p_bcs = _channel()
    kw = dict(rho=1.0, mu=0.05, rotational_form=True)
    st = FastStepper(
        V, Q, u_bcs, p_bcs, convection="lagged", newton_tol=1e-13,
        pressure_rtol=1e-12, correction_rtol=1e-12, **kw
    )
    ds = DiffStepper(stepper=st, momentum_rtol=1e-12)
    u0 = project((0.0, 0.0), V).vector
    p0 = project(0.0, Q).vector
    dt = jnp.asarray(1e-2)
    Ua, Pa, _ = st.step(u0, p0, dt)
    Ub, Pb = ds.step(u0, p0, dt)
    np.testing.assert_allclose(np.asarray(Ub), np.asarray(Ua), atol=5e-10)
    np.testing.assert_allclose(np.asarray(Pb), np.asarray(Pa), atol=5e-9)


def _loss_fns(ds, u0, p0, dt, n_steps=2):
    def qoi(U, P):
        # kinetic-energy-like QoI touching both outputs
        return jnp.sum(U * U) + 0.1 * jnp.sum(P * P)

    def loss_mu(mu):
        U, P = u0, p0
        for _ in range(n_steps):
            U, P = ds.step(U, P, dt, mu=mu)
        return qoi(U, P)

    def loss_u0(U):
        Uc, P = U, p0
        for _ in range(n_steps):
            Uc, P = ds.step(Uc, P, dt)
        return qoi(Uc, P)

    return loss_mu, loss_u0


@pytest.mark.parametrize("case", ["neumann", "dirichlet"])
def test_diffstep_grad_mu_matches_fd(case):
    if case == "neumann":
        _, V, Q, u_bcs = _cavity()
        p_bcs = []
    else:
        _, V, Q, u_bcs, p_bcs = _channel()
    ds = DiffStepper(V, Q, u_bcs, p_bcs, rho=1.0, mu=0.05, rotational_form=True)
    u0 = project((0.0, 0.0), V).vector
    p0 = project(0.0, Q).vector
    dt = jnp.asarray(1e-2)
    loss_mu, _ = _loss_fns(ds, u0, p0, dt)
    mu0 = jnp.asarray(0.05)
    g = jax.grad(loss_mu)(mu0)
    h = 1e-5 * 0.05
    fd = (loss_mu(mu0 + h) - loss_mu(mu0 - h)) / (2 * h)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-5)


def test_diffstep_grad_u0_adjoint_matches_fd():
    _, V, Q, u_bcs = _cavity()
    ds = DiffStepper(V, Q, u_bcs, [], rho=1.0, mu=0.05, rotational_form=False)
    rng = np.random.default_rng(3)
    u0 = project((0.0, 0.0), V).vector
    p0 = project(0.0, Q).vector
    dt = jnp.asarray(1e-2)
    _, loss_u0 = _loss_fns(ds, u0, p0, dt)
    g = jax.grad(loss_u0)(u0)
    # directional derivative along a random free-dof direction
    v = jnp.asarray(rng.standard_normal(u0.shape))
    v = (1.0 - ds.st.mask_u) * v
    h = 1e-6
    fd = (loss_u0(u0 + h * v) - loss_u0(u0 - h * v)) / (2 * h)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=5e-6)


def test_diffstep_second_order_ad_matches_fd():
    # forward-over-reverse through custom_linear_solve: the curvature used
    # by scripts/adjoint_demo.py's Newton loop
    _, V, Q, u_bcs = _cavity(6)
    ds = DiffStepper(V, Q, u_bcs, [], rho=1.0, mu=0.05)
    u0 = project((0.0, 0.0), V).vector
    p0 = project(0.0, Q).vector
    dt = jnp.asarray(1e-2)

    def J(mu):
        U, P = u0, p0
        for _ in range(2):
            U, P = ds.step(U, P, dt, mu=mu)
        return jnp.sum(U * U)

    g = jax.grad(J)
    H = float(jax.jacfwd(g)(jnp.asarray(0.05)))
    h = 1e-5
    fdH = (float(g(jnp.asarray(0.05 + h))) - float(g(jnp.asarray(0.05 - h)))) / (2 * h)
    np.testing.assert_allclose(H, fdH, rtol=1e-5)


def test_diffstep_rollout_matches_loop_and_grad():
    # lax.scan rollout == Python loop of steps, forward AND gradient
    _, V, Q, u_bcs = _cavity(6)
    ds = DiffStepper(V, Q, u_bcs, [], rho=1.0, mu=0.05)
    u0 = project((0.0, 0.0), V).vector
    p0 = project(0.0, Q).vector
    dt = jnp.asarray(1e-2)

    def J_loop(mu):
        U, P = u0, p0
        for _ in range(4):
            U, P = ds.step(U, P, dt, mu=mu)
        return jnp.sum(U * U)

    def J_roll(mu):
        U, P = ds.rollout(u0, p0, dt, 4, mu=mu)
        return jnp.sum(U * U)

    mu0 = jnp.asarray(0.05)
    np.testing.assert_allclose(float(J_roll(mu0)), float(J_loop(mu0)), rtol=1e-12)
    np.testing.assert_allclose(
        float(jax.grad(J_roll)(mu0)), float(jax.grad(J_loop)(mu0)), rtol=1e-9
    )
