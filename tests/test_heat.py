# Heat / convection-diffusion operator tests: MMS time-convergence through
# the eval/solve_alpha_M_beta_F interface (reference flow/heat.py:92-122 via
# parabolic steppers), SUPG tau hand-check against the formula of
# flow/stabilization.py:74-130, and operator self-consistency.
import numpy as np
import jax.numpy as jnp
import pytest
import sympy

from helpers import compute_numerical_order_of_convergence, lambdify_xt

import flow_tpu
from flow_tpu import unit_square_mesh, FunctionSpace, DirichletBC, Function, project
from flow_tpu.heat import Heat
from flow_tpu import parabolic, stabilization


def _heat_mms(kappa, rho, cp, b):
    """Exact solution + matching source for u_t = kappa/(rho cp) lap(u)
    - b.grad(u) + s."""
    x = sympy.DeferredVector("x")
    t = sympy.symbols("t")
    theta = sympy.sin(sympy.pi * x[0]) * sympy.sin(sympy.pi * x[1]) * sympy.exp(-t)
    s = (
        sympy.diff(theta, t)
        - kappa / (rho * cp) * (sympy.diff(theta, x[0], 2) + sympy.diff(theta, x[1], 2))
        + b[0] * sympy.diff(theta, x[0])
        + b[1] * sympy.diff(theta, x[1])
    )
    return theta, sympy.simplify(s)


@pytest.mark.parametrize("supg", [False, True])
def test_heat_implicit_euler_order(supg):
    kappa, rho, cp = 0.5, 2.0, 1.0
    b = (1.0, 0.5)
    theta_sym, s_sym = _heat_mms(kappa, rho, cp, b)

    mesh = unit_square_mesh(16, diagonal="crossed")
    Q = FunctionSpace(mesh, 2)
    conv = project(b, flow_tpu.VectorFunctionSpace(mesh, 2))

    T = 0.25
    Dt = [T / 4, T / 8]
    errs = []
    for dt in Dt:
        theta0 = project(lambdify_xt(theta_sym, 0.0), Q)
        t = 0.0
        while t < T - 1e-12:
            bcs = [DirichletBC(Q, lambdify_xt(theta_sym, t + dt), "on_boundary")]
            op = Heat(
                Q, conv, kappa, rho, cp, bcs,
                lambdify_xt(s_sym, t + dt),
                supg_stabilization=supg,
            )
            theta0 = parabolic.ImplicitEuler(op).step(theta0, t, dt)
            t += dt
        errs.append(flow_tpu.errornorm(lambdify_xt(theta_sym, T), theta0))
    order = compute_numerical_order_of_convergence(Dt, np.array(errs))[0]
    assert order > 0.9, (errs, order)


def test_supg_tau_hand_value():
    # single right triangle, b=(1,0), eps=0.01, p=1:
    # directed diameter h = 4*|b|*area / sum|e x b| = 4*0.5/2 = 1
    # Pe = 0.5*1*1/0.01 = 50; xi = (1/tanh(50) - 1/50)/50
    # tau = h^2/(4 eps p) xi
    from flow_tpu.mesh import Mesh

    mesh = Mesh(np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]), np.array([[0, 1, 2]]))
    conv = jnp.array([[[1.0, 0.0]]])  # [nc=1, nq=1, 2]
    tau = stabilization.supg_tau(mesh, conv, 0.01, 1)
    xi = (1.0 / np.tanh(50.0) - 1.0 / 50.0) / 50.0
    expected = 1.0 / (4 * 0.01) * xi
    np.testing.assert_allclose(float(tau[0, 0]), expected, rtol=1e-12)
    # zero convection -> tau = 0 (the reference's early exit, :64-67)
    tau0 = stabilization.supg_tau(mesh, jnp.zeros((1, 1, 2)), 0.01, 1)
    assert float(tau0[0, 0]) == 0.0


def test_heat_eval_solve_roundtrip():
    # solve(alpha, beta, eval(alpha, beta, u)) == u when u satisfies the BCs
    mesh = unit_square_mesh(6)
    Q = FunctionSpace(mesh, 2)
    conv = project((0.3, -0.2), flow_tpu.VectorFunctionSpace(mesh, 2))
    bcs = [DirichletBC(Q, 0.0, "on_boundary")]
    op = Heat(Q, conv, 1.0, 1.0, 1.0, bcs, 0.5)

    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal(Q.n_dofs))
    mask = np.zeros(Q.n_dofs)
    mask[Q.boundary_dofs()] = 1.0
    u = jnp.asarray(np.where(mask == 1.0, 0.0, np.asarray(u)))

    alpha, beta = 10.0, -1.0
    # solve_alpha_M_beta_F solves (aM + bA)u = b - beta*b_vec, so feeding it
    # b = (aM + bA)u + beta*b_vec = eval_alpha_M_beta_F(u) must recover u
    b_full = op.eval_alpha_M_beta_F(alpha, beta, u, 0.0)
    u3 = op.solve_alpha_M_beta_F(alpha, beta, b_full, 0.0)
    np.testing.assert_allclose(np.asarray(u3.vector), np.asarray(u), atol=1e-10)


def test_supg_tau_guard():
    # the host-side equivalent of the reference's C++ tau > 1e3 throw
    import jax.numpy as jnp

    from flow_tpu.mesh import Mesh

    # a huge convection-dominated cell: tau -> h/(2|b|) = 5e3 > 1e3
    mesh = Mesh(
        1.0e4 * np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
        np.array([[0, 1, 2]]),
    )
    tau = stabilization.supg_tau(mesh, jnp.array([[[1.0, 0.0]]]), 1e-6, 1)
    with pytest.raises(RuntimeError, match="tau"):
        stabilization.check_tau(tau)
    # a benign tau passes through unchanged
    mesh2 = Mesh(np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]), np.array([[0, 1, 2]]))
    ok = stabilization.supg_tau(mesh2, jnp.array([[[1.0, 0.0]]]), 0.01, 1)
    assert stabilization.check_tau(ok) is ok
