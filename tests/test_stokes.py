# Steady Stokes spatial-convergence test — the same manufactured-solution
# protocol as /root/reference/tests/test_stokes.py (Guermond1 problem, orders
# asserted > 1.9 for both velocity and pressure on Taylor-Hood P2/P1).
import numpy as np
import pytest
import sympy

from helpers import compute_numerical_order_of_convergence, lambdify_x

import flow_tpu
from flow_tpu import unit_square_mesh, DirichletBC, errornorm
from flow_tpu.stokes import TaylorHood

MAX_DEGREE = 5


def _get_stokes_rhs(u, p, mu):
    x = sympy.DeferredVector("x")
    d = sympy.simplify(sympy.diff(u[0], x[0]) + sympy.diff(u[1], x[1]))
    assert d == 0
    f0 = -mu * (sympy.diff(u[0], x[0], 2) + sympy.diff(u[0], x[1], 2)) + sympy.diff(
        p, x[0]
    )
    f1 = -mu * (sympy.diff(u[1], x[0], 2) + sympy.diff(u[1], x[1], 2)) + sympy.diff(
        p, x[1]
    )
    return (sympy.simplify(f0), sympy.simplify(f1))


class Guermond1:
    """Problem 1, Guermond/Minev/Shen section 3.7.1 (steady version)."""

    def __init__(self):
        from sympy import pi, sin, cos

        x = sympy.DeferredVector("x")
        u = (
            +pi * 2 * sin(pi * x[1]) * cos(pi * x[1]) * sin(pi * x[0]) ** 2,
            -pi * 2 * sin(pi * x[0]) * cos(pi * x[0]) * sin(pi * x[1]) ** 2,
        )
        p = cos(pi * x[0]) * sin(pi * x[1])
        self.mu = 1.0
        self.u = u
        self.p = p
        self.f = _get_stokes_rhs(u, p, self.mu)

    def mesh_generator(self, n):
        return unit_square_mesh(n, diagonal="left/right")


def compute_error(problem, mesh_size):
    mesh = problem.mesh_generator(mesh_size)
    WP = TaylorHood(mesh)

    u_sol = tuple(lambdify_x(c) for c in problem.u)
    p_sol = lambdify_x(problem.p)
    f = tuple(lambdify_x(c) for c in problem.f)

    u_bcs = DirichletBC(WP.sub(0), u_sol, "on_boundary")
    p_bcs = DirichletBC(WP.sub(1), p_sol, "on_boundary")

    u_approx, p_approx = flow_tpu.stokes.solve(
        WP, bcs=[u_bcs, p_bcs], mu=problem.mu, f=f, verbose=False, tol=1.0e-12
    )
    return mesh.hmax, errornorm(u_sol, u_approx), errornorm(p_sol, p_approx)


@pytest.mark.parametrize("problem", [Guermond1()])
def test_order(problem):
    mesh_sizes = [8, 16]
    hmax, u_errors, p_errors = np.array(
        [compute_error(problem, n) for n in mesh_sizes]
    ).T
    u_order = compute_numerical_order_of_convergence(hmax, u_errors)[0]
    p_order = compute_numerical_order_of_convergence(hmax, p_errors)[0]
    assert u_order > 1.9
    assert p_order > 1.9


def test_iterative_path_matches_dense(monkeypatch):
    # force the MINRES + block-preconditioner path (normally used above
    # DENSE_THRESHOLD) and compare against the dense-LU path
    import flow_tpu.stokes as stokes_mod

    problem = Guermond1()
    mesh = problem.mesh_generator(8)
    WP = TaylorHood(mesh)
    u_sol = tuple(lambdify_x(c) for c in problem.u)
    p_sol = lambdify_x(problem.p)
    f = tuple(lambdify_x(c) for c in problem.f)
    bcs = [
        DirichletBC(WP.sub(0), u_sol, "on_boundary"),
        DirichletBC(WP.sub(1), p_sol, "on_boundary"),
    ]

    u_d, p_d = flow_tpu.stokes.solve(WP, bcs, problem.mu, f, verbose=False, tol=1e-12)
    monkeypatch.setattr(stokes_mod, "DENSE_THRESHOLD", 0)
    u_i, p_i = flow_tpu.stokes.solve(
        WP, bcs, problem.mu, f, verbose=False, tol=1e-9, max_iter=3000
    )
    assert abs(errornorm(u_sol, u_i) - errornorm(u_sol, u_d)) < 1e-6
    assert abs(errornorm(p_sol, p_i) - errornorm(p_sol, p_d)) < 1e-5


def test_iterative_no_pressure_bc_nullspace(monkeypatch):
    # velocity-only BCs: the pressure is defined up to a constant; the
    # iterative path must project the nullspace (lid-driven cavity)
    import flow_tpu.stokes as stokes_mod
    import jax.numpy as jnp

    mesh = unit_square_mesh(10, diagonal="crossed")
    WP = TaylorHood(mesh)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    bcs = [
        DirichletBC(WP.sub(0).sub(0), lid, "on_boundary"),
        DirichletBC(WP.sub(0).sub(1), 0.0, "on_boundary"),
    ]
    u_d, p_d = flow_tpu.stokes.solve(WP, bcs, 1.0, (0.0, 0.0), verbose=False)
    monkeypatch.setattr(stokes_mod, "DENSE_THRESHOLD", 0)
    u_i, p_i = flow_tpu.stokes.solve(
        WP, bcs, 1.0, (0.0, 0.0), verbose=False, tol=1e-10, max_iter=4000
    )
    np.testing.assert_allclose(
        np.asarray(u_i.vector), np.asarray(u_d.vector), atol=2e-7
    )
    # pressures agree up to the free constant
    dp = p_i.vector - jnp.mean(p_i.vector) - (p_d.vector - jnp.mean(p_d.vector))
    assert float(abs(dp).max()) < 2e-5


def test_solver_config_threading():
    from flow_tpu.utils import SolverConfig

    problem = Guermond1()
    mesh = problem.mesh_generator(6)
    WP = TaylorHood(mesh)
    u_sol = tuple(lambdify_x(c) for c in problem.u)
    p_sol = lambdify_x(problem.p)
    f = tuple(lambdify_x(c) for c in problem.f)
    bcs = [
        DirichletBC(WP.sub(0), u_sol, "on_boundary"),
        DirichletBC(WP.sub(1), p_sol, "on_boundary"),
    ]
    cfg = SolverConfig(rtol=1e-11, maxiter=2000, monitor_convergence=False)
    u, p = flow_tpu.stokes.solve(WP, bcs, problem.mu, f, solver_config=cfg)
    assert errornorm(u_sol, u) < 0.1
