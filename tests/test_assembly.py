# Kernel-level unit tests: batched-einsum assembly vs. plain dense numpy
# quadrature on tiny meshes (what the reference lacks — SURVEY.md §4
# "kernel-level unit tests").
import numpy as np
import jax.numpy as jnp
import pytest

import flow_tpu
from flow_tpu import unit_square_mesh, FunctionSpace, VectorFunctionSpace, Function
from flow_tpu.fem import assembly, forms, elements, quadrature
from flow_tpu.fem.assembly import geometry, tabulation


def dense_reference_matrix(space, kind, rule_degree=6):
    """Assemble a form matrix by straightforward numpy quadrature."""
    mesh = space.mesh
    pts, w = quadrature.triangle_rule(rule_degree)
    phi, dphi = elements.tabulate(space.degree, pts)
    p = mesh.points_np
    c = mesh.cells_np
    n = space.n_dofs
    A = np.zeros((n, n))
    for e in range(mesh.n_cells):
        x = p[c[e]]
        J = np.stack([x[1] - x[0], x[2] - x[0]], axis=1)
        detJ = np.linalg.det(J)
        Ginv = np.linalg.inv(J).T  # grad_phys = Ginv @ grad_ref
        g = dphi @ Ginv.T  # [nq, nl, 2]
        dofs = space.cell_dofs_np[e]
        if kind == "mass":
            loc = np.einsum("q,qi,qj->ij", w, phi, phi) * detJ
        elif kind == "stiffness":
            loc = np.einsum("q,qid,qjd->ij", w, g, g) * detJ
        A[np.ix_(dofs, dofs)] += loc
    return A


@pytest.mark.parametrize("degree", [1, 2])
@pytest.mark.parametrize("diagonal", ["right", "crossed", "left/right"])
def test_mass_stiffness_vs_dense(degree, diagonal):
    mesh = unit_square_mesh(3, diagonal=diagonal)
    space = FunctionSpace(mesh, degree)
    geom = geometry(mesh)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(space.n_dofs))

    M = dense_reference_matrix(space, "mass")
    K = dense_reference_matrix(space, "stiffness")

    np.testing.assert_allclose(
        np.asarray(assembly.mass_apply(space, geom, x)), M @ np.asarray(x),
        rtol=1e-12, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(assembly.stiffness_apply(space, geom, x)), K @ np.asarray(x),
        rtol=1e-12, atol=1e-13,
    )
    # diagonals
    np.testing.assert_allclose(
        np.asarray(assembly.mass_diag(space, geom)), np.diag(M), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(assembly.stiffness_diag(space, geom)), np.diag(K),
        rtol=1e-12, atol=1e-13,
    )


def test_mesh_areas_and_boundary():
    mesh = unit_square_mesh(4, diagonal="crossed")
    assert abs(mesh.cell_volumes().sum() - 1.0) < 1e-14
    assert abs(mesh.boundary_lengths_np.sum() - 4.0) < 1e-14
    # outward normals: dot with (x - center) > 0 on the unit square boundary
    be = mesh.boundary_edges_np
    mids = 0.5 * (
        mesh.points_np[mesh.edges_np[be][:, 0]]
        + mesh.points_np[mesh.edges_np[be][:, 1]]
    )
    d = np.einsum("bd,bd->b", mids - 0.5, mesh.boundary_normals_np)
    assert (d > 0).all()


def test_div_and_pressure_grad_adjoint():
    # int q div(u) assembled two ways must be adjoint:
    # <div_rhs(U), P> == <U, pressure_grad_rhs(P)>
    mesh = unit_square_mesh(3, diagonal="left/right")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    geom = geometry(mesh)
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    P = jnp.asarray(rng.standard_normal(Q.n_dofs))
    a = float(jnp.sum(forms.div_rhs(V, Q, geom, U) * P))
    b = float(jnp.sum(forms.pressure_grad_rhs(V, Q, geom, P) * U))
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_div_rhs_exact_linear_field():
    # u = (x, -y) is div-free; u = (x, y) has div 2 -> int q div u = 2 int q
    mesh = unit_square_mesh(4)
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    geom = geometry(mesh)
    x = V.dof_points
    U_divfree = jnp.stack([x[:, 0], -x[:, 1]], axis=1)
    out = forms.div_rhs(V, Q, geom, U_divfree)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-14)

    U2 = jnp.stack([x[:, 0], x[:, 1]], axis=1)
    out2 = forms.div_rhs(V, Q, geom, U2)
    ones = jnp.ones(V.n_dofs)
    expected = 2.0 * assembly.mass_apply(Q, geom, jnp.ones(Q.n_dofs))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(expected), atol=1e-13)


def test_projection_reproduces_polynomials():
    # L2 projection of a quadratic onto P2 is exact
    mesh = unit_square_mesh(3, diagonal="crossed")
    S = FunctionSpace(mesh, 2)
    f = lambda x: x[..., 0] ** 2 + 2.0 * x[..., 0] * x[..., 1] - x[..., 1]
    u = flow_tpu.project(f, S)
    np.testing.assert_allclose(
        np.asarray(u.vector), np.asarray(f(S.dof_points)), atol=1e-12
    )
    # errornorm of the exact projection is ~0
    assert flow_tpu.errornorm(f, u) < 1e-13


def test_integral_and_norm():
    mesh = unit_square_mesh(5)
    S = FunctionSpace(mesh, 2)
    geom = geometry(mesh)
    one = Function(S, jnp.ones(S.n_dofs))
    assert abs(float(assembly.integral(S, geom, one.vector)) - 1.0) < 1e-14
    # ||x||_L2([0,1]^2) = 1/sqrt(3)
    xfun = flow_tpu.interpolate(lambda x: x[..., 0], S)
    np.testing.assert_allclose(flow_tpu.norm(xfun, "L2"), 3 ** -0.5, rtol=1e-12)


def test_boundary_integral():
    # int_bnd x ds over unit square = 2*(1/2) + 1*1 + 0*1? compute:
    # bottom y=0: int x dx = 1/2; top: 1/2; left x=0: 0; right x=1: 1. total 2
    mesh = unit_square_mesh(4, diagonal="left/right")
    S = FunctionSpace(mesh, 2)
    bt = assembly.BoundaryTab(S, rule_degree=4)
    xfun = flow_tpu.interpolate(lambda x: x[..., 0], S)
    vals = bt.values(xfun.vector)
    np.testing.assert_allclose(float(bt.integrate_scalar(vals)), 2.0, rtol=1e-13)


def test_cg_poisson_convergence():
    # -Lap(u) = f with u = sin(pi x) sin(pi y): P1 solution converges at O(h^2)
    from flow_tpu.solvers import krylov

    errs = []
    for n in [8, 16]:
        mesh = unit_square_mesh(n, diagonal="crossed")
        S = FunctionSpace(mesh, 1)
        geom = geometry(mesh)
        exact = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
        f = lambda x: 2 * jnp.pi**2 * exact(x)
        tab = tabulation(S, 6)
        xq = geom.physical_points(tab.ref_pts)
        b = assembly.integrate_rhs(S, tab, geom, val=f(xq))
        from flow_tpu.fem.bc import DirichletBC, combine_bcs

        mask, vals = combine_bcs(S, [DirichletBC(S, 0.0)])
        free = 1.0 - mask

        def K_bc(x):
            return free * assembly.stiffness_apply(S, geom, free * x) + mask * x

        rhs = free * b
        diag = free * assembly.stiffness_diag(S, geom) + mask
        x, sinfo = krylov.cg(K_bc, rhs, M=lambda r: r / diag, rtol=1e-12, maxiter=2000)
        assert bool(sinfo.converged)
        errs.append(flow_tpu.errornorm(exact, Function(S, x)))
    order = np.log(errs[0] / errs[1]) / np.log(2.0)
    assert order > 1.9


def test_skew_convection_combined_matches_separate():
    mesh = unit_square_mesh(5, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    geom = geometry(mesh)
    rng = np.random.default_rng(7)
    W = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    combined = forms.skew_convection_combined_rhs(V, geom, W, rule_degree=5)
    separate = 0.5 * (
        forms.convection_rhs(V, geom, W, W, rule_degree=5)
        - forms.skew_convection_rhs(V, geom, W, W, rule_degree=5)
    )
    np.testing.assert_allclose(
        np.asarray(combined), np.asarray(separate), atol=1e-13
    )
