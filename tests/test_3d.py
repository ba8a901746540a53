# 3-D (tetrahedral) capability tests — new capability beyond the 2-D-only
# reference (BASELINE config 5: 3-D Boussinesq cavity). Same verification
# discipline: quadrature exactness, kernel-vs-dense unit tests, MMS
# convergence order, and the machine-precision hydrostatic invariant.
import numpy as np
import jax.numpy as jnp
import pytest
from math import factorial

import flow_tpu
from flow_tpu.mesh3d import box_mesh, refine_uniform_tet, TetMesh
from flow_tpu import FunctionSpace, VectorFunctionSpace, DirichletBC, Function, project, norm
from flow_tpu.fem import assembly, quadrature, elements, forms
from flow_tpu.fem.assembly import geometry, tabulation
from flow_tpu.solvers import krylov


def test_tet_rule_exactness():
    # int_tet x^a y^b z^c = a! b! c! / (a+b+c+3)!
    for degree in [1, 2, 3, 4, 5]:
        pts, w = quadrature.tet_rule(degree)
        assert abs(w.sum() - 1.0 / 6.0) < 1e-14
        for a in range(degree + 1):
            for b in range(degree + 1 - a):
                for c in range(degree + 1 - a - b):
                    exact = (
                        factorial(a) * factorial(b) * factorial(c)
                        / factorial(a + b + c + 3)
                    )
                    got = np.sum(
                        w * pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c
                    )
                    assert abs(got - exact) < 1e-14, (degree, a, b, c)


def test_box_mesh_volume_and_boundary():
    mesh = box_mesh((0, 0, 0), (1, 2, 3), 3, 4, 5)
    assert abs(mesh.cell_volumes().sum() - 6.0) < 1e-12
    assert (mesh.cell_volumes() > 0).all()
    # boundary faces area: 2*(1*2 + 1*3 + 2*3) = 22
    p = mesh.points_np
    f = mesh.boundary_faces_np
    d1 = p[f[:, 1]] - p[f[:, 0]]
    d2 = p[f[:, 2]] - p[f[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(d1, d2), axis=1).sum()
    assert abs(area - 22.0) < 1e-12


@pytest.mark.parametrize("degree", [1, 2])
def test_mass_stiffness_3d_vs_dense(degree):
    mesh = box_mesh((0, 0, 0), (1, 1, 1), 2, 2, 2)
    S = FunctionSpace(mesh, degree)
    geom = geometry(mesh)
    pts, w = quadrature.tet_rule(6)
    phi, dphi = elements.tabulate(degree, pts, dim=3)
    p = mesh.points_np
    c = mesh.cells_np
    n = S.n_dofs
    M = np.zeros((n, n))
    K = np.zeros((n, n))
    for e in range(mesh.n_cells):
        x = p[c[e]]
        J = np.stack([x[1] - x[0], x[2] - x[0], x[3] - x[0]], axis=1)
        detJ = np.linalg.det(J)
        Ginv = np.linalg.inv(J).T
        g = dphi @ Ginv.T
        dofs = S.cell_dofs_np[e]
        M[np.ix_(dofs, dofs)] += np.einsum("q,qi,qj->ij", w, phi, phi) * detJ
        K[np.ix_(dofs, dofs)] += np.einsum("q,qid,qjd->ij", w, g, g) * detJ
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(
        np.asarray(assembly.mass_apply(S, geom, x)), M @ np.asarray(x),
        rtol=1e-11, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(assembly.stiffness_apply(S, geom, x)), K @ np.asarray(x),
        rtol=1e-11, atol=1e-12,
    )


def test_poisson_3d_convergence():
    exact = lambda x: (
        jnp.sin(jnp.pi * x[..., 0])
        * jnp.sin(jnp.pi * x[..., 1])
        * jnp.sin(jnp.pi * x[..., 2])
    )
    f = lambda x: 3 * jnp.pi**2 * exact(x)
    errs = []
    for n in [4, 8]:
        mesh = box_mesh((0, 0, 0), (1, 1, 1), n, n, n)
        S = FunctionSpace(mesh, 1)
        geom = geometry(mesh)
        tab = tabulation(S, 4)
        xq = geom.physical_points(tab.ref_pts)
        b = assembly.integrate_rhs(S, tab, geom, val=f(xq))
        from flow_tpu.fem.bc import combine_bcs

        mask, _ = combine_bcs(S, [DirichletBC(S, 0.0)])
        free = 1.0 - mask

        def K_bc(x):
            return free * assembly.stiffness_apply(S, geom, free * x) + mask * x

        diag = free * assembly.stiffness_diag(S, geom) + mask
        x, info = krylov.cg(K_bc, free * b, M=lambda r: r / diag, rtol=1e-11, maxiter=3000)
        assert bool(info.converged)
        errs.append(flow_tpu.errornorm(exact, Function(S, x), rule_degree=4))
    order = np.log(errs[0] / errs[1]) / np.log(2.0)
    assert order > 1.8, (errs, order)


def test_refine_uniform_tet():
    mesh = box_mesh((0, 0, 0), (1, 1, 1), 2, 2, 2)
    fine = refine_uniform_tet(mesh)
    assert fine.n_cells == 8 * mesh.n_cells
    assert abs(fine.cell_volumes().sum() - 1.0) < 1e-12
    assert (fine.cell_volumes() > 0).all()


def test_sealed_box_3d_hydrostatic():
    # the 3-D analog of test_sealed_box: exact hydrostatic balance stays at
    # rest to machine precision through one IPCS step
    mesh = box_mesh((0, 0, 0), (1, 1, 1), 4, 4, 4)
    V = VectorFunctionSpace(mesh, 2, n_components=3)
    Q = FunctionSpace(mesh, 1)
    g = -9.81
    u0 = project((0.0, 0.0, 0.0), V)
    p0 = project(lambda x: g * x[..., 2], Q)
    u_bcs = [DirichletBC(V, (0.0, 0.0, 0.0), "on_boundary")]
    u1, p1 = flow_tpu.navier_stokes.IPCS().step(
        1.0e-2, {0: u0}, p0, u_bcs, [], 998.0, 1.0e-3,
        f={0: (0.0, 0.0, g), 1: (0.0, 0.0, g)}, verbose=False,
    )
    assert norm(u1.vector, "linf") < 1e-12


def test_heat_3d_smoke():
    from flow_tpu.heat import Heat
    from flow_tpu import parabolic

    mesh = box_mesh((0, 0, 0), (1, 1, 1), 3, 3, 3)
    Q = FunctionSpace(mesh, 2)
    conv = project((0.1, 0.0, -0.1), VectorFunctionSpace(mesh, 2, n_components=3))
    bcs = [DirichletBC(Q, 300.0, "on_boundary")]
    op = Heat(Q, conv, 0.6, 1000.0, 4200.0, bcs, 0.0, supg_stabilization=True)
    theta0 = project(293.0, Q)
    theta1 = parabolic.ImplicitEuler(op).step(theta0, 0.0, 10.0)
    v = np.asarray(theta1.vector)
    assert np.isfinite(v).all()
    # P2 solutions overshoot the 300 K boundary value slightly (no discrete
    # maximum principle for quadratic elements); require boundedness only
    assert v.min() > 292.0 and v.max() < 310.0


def test_boundary_face_tab():
    from flow_tpu.fem.assembly import BoundaryFaceTab, geometry as _geom

    mesh = box_mesh((0, 0, 0), (1, 2, 3), 3, 4, 5)
    S = FunctionSpace(mesh, 2)
    bt = BoundaryFaceTab(S, rule_degree=4)

    # surface area: 2*(1*2 + 1*3 + 2*3) = 22
    ones = jnp.ones_like(bt.wl)
    assert abs(float(bt.integrate_scalar(ones)) - 22.0) < 1e-12

    # closed surface: oint n ds = 0
    n_int = np.einsum(
        "bq,bd->d", np.asarray(bt.wl), np.asarray(bt.normals)
    )
    np.testing.assert_allclose(n_int, 0.0, atol=1e-12)

    # divergence theorem: oint x . n ds = 3 * volume = 18
    xq = np.asarray(bt.x)
    xdotn = np.einsum("bqd,bd->bq", xq, np.asarray(bt.normals))
    val = float(bt.integrate_scalar(jnp.asarray(xdotn, dtype=mesh.dtype)))
    assert abs(val - 3.0 * 6.0) < 1e-11

    # FE-function trace values: interpolate f = x+y+z, check oint f ds
    u = project(lambda x: x[..., 0] + x[..., 1] + x[..., 2], S)
    vals = bt.values(u.vector)
    # analytic: sum over faces of integral of (x+y+z)
    # box [0,1]x[0,2]x[0,3]: total = 66 (computed below numerically instead)
    got = float(bt.integrate_scalar(vals))
    # check against midpoint-exactness: the integrand is linear per face
    mids = xq.mean(axis=1)
    areas = np.asarray(bt.wl).sum(axis=1)
    approx = float((mids.sum(axis=1) * areas).sum())
    assert abs(got - approx) < 1e-10


def test_open_boundary_3d_hydrostatic():
    # hydrostatic balance with an OPEN top face: velocity Dirichlet only on
    # the 5 closed faces, pressure pinned on the top. The discrete balance
    # requires the 3-D facet terms (-int p0 n.v ds + mu int (grad u)^T n.v)
    # to integrate-by-parts exactly against the stress form — a sharp test
    # of BoundaryFaceTab's wiring into the NS weak form.
    mesh = box_mesh((0, 0, 0), (1, 1, 1), 4, 4, 4)
    V = VectorFunctionSpace(mesh, 2, n_components=3)
    Q = FunctionSpace(mesh, 1)
    g = -9.81
    top = lambda x: x[:, 2] > 1 - 1e-12
    closed = lambda x: x[:, 2] < 1 - 1e-12

    u_bcs = [DirichletBC(V, (0.0, 0.0, 0.0), closed)]
    p_bcs = [DirichletBC(Q, lambda x: g * x[:, 2], top)]

    u0 = project((0.0, 0.0, 0.0), V)
    p0 = project(lambda x: g * x[..., 2], Q)
    u1, p1 = flow_tpu.navier_stokes.IPCS().step(
        1.0e-2, {0: u0}, p0, u_bcs, p_bcs, 998.0, 1.0e-3,
        f={0: (0.0, 0.0, g), 1: (0.0, 0.0, g)}, verbose=False,
    )
    assert norm(u1.vector, "linf") < 1e-12
    # the pressure stays hydrostatic
    assert norm(p1.vector - p0.vector, "linf") < 1e-9


@pytest.mark.slow
def test_ns_3d_mms_single_step_accuracy():
    # 3-D manufactured solution (div-free by construction via a curl):
    #   u = m(t) * (sin(pi y), sin(pi z), sin(pi x)),  div u = 0
    #   p = m(t) * cos(pi x) cos(pi y)
    # forcing derived symbolically; one backward-Euler IPCS step from the
    # exact initial state must reproduce u(dt) to O(dt^2 + h^3) accuracy.
    import sympy

    x0, x1, x2, t = sympy.symbols("x0 x1 x2 t")
    pi = sympy.pi
    m = 1 + sympy.sin(t)
    u_sym = (
        m * sympy.sin(pi * x1),
        m * sympy.sin(pi * x2),
        m * sympy.sin(pi * x0),
    )
    p_sym = m * sympy.cos(pi * x0) * sympy.cos(pi * x1)
    div = sum(sympy.diff(u_sym[i], [x0, x1, x2][i]) for i in range(3))
    assert sympy.simplify(div) == 0
    rho_v, mu_v = 1.0, 1.0
    f_sym = []
    for i in range(3):
        conv = sum(u_sym[j] * sympy.diff(u_sym[i], [x0, x1, x2][j]) for j in range(3))
        lap = sum(sympy.diff(u_sym[i], v, 2) for v in (x0, x1, x2))
        f_sym.append(
            sympy.simplify(
                rho_v * (sympy.diff(u_sym[i], t) + conv)
                + sympy.diff(p_sym, [x0, x1, x2][i])
                - mu_v * lap
            )
        )

    def at(expr, tv):
        fn = sympy.lambdify((x0, x1, x2, t), expr, modules=jnp)
        return lambda X: jnp.asarray(
            fn(X[..., 0], X[..., 1], X[..., 2], tv), dtype=X.dtype
        ) * jnp.ones(X.shape[:-1], dtype=X.dtype)

    mesh = box_mesh((0, 0, 0), (1, 1, 1), 6, 6, 6)
    V = VectorFunctionSpace(mesh, 2, n_components=3)
    Q = FunctionSpace(mesh, 1)
    dt = 1.0e-2

    u0 = project(tuple(at(c, 0.0) for c in u_sym), V)
    p0 = project(at(p_sym, 0.0), Q)
    u_bcs = [DirichletBC(V, tuple(at(c, dt) for c in u_sym), "on_boundary")]

    u1, p1 = flow_tpu.navier_stokes.IPCS().step(
        dt, {0: u0}, p0, u_bcs, [], rho_v, mu_v,
        f={0: tuple(at(c, 0.0) for c in f_sym), 1: tuple(at(c, dt) for c in f_sym)},
        verbose=False,
    )
    err = flow_tpu.errornorm(
        tuple(at(c, dt) for c in u_sym), u1, rule_degree=4
    )
    # one first-order step: error ~ O(dt^2) + spatial O(h^3); both << 5e-3
    assert err < 5.0e-3, err


def test_open_boundary_3d_poiseuille_residual_identity():
    # Plane Poiseuille flow through a box channel with an OPEN outflow:
    #   u = (z(1-z), 0, 0),  p = 2(2-x) + 1,  mu = 1, rho = 1
    # is an exact steady NS solution, exactly representable (u quadratic in
    # P2, p linear in P1). The scheme's momentum residual at this state is
    # NOT zero: the skew-symmetric convection
    # 0.5*(<(w.grad)w, v> - <(w.grad)v, w>)
    # (/root/reference/flow/navier_stokes/pressure_correction.py:138 — no
    # boundary compensation, deliberately) leaves exactly
    #   F1_i = -(dt/2) * oint (u.n)(u.phi_i) ds
    # after every volume term integrates by parts against the ds-terms
    # (-p n + mu (grad u)^T n). Asserting THAT identity to machine precision
    # pins every 3-D volume term and both facet terms simultaneously — with
    # nonzero mu (grad u)^T n = (0,0,mu u'(z)) at the in/outflow, which the
    # hydrostatic test (u = 0) cannot see.
    from flow_tpu.navier_stokes.pressure_correction import _get_ctx
    from flow_tpu.fem.assembly import BoundaryFaceTab

    mesh = box_mesh((0, 0, 0), (2.0, 1.0, 1.0), 4, 2, 3)
    V = VectorFunctionSpace(mesh, 2, n_components=3)
    Q = FunctionSpace(mesh, 1)

    U0 = project((lambda x: x[..., 2] * (1.0 - x[..., 2]), 0.0, 0.0), V).vector
    P0 = project(lambda x: 2.0 * (2.0 - x[..., 0]) + 1.0, Q).vector

    ctx = _get_ctx(V, Q)
    dt = 5.0e-2
    r = ctx._residual(U0, U0, None, None, P0, 1.0, 1.0, dt, (0.0, 1.0))

    # independent computation of the skew compensation (degree-6 integrand
    # (u.n)(u.phi): needs its own exact facet rule)
    bt = BoundaryFaceTab(V, rule_degree=6)
    uq = bt.values(U0)                                   # [b,q,3]
    un = jnp.einsum("bqd,bd->bq", uq, bt.normals)        # u.n per face point
    gw = bt.grads(U0, geometry(mesh))                    # [b,q,a,d]
    gradun = jnp.einsum("bqad,bd->bqa", gw, bt.normals)  # (grad u) n
    # uncompensated INFLOW part of the skew flux (the directional
    # do-nothing term restores it where u.n > 0) + the do-nothing remainder
    # (nonzero only on the z-walls); both live on Dirichlet-masked rows in
    # a real solve
    expected = -(dt / 2.0) * bt.integrate_rhs(
        jnp.minimum(un, 0.0)[:, :, None] * uq
    ) + dt * bt.integrate_rhs(gradun)
    np.testing.assert_allclose(np.asarray(r), np.asarray(expected), atol=1e-13)

    # and a full open-outflow IPCS step stays a bounded perturbation of the
    # steady state (the compensation acts only on outlet-adjacent dofs)
    u0f = Function(V, U0)
    p0f = Function(Q, P0)
    outlet = lambda x: x[:, 0] > 2.0 - 1e-12
    walls = lambda x: x[:, 0] < 2.0 - 1e-12
    u_bcs = [DirichletBC(V, (lambda x: x[:, 2] * (1.0 - x[:, 2]), 0.0, 0.0), walls)]
    p_bcs = [DirichletBC(Q, lambda x: 2.0 * (2.0 - x[..., 0]) + 1.0, outlet)]
    u1, p1 = flow_tpu.navier_stokes.IPCS().step(
        dt, {0: u0f}, p0f, u_bcs, p_bcs, 1.0, 1.0,
        f={0: (0.0, 0.0, 0.0), 1: (0.0, 0.0, 0.0)}, verbose=False,
    )
    # the first step absorbs the skew-form outflow deficiency (the
    # compensation term above acting on outlet-adjacent dofs) — bounded,
    # not machine-small
    assert norm(u1.vector - U0, "linf") < 0.25
    assert norm(p1.vector - P0, "linf") < 1.0


@pytest.mark.slow
def test_p1_hierarchy_on_tets():
    # P1Hierarchy works unchanged on tet chains: refine_uniform_tet appends
    # edge midpoints after the coarse vertices, the exact ordering invariant
    # the prolongation relies on (multigrid.py "coarse vertices are the
    # first n_coarse fine vertices"). Pure-Neumann 3-D Poisson: MG-CG must
    # converge in O(10) iterations where plain CG needs O(100+).
    from flow_tpu.solvers.multigrid import P1Hierarchy
    from flow_tpu.solvers import krylov

    meshes = [box_mesh((0, 0, 0), (1, 1, 1), 3, 3, 3)]
    for _ in range(2):
        meshes.append(refine_uniform_tet(meshes[-1]))
    hier = P1Hierarchy(meshes, bc_mask=None, smoother_degree=3)
    n = meshes[-1].n_points
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(n))
    b = b - jnp.mean(b)
    K = hier.levels[-1].K
    x, info = krylov.cg(K, b, M=hier.v_cycle, rtol=1e-10, maxiter=40)
    assert bool(info.converged)
    assert int(info.iters) <= 15, int(info.iters)
    r = K(x) - b
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-9
