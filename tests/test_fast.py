# FastStepper (fused one-program projection step + scan loop): equivalence
# with the reference-path stepper, scan telemetry, and vmap batching (the
# "batched-problem parallelism" of SURVEY.md §2.3 item 2).
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import flow_tpu
import flow_tpu.navier_stokes as navsto
from flow_tpu import (
    unit_square_mesh,
    VectorFunctionSpace,
    FunctionSpace,
    DirichletBC,
    project,
)
from flow_tpu.navier_stokes.fast import FastStepper


def _cavity(n=10):
    mesh = unit_square_mesh(n, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    return mesh, V, Q, u_bcs


def test_fast_step_matches_reference_path():
    mesh, V, Q, u_bcs = _cavity()
    u0 = project((0.0, 0.0), V)
    p0 = project(0.0, Q)
    st = FastStepper(V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=True)
    U1, P1, stats = st.step(u0.vector, p0.vector, jnp.asarray(1e-2))
    u1r, p1r = navsto.Rotational().step(
        1e-2, {0: u0}, p0, u_bcs, [], 1.0, 0.1,
        f={0: (0.0, 0.0), 1: (0.0, 0.0)}, verbose=False,
    )
    np.testing.assert_allclose(np.asarray(U1), np.asarray(u1r.vector), atol=1e-12)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(p1r.vector), atol=1e-11)


def test_fast_run_scan_telemetry():
    mesh, V, Q, u_bcs = _cavity(8)
    st = FastStepper(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=False,
        forces_probe=lambda U, P: jnp.sum(U * U),
    )
    U, P, dt, tel = st.run(V.zeros(), Q.zeros(), jnp.asarray(1e-3), n_steps=4)
    assert tel["t"].shape == (4,)
    assert np.all(np.diff(np.asarray(tel["t"])) > 0)
    assert np.isfinite(np.asarray(tel["forces"])).all()
    assert float(dt) > 0


def test_fast_step_vmap_batched_problems():
    # vmap the whole projection step over a batch of initial states: the
    # idiomatic-JAX replacement for the reference's serial (mesh x dt) sweep
    mesh, V, Q, u_bcs = _cavity(6)
    st = FastStepper(V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=True)

    rng = np.random.default_rng(0)
    batch = 3
    U0 = jnp.zeros((batch, V.n_dofs, 2))
    P0 = jnp.asarray(rng.standard_normal((batch, Q.n_dofs)) * 1e-3)
    dts = jnp.asarray([1e-3, 2e-3, 4e-3])

    batched = jax.jit(jax.vmap(st._step_impl, in_axes=(0, 0, 0)))
    U1, P1, stats = batched(U0, P0, dts)
    assert U1.shape == (batch, V.n_dofs, 2)

    # each batch element equals the corresponding unbatched solve
    for b in range(batch):
        U1b, P1b, _ = st.step(U0[b], P0[b], dts[b])
        np.testing.assert_allclose(np.asarray(U1[b]), np.asarray(U1b), atol=1e-10)


def test_fast_bdf2_matches_reference_path():
    # FastStepper's BDF2 step == pressure_correction's BDF2 step (same
    # modified-state backward-Euler transformation, independent code paths)
    mesh, V, Q, u_bcs = _cavity()
    rng = np.random.default_rng(1)
    u0 = project((0.0, 0.0), V)
    um1 = flow_tpu.Function(V, jnp.asarray(rng.standard_normal((V.n_dofs, 2)) * 1e-3))
    p0 = project(0.0, Q)
    st = FastStepper(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=True,
        time_step_method="bdf2",
    )
    dt = jnp.asarray(1e-2)
    U1, P1, stats = st.step_bdf2(u0.vector, um1.vector, p0.vector, dt, dt)
    u1r, p1r = navsto.Rotational(time_step_method="bdf2").step(
        1e-2, {-1: um1, 0: u0}, p0, u_bcs, [], 1.0, 0.1,
        f={0: (0.0, 0.0), 1: (0.0, 0.0)}, verbose=False,
    )
    np.testing.assert_allclose(np.asarray(U1), np.asarray(u1r.vector), atol=1e-11)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(p1r.vector), atol=1e-10)


def test_fast_bdf2_run_chaining():
    # one 4-step scan == two chained 2-step scans passing (Um1, dtp) across
    # the segment boundary (the checkpoint-chain invariant for shedding runs)
    mesh, V, Q, u_bcs = _cavity(8)
    st = FastStepper(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=True,
        time_step_method="bdf2",
    )
    U0, P0 = V.zeros(), Q.zeros()
    dt0 = jnp.asarray(1e-3)
    Ua, Pa, dta, tela, _ = st.run(U0, P0, dt0, n_steps=4)
    U, P, dt, tel1, (Um1, dtp) = st.run(U0, P0, dt0, n_steps=2)
    Ub, Pb, dtb, tel2, _ = st.run(U, P, dt, n_steps=2, Um1=Um1, dtp0=dtp)
    np.testing.assert_allclose(np.asarray(Ua), np.asarray(Ub), atol=1e-13)
    np.testing.assert_allclose(np.asarray(Pa), np.asarray(Pb), atol=1e-12)
    assert float(dta) == float(dtb)


def test_fast_eisenstat_walker():
    # EW forcing must converge to the same state as fixed inner tolerances
    mesh, V, Q, u_bcs = _cavity(8)
    st_fixed = FastStepper(V, Q, u_bcs, [], rho=1.0, mu=0.1,
                           rotational_form=True, newton_tol=1e-12)
    st_ew = FastStepper(V, Q, u_bcs, [], rho=1.0, mu=0.1,
                        rotational_form=True, newton_tol=1e-12,
                        linear_rtol=0.1, ew_forcing=True)
    U0, P0 = V.zeros(), Q.zeros()
    dt = jnp.asarray(1e-2)
    U1a, P1a, sa = st_fixed.step(U0, P0, dt)
    U1b, P1b, sb = st_ew.step(U0, P0, dt)
    # both hit the tight outer Newton tolerance -> same solution
    np.testing.assert_allclose(np.asarray(U1a), np.asarray(U1b), atol=1e-9)
    assert float(sb.newton_res) <= 1e-11


def test_fast_run_divergence_probe():
    mesh, V, Q, u_bcs = _cavity(6)
    st = FastStepper(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=False,
        divergence_probe=True,
    )
    U, P, dt, tel = st.run(V.zeros(), Q.zeros(), jnp.asarray(1e-3), n_steps=3)
    dn = np.asarray(tel["div_norm"])
    assert dn.shape == (3,)
    assert np.isfinite(dn).all() and (dn >= 0).all()


def test_assembled_jacobian_matches_linearize():
    # On a fully-Dirichlet problem the ds-terms hit only masked rows, so the
    # assembled ELL Jacobian must equal the jax.linearize tangent exactly.
    mesh, V, Q, u_bcs = _cavity(8)
    st = FastStepper(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=True,
        assembled_jacobian=True,
    )
    assert st._mom_graph is not None

    from flow_tpu.fem import forms
    from flow_tpu.fem.bc import combine_bcs

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    v = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    P = jnp.asarray(rng.standard_normal(Q.n_dofs))
    dt = jnp.asarray(2.5e-2)
    ctx = st.ctx
    free = 1.0 - st.mask_u

    def res_bc(y):
        r = ctx._residual(y, x, None, None, P, st.rho, st.mu, dt, st.theta)
        return free * r + st.mask_u * (y - st.val_u)

    _, Jv_lin = jax.linearize(res_bc, x)
    want = Jv_lin(v)

    g = st._mom_graph
    conv_el = forms.conv_jacobian_loc(V, ctx.geom, V.gather(x), rule_degree=5)
    s = (dt / st.rho) * st.theta[1]
    vals = (s * st.rho) * g.assemble(conv_el)
    vals = vals + (s * st.mu) * st._mom_visc2
    sc = st._mom_mass + (s * st.mu) * st._mom_visc1
    vals = vals + sc[:, :, None, None] * jnp.eye(2, dtype=vals.dtype)
    got = free * g.apply(vals, v) + st.mask_u * v
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_assembled_jacobian_step_matches_matrix_free_open_boundary():
    # Open outflow (free ds rows): the assembled Jacobian omits the ds-term
    # Jacobian, so the Krylov operator is approximate — but the residual is
    # exact, so Newton converges to the same root at tight tolerance.
    from flow_tpu.models.karman import KarmanProblem

    prob = KarmanProblem(lcar=0.15)
    u0 = project((0.0, 0.0), prob.V)
    p0 = project(0.0, prob.Q)
    kw = dict(
        rho=prob.rho, mu=prob.mu, rotational_form=True, newton_tol=1e-11,
    )
    st_mf = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, assembled_jacobian=False, **kw
    )
    st_el = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, assembled_jacobian=True, **kw
    )
    assert st_mf._mom_graph is None and st_el._mom_graph is not None
    dt = jnp.asarray(1e-2)
    U1a, P1a, stats_a = st_mf.step(u0.vector, p0.vector, dt)
    U1b, P1b, stats_b = st_el.step(u0.vector, p0.vector, dt)
    np.testing.assert_allclose(np.asarray(U1b), np.asarray(U1a), atol=2e-9)
    np.testing.assert_allclose(np.asarray(P1b), np.asarray(P1a), atol=2e-8)
    # the approximate Jacobian may cost at most a couple extra iterations
    assert int(stats_b.newton_iters) <= int(stats_a.newton_iters) + 2


@pytest.mark.slow
def test_vertex_momentum_preconditioner():
    # VERDICT r02 item 3: the vertex-correction momentum preconditioner
    # (additive P1-diagonal coarse term with SUPG-upwinded diagonal) must
    # (a) produce the same states as Jacobi within solver tolerance and
    # (b) reduce the BiCGStab iteration count in the CFL~1 bench regime
    # (measured: 852 -> 696 linear iterations over 20 developed steps,
    # ~18% fewer momentum matvecs; the effect needs the fine-mesh
    # convection-dominated regime — on coarse meshes it is neutral).
    import jax.numpy as jnp
    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper

    prob = KarmanProblem(lcar=0.02, n_refine=2)
    kw = dict(
        rotational_form=True, newton_tol=0.0, newton_rtol=1e-3,
        newton_maxiter=4, linear_rtol=3e-2, pressure_rtol=1e-4,
        correction_rtol=1e-5, cfl_target=1.0, dt_max=1.0,
    )
    stJ = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, **kw)
    stV = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, momentum_precond="vertex", **kw)
    U, P = prob.V.zeros(), prob.Q.zeros()
    dt = jnp.asarray(1e-4, dtype=U.dtype)
    UJ, PJ, dtJ, telJ = stJ.run(U, P, dt, n_steps=35)
    UV, PV, dtV, telV = stV.run(U, P, dt, n_steps=35)
    rel = float(jnp.linalg.norm(UV - UJ) / jnp.linalg.norm(UJ))
    assert rel < 5e-3, rel
    itJ = np.asarray(telJ["linear_iters"])[-15:].sum()
    itV = np.asarray(telV["linear_iters"])[-15:].sum()
    assert itV < 0.92 * itJ, (itV, itJ)


def test_granular_step_matches_fused():
    # watchdog-granular mode (one execution per Newton iteration /
    # pressure / correction, for problem sizes whose fused step exceeds
    # the remote worker's execution cap) must reproduce the fused step
    # within solver tolerance.
    import jax.numpy as jnp
    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper

    prob = KarmanProblem(lcar=0.05, n_refine=1)
    kw = dict(
        rotational_form=True, newton_tol=0.0, newton_rtol=1e-6,
        newton_maxiter=6, linear_rtol=1e-8, pressure_rtol=1e-10,
        correction_rtol=1e-10, cfl_target=1.0, dt_max=1.0,
    )
    st = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                     prob.mu, **kw)
    U, P = prob.V.zeros(), prob.Q.zeros()
    dt = jnp.asarray(1e-4, dtype=U.dtype)
    # ramp a few fused steps to a nontrivial state
    U, P, dt, _ = st.run(U, P, dt, n_steps=8)
    U1f, P1f, _ = st.step(U, P, dt)
    U1g, P1g, stats = st.step_granular(U, P, dt, kry_maxiter=40)
    rel = float(jnp.linalg.norm(U1g - U1f) / jnp.linalg.norm(U1f))
    assert rel < 1e-6, rel
    relp = float(jnp.linalg.norm(P1g - P1f) / max(float(jnp.linalg.norm(P1f)), 1e-30))
    assert relp < 1e-5, relp
    assert stats["newton_iters"] >= 1 and stats["pressure_iters"] >= 1
    # bounded-Krylov truncation: tiny caps still converge via extra
    # host-side Newton sweeps
    U1t, P1t, stats_t = st.step_granular(U, P, dt, kry_maxiter=4)
    relt = float(jnp.linalg.norm(U1t - U1f) / jnp.linalg.norm(U1f))
    assert relt < 1e-5, relt
    assert stats_t["newton_iters"] >= stats["newton_iters"]


def test_lagged_convection_matches_newton():
    # semi-implicit (lagged/extrapolated transport) momentum solve: one
    # linear solve per step must (a) track the Newton trajectory far below
    # the time-discretization error and (b) cost measurably fewer Krylov
    # iterations. BDF2 transport is the second-order extrapolation
    # (_step_impl_bdf2's initial guess), so the lagging error is O(dt^2).
    mesh = unit_square_mesh(8, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    kw = dict(
        time_step_method="bdf2", rotational_form=True, newton_tol=1e-12,
        newton_rtol=1e-11, newton_maxiter=10, linear_rtol=1e-10,
        pressure_rtol=1e-11, correction_rtol=1e-12, cfl_target=1e9,
        dt_max=1.0,
    )
    stN = FastStepper(V, Q, u_bcs, [], 1.0, 0.01, convection="newton", **kw)
    stL = FastStepper(V, Q, u_bcs, [], 1.0, 0.01, convection="lagged", **kw)
    assert not stL.packed  # packed kernels lack the transport variant

    n = 16
    dt = jnp.asarray(0.32 / n)
    outN = stN.run(V.zeros(), Q.zeros(), dt, n_steps=n, dt_max=dt)
    outL = stL.run(V.zeros(), Q.zeros(), dt, n_steps=n, dt_max=dt)
    UN, UL = outN[0], outL[0]
    # lagging error well below the solution scale and the O(dt) increment
    rel = float(jnp.linalg.norm(UL - UN) / jnp.linalg.norm(UN))
    assert rel < 5e-3, rel
    itN = int(np.asarray(outN[3]["linear_iters"]).sum())
    itL = int(np.asarray(outL[3]["linear_iters"]).sum())
    assert itL < 0.75 * itN, (itL, itN)


def test_granular_lagged_matches_fused_lagged():
    # granular (watchdog-segmented) lagged stepping converges the same
    # affine momentum solve as the fused lagged path
    mesh = unit_square_mesh(8, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    kw = dict(
        rotational_form=True, convection="lagged", newton_tol=1e-12,
        newton_rtol=1e-11, newton_maxiter=10, linear_rtol=1e-10,
        pressure_rtol=1e-11, correction_rtol=1e-12, cfl_target=1e9,
        dt_max=1.0,
    )
    st = FastStepper(V, Q, u_bcs, [], 1.0, 0.01, **kw)
    U, P = V.zeros(), Q.zeros()
    dt = jnp.asarray(1e-2)
    Uf, Pf, _ = st.step(U, P, dt)
    Ug, Pg, stats = st.step_granular(U, P, dt, kry_maxiter=5)
    np.testing.assert_allclose(np.asarray(Ug), np.asarray(Uf), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Pg), np.asarray(Pf), atol=1e-8)


def test_granular_winkernel_matches_fused(monkeypatch):
    # granular mode with FLOW_WINKERNEL=1 (window-kernel Newton tangent)
    # must reproduce the fused einsum step within solver tolerance
    import jax.numpy as jnp
    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper

    prob = KarmanProblem(lcar=0.14, n_refine=0)
    kw = dict(
        rotational_form=True, newton_tol=0.0, newton_rtol=1e-6,
        newton_maxiter=6, linear_rtol=1e-8, pressure_rtol=1e-10,
        correction_rtol=1e-10, cfl_target=1.0, dt_max=1.0, packed=False,
    )
    st = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                     prob.mu, **kw)
    U, P = prob.V.zeros(), prob.Q.zeros()
    dt = jnp.asarray(1e-4, dtype=U.dtype)
    U, P, dt, _ = st.run(U, P, dt, n_steps=6)
    U1f, P1f, _ = st.step(U, P, dt)

    monkeypatch.setenv("FLOW_WINKERNEL", "1")
    stW = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, **kw)
    assert stW.winkernel
    U1g, P1g, stats = stW.step_granular(U, P, dt, kry_maxiter=40)
    rel = float(jnp.linalg.norm(U1g - U1f) / jnp.linalg.norm(U1f))
    assert rel < 2e-5, rel
    assert stats["newton_iters"] >= 1 and stats["linear_iters"] >= 1


def test_lagged_ell_operator_matches_linearize(monkeypatch):
    # Assembled-ELL lagged momentum operator (FLOW_LAGGED_ELL=1): must equal
    # the jax.linearize tangent of the affine lagged residual to roundoff on
    # an OPEN boundary (both ds-term Jacobians live in the operator: the
    # linear stress fold and the per-step do-nothing facet mass).
    from flow_tpu.fem import forms
    from flow_tpu.models.karman import KarmanProblem

    monkeypatch.setenv("FLOW_LAGGED_ELL", "1")
    prob = KarmanProblem(lcar=0.15)
    st = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, rho=prob.rho, mu=prob.mu,
        rotational_form=True, convection="lagged",
    )
    assert st._lagmom_graph is not None
    V, ctx = prob.V, st.ctx
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    v = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    U = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    P = jnp.asarray(rng.standard_normal(prob.Q.n_dofs))
    dt = jnp.asarray(2.0e-2)
    free = 1.0 - st.mask_u

    def res_lag(x):
        r = ctx._residual(
            x, U, None, None, P, st.rho, st.mu, dt, st.theta, transport=x0
        )
        return free * r + st.mask_u * (x - st.val_u)

    _, Jv_lin = jax.linearize(res_lag, x0)
    want = Jv_lin(v)

    g = st._lagmom_graph
    s = (dt / st.rho) * st.theta[1]
    conv_el = forms.conv_lagged_jacobian_loc(
        V, ctx.geom, V.gather(x0), rule_degree=5
    )
    scal = (
        st._lagmom_mass
        + (s * st.mu) * st._lagmom_visc1
        + (s * st.rho) * g.assemble(conv_el)
    )
    tb = ctx.btab.values(x0)
    tn = jnp.einsum("bqm,bm->bq", tb, ctx.btab.normals)
    scal = scal + (s * 0.5 * st.rho) * st._lagmom_fm.assemble(
        jnp.maximum(tn, 0.0)
    )
    xg = v[g.cols]
    av = jnp.einsum("nk,nkm->nm", scal, xg) + (s * st.mu) * jnp.einsum(
        "nkab,nkb->na", st._lagmom_visc2, xg
    )
    got = free * av + st.mask_u * v
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-11)


def test_lagged_ell_step_matches_matrix_free(monkeypatch):
    # End-to-end: one lagged step through the assembled-ELL branch matches
    # the matrix-free lagged branch (exact operator -> identical solve
    # semantics; differences are Krylov roundoff only).
    from flow_tpu.models.karman import KarmanProblem

    prob = KarmanProblem(lcar=0.15)
    u0 = project((0.0, 0.0), prob.V)
    p0 = project(0.0, prob.Q)
    kw = dict(
        rho=prob.rho, mu=prob.mu, rotational_form=True, convection="lagged",
        newton_tol=1e-12,
    )
    st_mf = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, **kw)
    monkeypatch.setenv("FLOW_LAGGED_ELL", "1")
    st_el = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, **kw)
    assert st_mf._lagmom_graph is None and st_el._lagmom_graph is not None
    dt = jnp.asarray(1e-2)
    U1a, P1a, stats_a = st_mf.step(u0.vector, p0.vector, dt)
    U1b, P1b, stats_b = st_el.step(u0.vector, p0.vector, dt)
    np.testing.assert_allclose(np.asarray(U1b), np.asarray(U1a), atol=2e-9)
    np.testing.assert_allclose(np.asarray(P1b), np.asarray(P1a), atol=2e-8)
    # exact operator: same iteration counts up to roundoff-level drift
    assert abs(int(stats_b.linear_iters) - int(stats_a.linear_iters)) <= 2


def test_gmres_momentum_solver_matches_bicgstab(monkeypatch):
    # FLOW_MOM_SOLVER=gmres swaps the momentum Krylov; at tight stopping
    # both must land on the same step (solver choice is not a scheme change)
    from flow_tpu.models.karman import KarmanProblem

    prob = KarmanProblem(lcar=0.15)
    u0 = project((0.0, 0.0), prob.V)
    p0 = project(0.0, prob.Q)
    kw = dict(
        rho=prob.rho, mu=prob.mu, rotational_form=True, convection="lagged",
        newton_tol=1e-12,
    )
    st_b = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, **kw)
    monkeypatch.setenv("FLOW_MOM_SOLVER", "gmres")
    st_g = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, **kw)
    assert st_b.mom_solver == "bicgstab" and st_g.mom_solver == "gmres"
    dt = jnp.asarray(1e-2)
    U1a, P1a, _ = st_b.step(u0.vector, p0.vector, dt)
    U1b, P1b, _ = st_g.step(u0.vector, p0.vector, dt)
    np.testing.assert_allclose(np.asarray(U1b), np.asarray(U1a), atol=2e-9)
    np.testing.assert_allclose(np.asarray(P1b), np.asarray(P1a), atol=2e-8)
