# Gather-free lagged momentum operator vs the einsum reference.
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flow_tpu.models.karman import KarmanProblem
from flow_tpu.fem import assembly, forms
from flow_tpu.attic.winmom import WindowLaggedMomentum


def _reference_apply(V, geom, x, T, mass_w, s_rho, s_mu):
    Uloc = V.gather(x)
    Tloc = V.gather(T)
    loc = mass_w * forms.mass_loc(V, geom, Uloc)
    loc = loc + s_rho * forms.skew_convection_lagged_loc(
        V, geom, Tloc, Uloc, rule_degree=5
    )
    loc = loc + forms.sym_grad_loc(V, geom, Uloc, s_mu)
    return V.dof_sum(loc)


def test_window_lagged_momentum_matches_einsum():
    prob = KarmanProblem(lcar=0.1, n_refine=1)
    V = prob.V
    geom = assembly.geometry(V.mesh)
    op = WindowLaggedMomentum(V, S=128, interpret=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    T = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    mass_w, s_rho, s_mu = 1.0, 0.37, 0.021

    ref = _reference_apply(V, geom, x, T, mass_w, s_rho, s_mu)
    Tq = op.transport_qp(T)
    got = op.apply(x, Tq, mass_w, s_rho, s_mu)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-5, atol=5e-6
    )


def test_faststepper_winkernel_matches_einsum_lagged(monkeypatch):
    # FLOW_WINKERNEL=1: the lagged momentum solve driven by the window
    # kernel must reproduce the einsum lagged step
    import os
    from flow_tpu.navier_stokes.fast import FastStepper

    prob = KarmanProblem(lcar=0.2, n_refine=0)
    kw = dict(
        rotational_form=True, convection="lagged", time_step_method="bdf2",
        newton_tol=1e-12, newton_rtol=1e-11, linear_rtol=1e-10,
        pressure_rtol=1e-11, correction_rtol=1e-12, cfl_target=1e9,
        dt_max=1.0, packed=False,
    )
    stE = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, **kw)
    monkeypatch.setenv("FLOW_WINKERNEL", "1")
    stW = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, **kw)
    assert stW.winkernel and not stE.winkernel

    U, P = prob.V.zeros(), prob.Q.zeros()
    dt = jnp.asarray(5e-3)
    # two steps (second has nontrivial transport/extrapolation)
    UE, PE = U, P
    UW, PW = U, P
    for _ in range(2):
        UE, PE, _ = stE.step(UE, PE, dt)
        UW, PW, _ = stW.step(UW, PW, dt)
    # the window kernel runs f32 internally (momentum matvec AND the
    # correction mass solve): agreement at f32 accumulation level
    np.testing.assert_allclose(np.asarray(UW), np.asarray(UE), atol=2e-6)
    np.testing.assert_allclose(np.asarray(PW), np.asarray(PE), atol=1e-4)


def test_window_newton_tangent_matches_ad():
    # the newton-mode window apply (reaction term included) must equal the
    # jax.linearize tangent of the volume residual about the same state
    prob = KarmanProblem(lcar=0.1, n_refine=1)
    V = prob.V
    geom = assembly.geometry(V.mesh)
    op = WindowLaggedMomentum(V, S=128, interpret=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    v = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    mass_w, s_rho, s_mu = 1.0, 0.29, 0.013

    def vol_res(u):
        Uloc = V.gather(u)
        loc = mass_w * forms.mass_loc(V, geom, Uloc)
        loc = loc + s_rho * forms.skew_convection_combined_loc(
            V, geom, Uloc, rule_degree=5
        )
        loc = loc + forms.sym_grad_loc(V, geom, Uloc, s_mu)
        return V.dof_sum(loc)

    _, Jv = jax.linearize(vol_res, x)
    ref = Jv(v)

    Tq, Uq, Gu = op.state_qp(x)
    # full newton apply via the permuted-row path
    perm = np.asarray(op.perm)
    vp = v[perm]
    yp = op.apply_perm_rows(vp, Tq, mass_w, s_rho, s_mu, Uq, Gu)
    inv = np.asarray(op.inv)
    got = yp[inv]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-5, atol=5e-6
    )


def test_faststepper_winkernel_matches_einsum_newton(monkeypatch):
    # FLOW_WINKERNEL=1 with convection="newton": the full Newton tangent
    # runs as the window kernel; end state must match the einsum Newton path
    import os
    from flow_tpu.navier_stokes.fast import FastStepper

    prob = KarmanProblem(lcar=0.2, n_refine=0)
    kw = dict(
        rotational_form=True, convection="newton", time_step_method="bdf2",
        newton_tol=1e-12, newton_rtol=1e-11, linear_rtol=1e-10,
        pressure_rtol=1e-11, correction_rtol=1e-12, cfl_target=1e9,
        dt_max=1.0, packed=False,
    )
    stE = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, **kw)
    monkeypatch.setenv("FLOW_WINKERNEL", "1")
    stW = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, **kw)
    assert stW.winkernel and not stE.winkernel

    U, P = prob.V.zeros(), prob.Q.zeros()
    dt = jnp.asarray(5e-3)
    UE, PE = U, P
    UW, PW = U, P
    for _ in range(2):
        UE, PE, _ = stE.step(UE, PE, dt)
        UW, PW, _ = stW.step(UW, PW, dt)
    np.testing.assert_allclose(np.asarray(UW), np.asarray(UE), atol=2e-6)
    np.testing.assert_allclose(np.asarray(PW), np.asarray(PE), atol=1e-4)


@pytest.mark.slow  # ~17 min: interpret-mode DIM=3 kernel compile dominates
def test_window_newton_tangent_3d_matches_ad():
    # DIM=3 window momentum kernel (tets, vector-P2) vs the jax.linearize
    # tangent of the same volume residual
    from flow_tpu.mesh3d import box_mesh
    from flow_tpu.fem.spaces import VectorFunctionSpace

    m = box_mesh((0, 0, 0), (1, 1, 1), 2, 2, 2)
    V = VectorFunctionSpace(m, 2, n_components=3)
    geom = assembly.geometry(m)
    op = WindowLaggedMomentum(V, S=128, interpret=True)
    assert op.dim == 3
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((V.n_dofs, 3)))
    v = jnp.asarray(rng.standard_normal((V.n_dofs, 3)))
    mass_w, s_rho, s_mu = 1.0, 0.21, 0.017

    def vol_res(u):
        Uloc = V.gather(u)
        loc = mass_w * forms.mass_loc(V, geom, Uloc)
        loc = loc + s_rho * forms.skew_convection_combined_loc(
            V, geom, Uloc, rule_degree=5
        )
        loc = loc + forms.sym_grad_loc(V, geom, Uloc, s_mu)
        return V.dof_sum(loc)

    _, Jv = jax.linearize(vol_res, x)
    ref = Jv(v)
    Tq, Uq, Gu = op.state_qp(x)
    perm = np.asarray(op.perm)
    inv = np.asarray(op.inv)
    yp = op.apply_perm_rows(v[perm], Tq, mass_w, s_rho, s_mu, Uq, Gu)
    got = yp[inv]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-5, atol=5e-6
    )
    # lagged mode too (transport = x, no reaction term)
    ref_lag = None

    def vol_res_lag(u):
        Uloc = V.gather(u)
        Tloc = V.gather(x)
        loc = mass_w * forms.mass_loc(V, geom, Uloc)
        loc = loc + s_rho * forms.skew_convection_lagged_loc(
            V, geom, Tloc, Uloc, rule_degree=5
        )
        loc = loc + forms.sym_grad_loc(V, geom, Uloc, s_mu)
        return V.dof_sum(loc)

    ref_lag = vol_res_lag(v)
    yl = op.apply_perm_rows(v[perm], Tq, mass_w, s_rho, s_mu)[inv]
    np.testing.assert_allclose(
        np.asarray(yl), np.asarray(ref_lag), rtol=3e-5, atol=5e-6
    )


@pytest.mark.slow  # interpret-mode 3-D kernel compile dominates
def test_faststepper_winkernel_3d_matches_einsum(monkeypatch):
    # FLOW_WINKERNEL=1 on a 3-D problem: the DIM=3 window kernels drive
    # the momentum tangent and correction mass solve end to end
    import os
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.mesh3d import box_mesh
    from flow_tpu.fem.spaces import VectorFunctionSpace, FunctionSpace
    from flow_tpu.fem.bc import DirichletBC

    m = box_mesh((0, 0, 0), (1, 1, 1), 3, 3, 3)
    V = VectorFunctionSpace(m, 2, n_components=3)
    Q = FunctionSpace(m, 1)

    def lid(x):
        return np.where(x[:, 2] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [
        DirichletBC(V.sub(0), lid),
        DirichletBC(V.sub(1), 0.0),
        DirichletBC(V.sub(2), 0.0),
    ]
    kw = dict(
        rotational_form=True, time_step_method="bdf2",
        newton_tol=1e-12, newton_rtol=1e-11, linear_rtol=1e-10,
        pressure_rtol=1e-11, correction_rtol=1e-12, cfl_target=1e9,
        dt_max=1.0, packed=False,
    )
    stE = FastStepper(V, Q, u_bcs, [], 1.0, 0.05, **kw)
    monkeypatch.setenv("FLOW_WINKERNEL", "1")
    stW = FastStepper(V, Q, u_bcs, [], 1.0, 0.05, **kw)
    assert stW.winkernel and stW._winmom.dim == 3

    dt = jnp.asarray(1e-2)
    UE, PE = V.zeros(), Q.zeros()
    UW, PW = V.zeros(), Q.zeros()
    for _ in range(2):
        UE, PE, _ = stE.step(UE, PE, dt)
        UW, PW, _ = stW.step(UW, PW, dt)
    np.testing.assert_allclose(np.asarray(UW), np.asarray(UE), atol=3e-6)
    np.testing.assert_allclose(np.asarray(PW), np.asarray(PE), atol=2e-4)
