# Lane-packed kernels (fem/packed.py) must be numerically identical to the
# einsum path — same quadrature, same reference tensors, different data
# layout ([e]/[n] streams with unrolled small indices, the TPU tile-padding
# fix; BENCH_NOTES round 3).
import numpy as np
import jax.numpy as jnp
import pytest

from flow_tpu.models.karman import KarmanProblem
from flow_tpu.fem import assembly, forms
from flow_tpu.fem.packed import PackedContext
from flow_tpu.navier_stokes.pressure_correction import _get_ctx, CONV_RULE


def _setup():
    prob = KarmanProblem(lcar=0.06, n_refine=1)
    V, Q = prob.V, prob.Q
    ctx = _get_ctx(V, Q)
    pc = PackedContext(V, Q, conv_rule=CONV_RULE)
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    U0 = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    P = jnp.asarray(rng.standard_normal(Q.n_dofs))
    return prob, ctx, pc, U, U0, P


def test_pack_roundtrip():
    _, _, pc, U, _, _ = _setup()
    np.testing.assert_array_equal(np.asarray(pc.unpack(pc.pack(U))), np.asarray(U))


def test_residual_volume_matches_einsum_path():
    prob, ctx, pc, U, U0, P = _setup()
    rho, mu, dt = 1.0, 0.37, 3.0e-2
    theta = (0.0, 1.0)
    # einsum-path residual WITHOUT boundary terms: volume pieces only
    V, Q, geom = ctx.V, ctx.Q, ctx.geom
    Uloc = V.gather(U)
    U0loc = V.gather(U0)
    Ploc = Q.gather(P)
    loc = forms.mass_loc(V, geom, Uloc - U0loc)
    loc = loc - (dt / rho) * ctx._rhs_weak_loc(Uloc, None, rho, mu, Ploc)
    ref = V.dof_sum(loc)

    got = pc.unpack(pc.residual_volume(pc.pack(U), pc.pack(U0), P, rho, mu, dt, 1.0))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-13
    )


def test_div_rhs_matches():
    prob, ctx, pc, U, U0, P = _setup()
    ref = forms.div_rhs(ctx.V, ctx.Q, ctx.geom, U)
    got = pc.div_rhs(pc.pack(U))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-13)


def test_grad_div_rhs_matches():
    prob, ctx, pc, U, U0, P = _setup()
    ref = forms.grad_div_ustar_rhs(ctx.V, ctx.Q, ctx.geom, U)
    got = pc.grad_div_rhs(pc.pack(U))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-11, atol=1e-12)


def test_mass_apply_matches():
    prob, ctx, pc, U, U0, P = _setup()
    ref = assembly.mass_apply(ctx.V, ctx.geom, U)
    got = pc.unpack(pc.mass_apply(pc.pack(U)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12, atol=1e-13)


def test_grad_phi_rhs_matches():
    prob, ctx, pc, U, U0, P = _setup()
    div_part = forms.grad_div_ustar(ctx.V, ctx.geom, U)  # [nc, 2]
    ref = forms.grad_phi_rhs(
        ctx.V, ctx.Q, ctx.geom, P, div_part=0.37 * div_part, rule_degree=4
    )
    dp = pc.grad_div_cell(pc.pack(U))
    got = pc.unpack(pc.grad_phi_rhs(P, div_part=[0.37 * dp[0], 0.37 * dp[1]]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-11, atol=1e-12)


def test_boundary_rhs_matches():
    prob, ctx, pc, U, U0, P = _setup()
    rho, mu = 0.9, 0.21
    ref = ctx._rhs_weak_bnd(U, P, rho, mu)
    got = pc.unpack(
        pc.boundary_rhs(ctx.btab, ctx.btabQ, pc.pack(U), P, rho, mu)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-11, atol=1e-12
    )


@pytest.mark.slow  # 157 s; test_packed_lagged_matches_einsum_lagged
# keeps the packed step in the default gate at a third the cost
def test_packed_stepper_matches_dense():
    # the packed FastStepper trajectory must match the einsum path within
    # solver tolerance (identical discrete equations, different layout)
    from flow_tpu.navier_stokes.fast import FastStepper

    prob = KarmanProblem(lcar=0.06, n_refine=1)
    kw = dict(
        rotational_form=True, newton_tol=0.0, newton_rtol=1e-8,
        newton_maxiter=8, linear_rtol=1e-9, pressure_rtol=1e-11,
        correction_rtol=1e-11, cfl_target=1.0, dt_max=1.0,
    )
    stD = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, packed=False, **kw)
    stP = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, packed=True, **kw)
    assert stP.packed and not stD.packed
    U, P = prob.V.zeros(), prob.Q.zeros()
    dt = jnp.asarray(1e-4, dtype=U.dtype)
    UD, PD, dtD, telD = stD.run(U, P, dt, n_steps=6)
    UP, PP, dtP, telP = stP.run(U, P, dt, n_steps=6)
    rel = float(jnp.linalg.norm(UP - UD) / jnp.linalg.norm(UD))
    assert rel < 1e-7, rel
    relp = float(jnp.linalg.norm(PP - PD) / max(float(jnp.linalg.norm(PD)), 1e-30))
    assert relp < 1e-6, relp
    np.testing.assert_allclose(
        np.asarray(telP["pressure_iters"]), np.asarray(telD["pressure_iters"]),
        atol=2,
    )

    # BDF2 path too (the shedding campaign integrator)
    stDb = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                       prob.mu, time_step_method="bdf2", packed=False, **kw)
    stPb = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                       prob.mu, time_step_method="bdf2", packed=True, **kw)
    UD, PD, dtD, telD, hD = stDb.run(U, P, dt, n_steps=5)
    UP, PP, dtP, telP, hP = stPb.run(U, P, dt, n_steps=5)
    rel = float(jnp.linalg.norm(UP - UD) / jnp.linalg.norm(UD))
    assert rel < 1e-7, rel


def test_packed_lagged_matches_einsum_lagged():
    # packed semi-implicit kernels (skew_conv_lagged_loc_acc + do-nothing
    # transport) must reproduce the einsum lagged path step-for-step
    from flow_tpu.navier_stokes.fast import FastStepper

    prob = KarmanProblem(lcar=0.2, n_refine=0)
    kw = dict(
        rotational_form=True, convection="lagged", time_step_method="bdf2",
        newton_tol=1e-13, newton_rtol=1e-12, linear_rtol=1e-12,
        pressure_rtol=1e-12, correction_rtol=1e-13, cfl_target=1e9,
        dt_max=1.0,
    )
    stD = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, packed=False, **kw)
    stP = FastStepper(prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho,
                      prob.mu, packed=True, **kw)
    assert stP.packed and not stD.packed

    dt = jnp.asarray(5e-3)
    outD = stD.run(prob.V.zeros(), prob.Q.zeros(), dt, n_steps=3, dt_max=dt)
    outP = stP.run(prob.V.zeros(), prob.Q.zeros(), dt, n_steps=3, dt_max=dt)
    np.testing.assert_allclose(
        np.asarray(outD[0]), np.asarray(outP[0]), atol=5e-10
    )
    np.testing.assert_allclose(
        np.asarray(outD[1]), np.asarray(outP[1]), atol=5e-9
    )
