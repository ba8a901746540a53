# Packed-patch stepper (navier_stokes/patchfast.py): kernel exactness and
# step equivalence vs the FastStepper patch mode (itself pinned vs the
# dense einsum path in tests/test_patch.py).
import numpy as np
import jax.numpy as jnp
import pytest

from flow_tpu.mesh import rectangle_with_hole_mesh, refine_uniform
from flow_tpu.fem.spaces import FunctionSpace, VectorFunctionSpace
from flow_tpu.fem import assembly, forms
from flow_tpu.fem.patch import build_patch_info
from flow_tpu.fem.patchpack import PackedPatch


@pytest.fixture(scope="module")
def setup():
    ms = [
        rectangle_with_hole_mesh(
            0, 0.6, -0.07, 0.07, cx=0.1, cy=0.01, r=0.02, lcar=0.1
        )
    ]
    for _ in range(3):
        ms.append(refine_uniform(ms[-1]))
    info = build_patch_info(ms)
    return ms, info, PackedPatch(info)


def _pack2(pp, X):
    return jnp.concatenate(
        [pp.lay2.to_packed(X[:, 0]), pp.lay2.to_packed(X[:, 1])]
    )


def _un2(pp, Y):
    a, b = pp.comps(Y)
    return jnp.stack(
        [pp.lay2.from_packed(a), pp.lay2.from_packed(b)], -1
    )


def test_packed_kernels_exact(setup):
    ms, info, pp = setup
    fine = ms[-1]
    geomr = assembly.geometry(fine)
    rng = np.random.default_rng(0)
    V = VectorFunctionSpace(fine, 2)
    Q = FunctionSpace(fine, 1)
    U = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    T = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    p = jnp.asarray(rng.standard_normal(Q.n_dofs))
    Uf, Tf = _pack2(pp, U), _pack2(pp, T)
    Pf = pp.lay1.to_packed(p)

    np.testing.assert_allclose(
        np.asarray(pp.lay1.from_packed(pp.p1_stiffness_apply(Pf))),
        np.asarray(assembly.stiffness_apply(Q, geomr, p)),
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(_un2(pp, pp.mass_apply_vec(Uf))),
        np.asarray(assembly.mass_apply(V, geomr, U)),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(pp.lay1.from_packed(pp.div_rhs(Uf))),
        np.asarray(forms.div_rhs(V, Q, geomr, U)),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(_un2(pp, pp.pressure_grad_rhs(Pf))),
        np.asarray(forms.pressure_grad_rhs(V, Q, geomr, p)),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(pp.lay1.from_packed(pp.grad_div_rhs(Uf))),
        np.asarray(forms.grad_div_ustar_rhs(V, Q, geomr, U)),
        atol=1e-9,
    )
    # lagged momentum volume tangent (mass + sym-grad + skew convection)
    s_mu, s_rho = 0.017, 0.6
    S = pp.ema_S(Tf, s_mu, s_rho)
    y_ref = (
        assembly.mass_apply(V, geomr, U)
        + s_mu * forms.sym_grad_apply(V, geomr, U, 1.0)
        + s_rho
        * V.dof_sum(
            forms.skew_convection_lagged_loc(
                V, geomr, V.gather(T), V.gather(U)
            )
        )
    )
    np.testing.assert_allclose(
        np.asarray(_un2(pp, pp.ema_volume_apply(S, Uf, s_mu))),
        np.asarray(y_ref),
        atol=1e-10,
    )


def test_packed_stepper_matches_fast_patch():
    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.navier_stokes.patchfast import PackedPatchStepper
    from flow_tpu.solvers.patch_mg import PatchP1Hierarchy

    prob = KarmanProblem(lcar=0.1, n_refine=2)
    info = build_patch_info(prob.mesh_hierarchy)
    kw = dict(
        rotational_form=True, newton_tol=1e-12, newton_rtol=0.0,
        newton_maxiter=4, linear_rtol=1e-7, pressure_rtol=1e-11,
        correction_rtol=1e-11, convection="lagged", momentum_solver="gmres",
    )
    sd = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        patches=info, **kw
    )
    sd.pressure_precond = PatchP1Hierarchy(
        info, bc_mask=sd.mask_p, smoother_degree=3
    ).v_cycle
    sp = PackedPatchStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu, info,
        newton_tol=1e-12, newton_rtol=0.0, pressure_rtol=1e-11,
        correction_rtol=1e-11, momentum_solver="gmres", mg_smoother_degree=3,
    )
    U = prob.V.zeros()
    P = prob.Q.zeros()
    dt = jnp.asarray(1e-3, dtype=U.dtype)
    U1d, P1d, std = sd.step(U, P, dt)
    Uf, Pf = sp.zeros()
    U1f, P1f, stp = sp.step(Uf, Pf, dt)
    U1p, P1p = sp.from_packed_state(U1f, P1f)
    np.testing.assert_allclose(np.asarray(U1p), np.asarray(U1d), atol=1e-11)
    np.testing.assert_allclose(np.asarray(P1p), np.asarray(P1d), atol=1e-8)
    assert int(stp.linear_iters) == int(std.linear_iters)
    assert int(stp.pressure_iters) == int(std.pressure_iters)
    assert int(stp.correction_iters) == int(std.correction_iters)

    # three fused scan steps with the CFL controller
    U3d, P3d, dtd, _ = sd.run(U, P, 1e-3, n_steps=3)
    U3f, P3f, dtp, _ = sp.run(Uf, Pf, 1e-3, n_steps=3)
    U3p, P3p = sp.from_packed_state(U3f, P3f)
    np.testing.assert_allclose(np.asarray(U3p), np.asarray(U3d), atol=1e-10)
    assert abs(float(dtd) - float(dtp)) < 1e-12
