# Patch-contiguous layout (fem/patch.py): exactness of the sliced
# gather/overlap-add machinery against the global row-gather layout, and
# iterate-exactness of the patch-mode stepper + patch multigrid.
import numpy as np
import jax.numpy as jnp
import pytest

from flow_tpu.mesh import (
    unit_square_mesh,
    rectangle_with_hole_mesh,
    refine_uniform,
)
from flow_tpu.fem.spaces import FunctionSpace, VectorFunctionSpace
from flow_tpu.fem import assembly, forms
from flow_tpu.fem.patch import (
    build_patch_info,
    PatchSpace,
    PatchGeom,
    PatchBoundaryTab,
)


def _hier(mesh, k, snap=None):
    ms = [mesh]
    for _ in range(k):
        mesh = refine_uniform(mesh, snap_boundary=snap)
        ms.append(mesh)
    return ms


@pytest.fixture(scope="module")
def hole_setup():
    ms = _hier(
        rectangle_with_hole_mesh(
            0, 0.6, -0.07, 0.07, cx=0.1, cy=0.01, r=0.02, lcar=0.1
        ),
        3,
    )
    info = build_patch_info(ms)
    fine = ms[-1]
    return ms, info, fine


def test_patch_operator_parity(hole_setup):
    ms, info, fine = hole_setup
    rng = np.random.default_rng(0)
    geomr = assembly.geometry(fine)
    geomp = PatchGeom(info)

    Q = FunctionSpace(fine, 1)
    Qp = PatchSpace(info.layout(1), fine, 1)
    x = jnp.asarray(rng.standard_normal(Q.n_dofs))
    Xp = Qp.to_patch(x)
    y_ref = assembly.stiffness_apply(Q, geomr, x)
    Yp = assembly.stiffness_apply(Qp, geomp, Xp)
    np.testing.assert_allclose(
        np.asarray(Qp.from_patch(Yp)), np.asarray(y_ref), atol=1e-12
    )

    V = VectorFunctionSpace(fine, 2)
    Vp = PatchSpace(info.layout(2), fine, 2, n_components=2)
    U = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    Up = Vp.to_patch(U)

    y_ref = forms.sym_grad_apply(V, geomr, U, 0.37)
    Yp = Vp.dof_sum(forms.sym_grad_loc(Vp, geomp, Vp.gather(Up), 0.37))
    np.testing.assert_allclose(
        np.asarray(Vp.from_patch(Yp)), np.asarray(y_ref), atol=1e-12
    )

    y_ref = V.dof_sum(forms.skew_convection_combined_loc(V, geomr, V.gather(U)))
    Yp = Vp.dof_sum(forms.skew_convection_combined_loc(Vp, geomp, Vp.gather(Up)))
    np.testing.assert_allclose(
        np.asarray(Vp.from_patch(Yp)), np.asarray(y_ref), atol=1e-12
    )

    y_ref = forms.div_rhs(V, Q, geomr, U)
    Yp = forms.div_rhs(Vp, Qp, geomp, Up)
    np.testing.assert_allclose(
        np.asarray(Qp.from_patch(Yp)), np.asarray(y_ref), atol=1e-12
    )

    # weighted dot == global dot
    y2 = rng.standard_normal(Q.n_dofs)
    d_ref = float(np.dot(np.asarray(x), y2))
    d_p = float(Qp.dot(Xp, Qp.to_patch(jnp.asarray(y2))))
    assert abs(d_ref - d_p) < 1e-9 * abs(d_ref)


def test_patch_boundary_tab_parity(hole_setup):
    ms, info, fine = hole_setup
    rng = np.random.default_rng(1)
    geomr = assembly.geometry(fine)
    V = VectorFunctionSpace(fine, 2)
    Vp = PatchSpace(info.layout(2), fine, 2, n_components=2)
    U = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    Up = Vp.to_patch(U)
    bt = assembly.BoundaryTab(V, rule_degree=6)
    btp = PatchBoundaryTab(bt, Vp, geomr)
    np.testing.assert_allclose(
        np.asarray(bt.values(U)), np.asarray(btp.values(Up)), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(bt.grads(U, geomr)), np.asarray(btp.grads(Up)), atol=1e-12
    )
    val = jnp.asarray(rng.standard_normal(bt.phi.shape[:2] + (2,)))
    np.testing.assert_allclose(
        np.asarray(Vp.from_patch(btp.integrate_rhs(val))),
        np.asarray(bt.integrate_rhs(val)),
        atol=1e-13,
    )


def test_patch_stepper_iterate_exact():
    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper

    prob = KarmanProblem(lcar=0.1, n_refine=2)
    kw = dict(
        rotational_form=True, newton_tol=1e-10, linear_rtol=1e-7,
        pressure_rtol=1e-10, correction_rtol=1e-10, convection="lagged",
    )
    sd = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu, **kw
    )
    info = build_patch_info(prob.mesh_hierarchy)
    sp = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        patches=info, **kw
    )
    U = prob.V.zeros()
    P = prob.Q.zeros()
    dt = jnp.asarray(1e-3, dtype=U.dtype)
    U1d, P1d, std = sd.step(U, P, dt)
    U1p, P1p, stp = sp.step(U, P, dt)  # global API -> converts at the seam
    np.testing.assert_allclose(np.asarray(U1p), np.asarray(U1d), atol=1e-10)
    np.testing.assert_allclose(np.asarray(P1p), np.asarray(P1d), atol=1e-8)
    # the replica-weighted inner product reproduces the global Krylov
    # iteration EXACTLY — identical iteration counts, not just answers
    assert int(stp.pressure_iters) == int(std.pressure_iters)
    assert int(stp.correction_iters) == int(std.correction_iters)
    assert int(stp.linear_iters) == int(std.linear_iters)


def test_patch_mg_iterate_exact():
    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.solvers.multigrid import P1Hierarchy
    from flow_tpu.solvers.patch_mg import PatchP1Hierarchy

    prob = KarmanProblem(lcar=0.1, n_refine=2)
    kw = dict(
        rotational_form=True, newton_tol=1e-10, linear_rtol=1e-7,
        pressure_rtol=1e-10, correction_rtol=1e-10, convection="lagged",
    )
    sd = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu, **kw
    )
    sd.pressure_precond = P1Hierarchy(
        prob.mesh_hierarchy, bc_mask=sd.mask_p, smoother_degree=3
    ).v_cycle
    info = build_patch_info(prob.mesh_hierarchy)
    sp = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        patches=info, **kw
    )
    sp.pressure_precond = PatchP1Hierarchy(
        info, bc_mask=sp.mask_p, smoother_degree=3
    ).v_cycle
    U = prob.V.zeros()
    P = prob.Q.zeros()
    U3d, P3d, dtd, teld = sd.run(U, P, 1e-3, n_steps=3)
    U3p, P3p, dtp, telp = sp.run(U, P, 1e-3, n_steps=3)
    np.testing.assert_allclose(np.asarray(U3p), np.asarray(U3d), atol=1e-9)
    np.testing.assert_allclose(np.asarray(P3p), np.asarray(P3d), atol=1e-7)
    np.testing.assert_array_equal(
        np.asarray(telp["pressure_iters"]), np.asarray(teld["pressure_iters"])
    )


def test_patch_neumann_cavity():
    # pure-Neumann pressure path (nullspace projection through the weighted
    # dot) on a lid-driven cavity
    from flow_tpu.fem.bc import DirichletBC
    from flow_tpu.navier_stokes.fast import FastStepper

    ms = _hier(unit_square_mesh(3, "crossed"), 2)
    fine = ms[-1]
    V = VectorFunctionSpace(fine, 2)
    Q = FunctionSpace(fine, 1)

    def lid(x):
        return np.where(x[..., 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    kw = dict(
        rotational_form=True, newton_tol=1e-10, linear_rtol=1e-7,
        pressure_rtol=1e-10, correction_rtol=1e-10, convection="lagged",
    )
    sd = FastStepper(V, Q, u_bcs, [], 1.0, 0.1, **kw)
    info = build_patch_info(ms)
    sp = FastStepper(V, Q, u_bcs, [], 1.0, 0.1, patches=info, **kw)
    U = V.zeros()
    P = Q.zeros()
    dt = jnp.asarray(1e-2, dtype=U.dtype)
    U1d, P1d, std = sd.step(U, P, dt)
    U1p, P1p, stp = sp.step(U, P, dt)
    np.testing.assert_allclose(np.asarray(U1p), np.asarray(U1d), atol=1e-10)
    # Neumann pressure defined up to a constant
    np.testing.assert_allclose(
        np.asarray(P1p - jnp.mean(P1p)),
        np.asarray(P1d - jnp.mean(P1d)),
        atol=1e-9,
    )
    assert int(stp.pressure_iters) == int(std.pressure_iters)
