# Distributed extensions of the halo-exchange NS path (parallel/halo_step.py):
# multigrid pressure preconditioning (the BoomerAMG-under-MPI replacement),
# the fused scan loop with on-device CFL control, and 3-D tet support —
# VERDICT round-1 item 4. All on the virtual 8-CPU device mesh.
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import flow_tpu.navier_stokes as navsto
from flow_tpu import (
    unit_square_mesh,
    VectorFunctionSpace,
    FunctionSpace,
    DirichletBC,
    project,
)
from flow_tpu.mesh import refine_uniform
from flow_tpu.navier_stokes.fast import FastStepper
from flow_tpu.parallel.halo_step import HaloProjection
from flow_tpu.solvers.multigrid import P1Hierarchy


def _cavity_hierarchy(n0=6, n_refine=2):
    meshes = [unit_square_mesh(n0, diagonal="crossed")]
    for _ in range(n_refine):
        meshes.append(refine_uniform(meshes[-1]))
    mesh = meshes[-1]
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    return meshes, V, Q, u_bcs


@pytest.mark.slow
def test_halo_mg_matches_single_chip_and_iteration_parity():
    meshes, V, Q, u_bcs = _cavity_hierarchy()
    u0 = project((0.0, 0.0), V)
    p0 = project(0.0, Q)
    devs = jax.devices()[:4]

    hp_mg = HaloProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, devices=devs,
        rotational_form=True, mesh_hierarchy=meshes,
    )
    Up = hp_mg.Vh.to_partitioned(np.asarray(u0.vector))
    Pp = hp_mg.Qh.to_partitioned(np.asarray(p0.vector))
    U1d, P1d, dtd, tel = hp_mg.run(Up, Pp, 1e-2, n_steps=1)
    mg_iters = int(np.asarray(tel["pressure_iters"])[0])

    # state agreement with the single-chip reference path
    U1 = hp_mg.Vh.from_partitioned(U1d)
    P1 = hp_mg.Qh.from_partitioned(P1d)
    u1r, p1r = navsto.Rotational().step(
        1e-2, {0: u0}, p0, u_bcs, [], 1.0, 0.1,
        f={0: (0.0, 0.0), 1: (0.0, 0.0)}, verbose=False,
    )
    P1 = P1 - jnp.mean(P1)
    p1v = p1r.vector - jnp.mean(p1r.vector)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(u1r.vector), atol=1e-10)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(p1v), atol=1e-9)

    # iteration parity: distributed V-cycle == single-chip V-cycle math,
    # so MG-CG counts must be within 2x of the single-chip GMG counts
    # (VERDICT item 4) — and far below Jacobi-CG
    st = FastStepper(V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=True)
    hier = P1Hierarchy(meshes, bc_mask=None, smoother_degree=3)
    st.pressure_precond = hier.v_cycle
    _, _, stats = st.step(u0.vector, p0.vector, jnp.asarray(1e-2))
    sc_iters = int(stats.pressure_iters)
    assert mg_iters <= 2 * max(sc_iters, 1), (mg_iters, sc_iters)

    hp_jac = HaloProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, devices=devs, rotational_form=True,
    )
    _, _, _, tel_j = hp_jac.run(Up, Pp, 1e-2, n_steps=1)
    jac_iters = int(np.asarray(tel_j["pressure_iters"])[0])
    assert mg_iters < 0.4 * jac_iters, (mg_iters, jac_iters)


@pytest.mark.slow
def test_halo_run_scan_matches_fast_stepper():
    # the distributed fused scan (run + CFL controller) reproduces the
    # single-chip FastStepper scan to solver tolerance
    meshes, V, Q, u_bcs = _cavity_hierarchy(n0=5, n_refine=1)
    devs = jax.devices()[:4]
    hp = HaloProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, devices=devs,
        rotational_form=True, mesh_hierarchy=meshes,
    )
    st = FastStepper(V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=True)

    U0, P0 = V.zeros(), Q.zeros()
    dt0 = jnp.asarray(1e-3, dtype=U0.dtype)
    Ua, Pa, dta, tela = st.run(U0, P0, dt0, n_steps=3)

    Up = hp.Vh.to_partitioned(np.asarray(U0))
    Pp = hp.Qh.to_partitioned(np.asarray(P0))
    Ub_p, Pb_p, dtb, telb = hp.run(Up, Pp, dt0, n_steps=3)
    Ub = hp.Vh.from_partitioned(Ub_p)
    Pb = hp.Qh.from_partitioned(Pb_p)

    np.testing.assert_allclose(np.asarray(Ua), np.asarray(Ub), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(Pa - jnp.mean(Pa)), np.asarray(Pb - jnp.mean(Pb)), atol=1e-8
    )
    np.testing.assert_allclose(float(dta), float(dtb), rtol=1e-9)
    assert np.all(np.asarray(telb["t"]) > 0)


@pytest.mark.slow
def test_halo_step_3d_matches_single_chip():
    # dof-partitioned full NS step on a tet mesh (3-D was 2-D-only in
    # round 1) vs the single-chip scheme path
    from flow_tpu.mesh3d import box_mesh

    # elongated in x so the 1-D strip decomposition has >= 1 cell layer per
    # device (thin strips violate the neighbor-only halo invariant — the
    # HaloSpace assert guards this loudly)
    mesh = box_mesh((0, 0, 0), (4, 1, 1), 8, 2, 2)
    V = VectorFunctionSpace(mesh, 2, n_components=3)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 2] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [
        DirichletBC(V.sub(0), lid),
        DirichletBC(V.sub(1), 0.0),
        DirichletBC(V.sub(2), 0.0),
    ]
    u0 = project((0.0, 0.0, 0.0), V)
    p0 = project(0.0, Q)

    hp = HaloProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.1,
        devices=jax.devices()[:4], rotational_form=True,
    )
    Up = hp.Vh.to_partitioned(np.asarray(u0.vector))
    Pp = hp.Qh.to_partitioned(np.asarray(p0.vector))
    U1p, P1p = hp.step(Up, Pp, 1e-2)
    U1 = hp.Vh.from_partitioned(U1p)
    P1 = hp.Qh.from_partitioned(P1p)

    u1r, p1r = navsto.Rotational().step(
        1e-2, {0: u0}, p0, u_bcs, [], 1.0, 0.1,
        f={0: (0.0, 0.0, 0.0), 1: (0.0, 0.0, 0.0)}, verbose=False,
    )
    P1 = P1 - jnp.mean(P1)
    p1v = p1r.vector - jnp.mean(p1r.vector)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(u1r.vector), atol=1e-10)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(p1v), atol=1e-9)


@pytest.mark.slow
def test_halo_bdf2_run_matches_fast_stepper():
    # the distributed BDF2 scan (u-hat reformulation, extrapolated Newton
    # guess, (Um1, dtp) carry) reproduces the single-chip FastStepper BDF2
    meshes, V, Q, u_bcs = _cavity_hierarchy(n0=5, n_refine=1)
    devs = jax.devices()[:4]
    hp = HaloProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, devices=devs,
        rotational_form=True, mesh_hierarchy=meshes,
        time_step_method="bdf2",
    )
    st = FastStepper(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=True,
        time_step_method="bdf2",
    )

    U0, P0 = V.zeros(), Q.zeros()
    dt0 = jnp.asarray(1e-3, dtype=U0.dtype)
    Ua, Pa, dta, tela, (Um1a, dtpa) = st.run(U0, P0, dt0, n_steps=3)

    Up = hp.Vh.to_partitioned(np.asarray(U0))
    Pp = hp.Qh.to_partitioned(np.asarray(P0))
    Ub_p, Pb_p, dtb, telb, (Um1b_p, dtpb) = hp.run(Up, Pp, dt0, n_steps=3)
    Ub = hp.Vh.from_partitioned(Ub_p)
    Pb = hp.Qh.from_partitioned(Pb_p)
    Um1b = hp.Vh.from_partitioned(Um1b_p)

    np.testing.assert_allclose(np.asarray(Ua), np.asarray(Ub), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(Pa - jnp.mean(Pa)), np.asarray(Pb - jnp.mean(Pb)), atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(Um1a), np.asarray(Um1b), atol=1e-9)
    np.testing.assert_allclose(float(dta), float(dtb), rtol=1e-9)
    np.testing.assert_allclose(float(dtpa), float(dtpb), rtol=1e-9)

    # chaining: a second segment continues at full second order
    Uc_p, Pc_p, dtc, _, _ = hp.run(
        Ub_p, Pb_p, dtb, n_steps=2, Um1=Um1b_p, dtp0=dtpb
    )
    Uc2, Pc2, dtc2, _, _ = st.run(Ua, Pa, dta, n_steps=2, Um1=Um1a, dtp0=dtpa)
    np.testing.assert_allclose(
        np.asarray(Uc2), np.asarray(hp.Vh.from_partitioned(Uc_p)), atol=1e-9
    )
