#!/usr/bin/env python
# 3-D distributed feasibility point (BASELINE configs[4]: "3D buoyancy-
# driven cavity, 50M DoF mesh-partitioned over v5p-8"). Partition a
# >=1M-DoF 3-D lid-driven cavity (P2/P1 tets) over the 8-device virtual
# CPU mesh via the halo-exchange path and record
#   - per-device owned/extended dof counts (halo overhead fraction)
#   - per-device state + index-table memory (the 50M-DoF budget inputs)
#   - solver iteration parity + state agreement vs single-chip FastStepper
# Reference workload analog: /root/reference/tests/test_boussinesq.py
# scaled to 3-D per BASELINE.json configs[4].
#
# Usage: python scripts/distributed_scale3d.py [nx] [ny] [nz] [ndev] [steps]
# Default 48 20 20 8 2  ->  ~1.4M DoF box cavity over 8 devices.
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    nz = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    n_steps = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", ndev)
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from flow_tpu import (
        VectorFunctionSpace,
        FunctionSpace,
        DirichletBC,
        project,
    )
    from flow_tpu.mesh3d import box_mesh, refine_uniform_tet
    from flow_tpu.parallel.halo_step import HaloProjection
    from flow_tpu.navier_stokes.fast import FastStepper

    # elongated in x: the strip decomposition owns >=1 cell layer/device.
    # Built as a refinement chain so both paths get pressure multigrid
    # (P1Hierarchy works unchanged on tets: midpoint-append refinement).
    n_ref = int(os.environ.get("SCALE3D_REFINE", "1"))
    meshes = [
        box_mesh(
            (0, 0, 0), (float(nx) / nz, 1.0, 1.0),
            nx >> n_ref, ny >> n_ref, nz >> n_ref,
        )
    ]
    for _ in range(n_ref):
        meshes.append(refine_uniform_tet(meshes[-1]))
    mesh = meshes[-1]
    V = VectorFunctionSpace(mesh, 2, n_components=3)
    Q = FunctionSpace(mesh, 1)
    n_dofs = 3 * V.n_dofs + Q.n_dofs
    print(
        f"tets={mesh.n_cells} V_dofs={V.n_dofs} Q_dofs={Q.n_dofs} "
        f"total_dofs={n_dofs} ndev={ndev}",
        flush=True,
    )

    def lid(x):
        return np.where(x[:, 2] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [
        DirichletBC(V.sub(0), lid),
        DirichletBC(V.sub(1), 0.0),
        DirichletBC(V.sub(2), 0.0),
    ]
    u0 = project((0.0, 0.0, 0.0), V)
    p0 = project(0.0, Q)

    t0 = time.time()
    hp = HaloProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.01,
        devices=jax.devices()[:ndev],
        rotational_form=True,
        mesh_hierarchy=meshes,
        cfl_target=1.0e9, dt_max=1.0e-2,
    )
    print(f"HaloProjection setup: {time.time() - t0:.1f}s", flush=True)

    # --- partition statistics / 50M-DoF budget inputs ---------------------
    Vh, Qh = hp.Vh, hp.Qh
    own_v = Vh.own_counts
    print("per-device owned V dofs:", own_v.tolist(), flush=True)
    print(
        f"V halo width h={Vh.h}/side; halo fraction (2h/own): "
        f"{np.round(2.0 * Vh.h / np.maximum(own_v, 1), 4).tolist()}",
        flush=True,
    )
    print(
        f"Q: own={Qh.own_counts.tolist()} h={Qh.h}; cells/device={Vh.c_loc}",
        flush=True,
    )
    nl = V.cell_dofs_np.shape[1]
    nlq = Q.cell_dofs_np.shape[1]
    state_mb = 8 * (Vh.n_ext * 3 + Qh.n_ext) / 1e6
    table_mb = 4 * Vh.c_loc * (nl * 3 + nlq) / 1e6
    # geometry factors per cell: 3x3 inverse Jacobian + volume (f64)
    geom_mb = 8 * Vh.c_loc * 10 / 1e6
    print(
        f"per-device padded state {state_mb:.2f} MB (f64), cell index "
        f"tables ~{table_mb:.2f} MB (int32), geometry ~{geom_mb:.2f} MB",
        flush=True,
    )
    # 50M-DoF budget: everything above scales linearly in owned dofs/cells
    scale = 50.0e6 / n_dofs
    print(
        f"linear extrapolation to 50M DoF over {ndev} devices (f32 state "
        f"halves the state term): state {state_mb * scale / 2:.0f} MB + "
        f"tables {table_mb * scale:.0f} MB + geometry "
        f"{geom_mb * scale / 2:.0f} MB per device",
        flush=True,
    )

    Up = Vh.to_partitioned(np.asarray(u0.vector))
    Pp = Qh.to_partitioned(np.asarray(p0.vector))

    t0 = time.time()
    U1, P1, dt1, tel = hp.run(Up, Pp, 1.0e-2, n_steps=n_steps)
    U1.block_until_ready()
    t_dist = time.time() - t0
    print(f"distributed {n_steps} steps: {t_dist:.1f}s (incl. compile)", flush=True)
    for k in ("newton_iters", "linear_iters", "pressure_iters", "correction_iters"):
        if k in tel:
            print(f"  dist {k}: {np.asarray(tel[k]).tolist()}", flush=True)

    # --- single-chip reference (iteration parity + state agreement) -------
    st = FastStepper(
        V, Q, u_bcs, [], 1.0, 0.01,
        rotational_form=True,
        cfl_target=1.0e9, dt_max=1.0,
    )
    from flow_tpu.solvers.multigrid import P1Hierarchy

    hier = P1Hierarchy(meshes, bc_mask=None, smoother_degree=3)
    st.pressure_precond = hier.v_cycle
    t0 = time.time()
    dtj = jnp.asarray(1.0e-2)
    Us, Ps, _, tels = st.run(u0.vector, p0.vector, dtj, n_steps=n_steps, dt_max=dtj)
    Us.block_until_ready()
    print(
        f"single-chip {n_steps} steps: {time.time() - t0:.1f}s (incl. compile)",
        flush=True,
    )
    for k in ("newton_iters", "linear_iters", "pressure_iters", "correction_iters"):
        print(f"  single {k}: {np.asarray(tels[k]).tolist()}", flush=True)

    Ug = Vh.from_partitioned(U1)
    Pg = Qh.from_partitioned(P1)
    # pure-Neumann pressure: compare mean-free
    Pg = Pg - jnp.mean(Pg)
    Psm = Ps - jnp.mean(Ps)
    du = float(
        np.linalg.norm(np.asarray(Ug) - np.asarray(Us))
        / max(np.linalg.norm(np.asarray(Us)), 1e-30)
    )
    dp = float(
        np.linalg.norm(np.asarray(Pg) - np.asarray(Psm))
        / max(np.linalg.norm(np.asarray(Psm)), 1e-30)
    )
    print(f"state agreement: |dU|rel={du:.3e} |dP|rel={dp:.3e}", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
