#!/usr/bin/env python
# Non-toy distributed run (VERDICT r02 item 4): partition a >=1M-DoF
# problem over the 8-device virtual CPU mesh via the halo-exchange path
# (parallel/halo_step.py) and record
#   - per-device owned/extended dof counts (halo overhead fraction)
#   - per-device state + index-table memory
#   - solver iteration parity vs the single-chip FastStepper
#
# Usage: python scripts/distributed_scale.py [n0] [n_refine] [ndev] [steps]
# Default 16 4 8 2  ->  1.19M DoF lid-driven cavity over 8 devices.
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n0 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_refine = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ndev = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", ndev)
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from flow_tpu import (
        unit_square_mesh,
        refine_uniform,
        VectorFunctionSpace,
        FunctionSpace,
        DirichletBC,
        project,
    )
    from flow_tpu.parallel.halo_step import HaloProjection
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.solvers.multigrid import P1Hierarchy

    meshes = [unit_square_mesh(n0, diagonal="crossed")]
    for _ in range(n_refine):
        meshes.append(refine_uniform(meshes[-1]))
    mesh = meshes[-1]
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    n_dofs = 2 * V.n_dofs + Q.n_dofs
    print(f"cells={mesh.n_cells} total_dofs={n_dofs} ndev={ndev}", flush=True)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    u0 = project((0.0, 0.0), V)
    p0 = project(0.0, Q)

    t0 = time.time()
    hp = HaloProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.01,
        devices=jax.devices()[:ndev],
        rotational_form=True,
        mesh_hierarchy=meshes,
        # fixed dt: iteration parity and state agreement need both paths
        # to take identical steps
        cfl_target=1.0e9, dt_max=1.0e-2,
    )
    print(f"HaloProjection setup: {time.time() - t0:.1f}s", flush=True)

    # --- partition statistics --------------------------------------------
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
    # per-device memory: padded state + extended cell-dof index tables
    nl = V.cell_dofs_np.shape[1]
    state_mb = 8 * (Vh.n_ext * 2 + Qh.n_ext) / 1e6
    table_mb = 4 * Vh.c_loc * nl * 2 / 1e6  # V + Q ext tables (int32)
    print(
        f"per-device padded state {state_mb:.2f} MB (f64), "
        f"cell index tables ~{table_mb:.2f} MB",
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

    # --- single-chip reference (iteration parity) -------------------------
    st = FastStepper(
        V, Q, u_bcs, [], 1.0, 0.01,
        rotational_form=True,
        newton_tol=1.0e-8, linear_rtol=1.0e-7,
        pressure_rtol=1.0e-8, correction_rtol=1.0e-10,
        cfl_target=1.0e9, dt_max=1.0,
    )
    # pure-Neumann pressure: bc_mask=None enables the nullspace projection
    hier = P1Hierarchy(meshes, bc_mask=None, smoother_degree=3)
    st.pressure_precond = hier.v_cycle
    t0 = time.time()
    dtj = jnp.asarray(1.0e-2)
    Us, Ps, _, tels = st.run(u0.vector, p0.vector, dtj, n_steps=n_steps, dt_max=dtj)
    Us.block_until_ready()
    print(f"single-chip {n_steps} steps: {time.time() - t0:.1f}s (incl. compile)", flush=True)
    for k in ("newton_iters", "linear_iters", "pressure_iters", "correction_iters"):
        print(f"  single {k}: {np.asarray(tels[k]).tolist()}", flush=True)

    # state agreement
    Ug = Vh.from_partitioned(U1)
    Pg = Qh.from_partitioned(P1)
    du = float(np.linalg.norm(np.asarray(Ug) - np.asarray(Us)) / max(np.linalg.norm(np.asarray(Us)), 1e-30))
    dp = float(np.linalg.norm(np.asarray(Pg) - np.asarray(Ps)) / max(np.linalg.norm(np.asarray(Ps)), 1e-30))
    print(f"state agreement: |dU|rel={du:.3e} |dP|rel={dp:.3e}", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
