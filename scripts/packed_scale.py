#!/usr/bin/env python
# Non-toy distributed run on the PRODUCTION (lane-packed patch) path —
# VERDICT r4 #1/#6: partition a >=5M-DoF problem over the 8-device virtual
# CPU mesh via parallel/packed_shard.py and record
#   - partition statistics (patches/device, seam rows exported = the halo
#     payload, volume rows — the comm/compute ratio)
#   - solver iteration parity vs the single-device PackedPatchStepper
#   - state agreement after n_steps fixed-dt steps
#   - wall-clock per step (1-core virtual mesh: correctness evidence, not
#     a throughput claim)
#
# Usage: python scripts/packed_scale.py [n0] [n_refine] [ndev] [steps]
# Default 18 5 8 2  ->  ~6.0M-DoF lid-driven cavity over 8 devices.
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n0 = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n_refine = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    ndev = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", ndev)
    jax.config.update("jax_enable_x64", True)
    # packed programs embed no size-dependent constant tables, so one
    # compile serves every mesh size — cache it
    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from flow_tpu import (
        unit_square_mesh,
        refine_uniform,
        VectorFunctionSpace,
        FunctionSpace,
        DirichletBC,
    )
    from flow_tpu.fem.patch import build_patch_info
    from flow_tpu.parallel.packed_shard import ShardedPackedStepper

    meshes = [unit_square_mesh(n0, diagonal="left")]
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

    t0 = time.time()
    info = build_patch_info(meshes)
    sh = ShardedPackedStepper(
        V, Q, u_bcs, [], 1.0, 0.01, info, devices=jax.devices()[:ndev]
    )
    print(f"setup: {time.time() - t0:.1f}s", flush=True)

    st = sh.seam_stats
    print("partition:", st, flush=True)
    # the halo payload per exchange is Emax side rows of (n+1) entries per
    # device vs 3 planes of ~(n+1)^2 * Cl volume entries
    n = info.n
    vol = (n + 1) * (n + 1) * st["patches_per_device"]
    halo = st["exported_rows_max"] * (n + 1)
    print(
        f"seam payload fraction (P1 level): {halo}/{vol} = {halo / vol:.4%}",
        flush=True,
    )

    Us, Ps = sh.to_sharded(V.zeros(), Q.zeros())
    dt = 1.0e-2

    # sharded steps
    t0 = time.time()
    iters_s = []
    for k in range(n_steps):
        Us, Ps, stats = sh.step(Us, Ps, dt)
        iters_s.append(
            (int(stats.linear_iters), int(stats.pressure_iters),
             int(stats.correction_iters))
        )
        print(
            f"sharded step {k}: iters={iters_s[-1]} "
            f"({time.time() - t0:.1f}s cum)",
            flush=True,
        )
    Ug, Pg = sh.from_sharded(Us, Ps)

    # single-device reference (same tolerances — iterate-exact target)
    base = sh.base
    Ub, Pb = base.zeros()
    t0 = time.time()
    iters_b = []
    for k in range(n_steps):
        Ub, Pb, statb = base.step(Ub, Pb, jnp.asarray(dt))
        iters_b.append(
            (int(statb.linear_iters), int(statb.pressure_iters),
             int(statb.correction_iters))
        )
        print(
            f"single step {k}: iters={iters_b[-1]} "
            f"({time.time() - t0:.1f}s cum)",
            flush=True,
        )
    Ubg, Pbg = base.from_packed_state(Ub, Pb)

    du = float(jnp.max(jnp.abs(Ug - Ubg)))
    dp = float(
        jnp.max(jnp.abs((Pg - jnp.mean(Pg)) - (Pbg - jnp.mean(Pbg))))
    )
    print(f"iteration parity: sharded={iters_s} single={iters_b}")
    print(f"state agreement after {n_steps} steps: |dU|={du:.3e} |dP|={dp:.3e}")
    ok = iters_s == iters_b and du < 1e-8 and dp < 1e-8
    print("PACKED_SCALE " + ("OK" if ok else "MISMATCH"), flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
