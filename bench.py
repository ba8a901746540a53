#!/usr/bin/env python
# Headline benchmark: Karman vortex street timesteps/second (the
# BASELINE.json north-star metric: >50 steps/s @ 10M DoF on v5p-8).
#
# Runs the fused FastStepper (whole projection step = one XLA program,
# lax.scan over steps, on-device CFL dt controller) on the real TPU chip in
# f32 (SURVEY.md §7 hard part #4: f32 + loose solver tolerances for the
# performance path, f64 for the correctness suite).
#
# Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: the scan program is large and the axon
    # remote compiler slow; cache hits cut bench startup from ~15min to secs
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # TPU MXU defaults f32 einsums to bf16 passes; the Newton residual then
    # stalls around 1e-3 relative and hits its iteration cap. Full-f32
    # matmuls restore contraction (verified: CPU-f32 converges in 1-2 iters)
    jax.config.update("jax_default_matmul_precision", "highest")

    # f32 performance path on whatever the default platform provides
    # (TPU under the driver; CPU works too, just slower)
    import jax.numpy as jnp

    lcar = float(os.environ.get("BENCH_LCAR", "0.02"))
    n_refine = int(os.environ.get("BENCH_REFINE", "3"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    mode = os.environ.get("BENCH_MODE", "karman")

    if mode == "cavity3d":
        _bench_cavity3d(n_steps)
        return

    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper

    prob = KarmanProblem(lcar=lcar, n_refine=n_refine)
    n_dofs = 2 * prob.V.n_dofs + prob.Q.n_dofs

    stepper = FastStepper(
        prob.V,
        prob.Q,
        prob.u_bcs,
        prob.p_bcs,
        prob.rho,
        prob.mu,
        rotational_form=True,
        # f32 benchmark tolerances (physics-accuracy checked in the f64
        # suite). Inexact Newton: a loose inner solve with one extra outer
        # iteration costs ~3x fewer momentum applies than tight inner solves
        newton_tol=0.0,
        newton_rtol=1.0e-3,
        newton_maxiter=4,
        linear_rtol=3.0e-2,
        pressure_rtol=1.0e-4,
        pressure_maxiter=600,
        correction_rtol=1.0e-5,
        cfl_target=1.0,
        dt_max=1.0,
    )

    # geometric-multigrid preconditioner for the pressure Poisson solve
    # (the dominant cost; mesh hierarchy is free via uniform refinement)
    if n_refine > 0:
        from flow_tpu.solvers.multigrid import P1Hierarchy

        hier = P1Hierarchy(
            prob.mesh_hierarchy, bc_mask=stepper.mask_p, smoother_degree=3
        )
        stepper.pressure_precond = hier.v_cycle

    U = prob.V.zeros()
    P = prob.Q.zeros()
    dt0 = jnp.asarray(1.0e-4, dtype=U.dtype)

    # warmup call compiles the scan program AND ramps dt toward CFL;
    # the timed call reuses the compiled program (same static n_steps)
    U, P, dtw, _ = stepper.run(U, P, dt0, n_steps=n_steps)
    U.block_until_ready()

    t0 = time.perf_counter()
    U, P, dtf, tel = stepper.run(U, P, dtw, n_steps=n_steps)
    U.block_until_ready()
    elapsed = time.perf_counter() - t0

    steps_per_sec = n_steps / elapsed
    baseline = 50.0  # BASELINE.json north-star: >50 steps/s @10M DoF, v5p-8
    print(
        json.dumps(
            {
                "metric": f"karman_steps_per_sec@{n_dofs}dof",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / baseline, 3),
            }
        )
    )
    # diagnostics to stderr (driver only parses stdout)
    print(
        f"n_dofs={n_dofs} n_cells={prob.mesh.n_cells} elapsed={elapsed:.3f}s "
        f"newton_iters={np.asarray(tel['newton_iters']).tolist()} "
        f"pressure_iters={np.asarray(tel['pressure_iters']).tolist()} "
        f"dt_final={float(dtf):.3e}",
        file=sys.stderr,
    )


def _bench_cavity3d(n_steps):
    """Secondary workload: 3-D lid-driven cavity on the structured fast path
    (conv-stencil operators + structured multigrid; BENCH_N grid cells/dim)."""
    import time as _time

    import jax.numpy as jnp

    from flow_tpu.models.cavity3d import Cavity3DProblem
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.solvers.structured_mg import StructuredHierarchy

    n = int(os.environ.get("BENCH_N", "32"))
    prob = Cavity3DProblem(n=n, mu=0.01)
    n_dofs = 3 * prob.V.n_dofs + prob.Q.n_dofs
    stepper = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        rotational_form=True, newton_tol=0.0, newton_rtol=1.0e-3,
        newton_maxiter=4, linear_rtol=3.0e-2, pressure_rtol=1.0e-4,
        correction_rtol=1.0e-5, cfl_target=1.0, dt_max=0.1,
    )
    stepper.pressure_precond = StructuredHierarchy(prob.mesh).v_cycle
    U, P = prob.V.zeros(), prob.Q.zeros()
    dt0 = jnp.asarray(1.0e-3, dtype=U.dtype)
    U, P, dtw, _ = stepper.run(U, P, dt0, n_steps=n_steps)
    U.block_until_ready()
    t0 = _time.perf_counter()
    U, P, dtf, tel = stepper.run(U, P, dtw, n_steps=n_steps)
    U.block_until_ready()
    elapsed = _time.perf_counter() - t0
    sps = n_steps / elapsed
    print(
        json.dumps(
            {
                "metric": f"cavity3d_steps_per_sec@{n_dofs}dof",
                "value": round(sps, 3),
                "unit": "steps/s",
                "vs_baseline": round(sps / 50.0, 3),
            }
        )
    )
    print(
        f"n_dofs={n_dofs} elapsed={elapsed:.3f}s "
        f"pressure_iters={np.asarray(tel['pressure_iters']).tolist()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    # the axon TPU tunnel leaves non-daemon threads that block interpreter
    # exit; the benchmark is done — leave decisively
    os._exit(0)
