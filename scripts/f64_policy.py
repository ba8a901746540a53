#!/usr/bin/env python
# f64-on-TPU policy measurement (VERDICT r02 item 7 / SURVEY §7 hard part 4).
#
# Probes:
#   sealed  — the hydrostatic rest-state invariant (|u1|_inf after one IPCS
#             step with p0 = rho g y; the reference demands < 1e-13,
#             /root/reference/tests/test_sealed_box.py:141)
#   speed   — per-step wall time of the fused Karman step at 120k DoF
# each under two precision policies:
#   f64     — jax_enable_x64 (XLA:TPU supports f64 at reduced rate)
#   f32     — the benchmark dtype
# An f32+iterative-refinement middle ground was considered and rejected
# on structural grounds: the sealed-box invariant is set by the f32
# ROUNDING OF THE ASSEMBLED RHS (gravity vs pressure-gradient terms
# cancel analytically but not in f32), so refining only the linear
# solves in f64 cannot recover it — the error is already in b, not in
# the solve. Invariant-grade accuracy requires f64 assembly, which is
# exactly the f64 column here.
#
# Usage: F64P_PLATFORM=axon|cpu python scripts/f64_policy.py [probe]
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def setup(x64):
    import jax

    jax.config.update("jax_platforms", os.environ.get("F64P_PLATFORM", "cpu"))
    jax.config.update("jax_enable_x64", x64)
    jax.config.update("jax_default_matmul_precision", "highest")
    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def probe_sealed(x64):
    jax = setup(x64)
    import jax.numpy as jnp
    from flow_tpu import (
        unit_square_mesh, VectorFunctionSpace, FunctionSpace, DirichletBC,
        project, Function,
    )
    import flow_tpu.navier_stokes as navsto

    mesh = unit_square_mesh(16, "crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    g = -9.81
    p0 = project(lambda x: g * x[..., 1], Q)
    u0 = Function(V)
    u_bcs = [DirichletBC(V, (0.0, 0.0), "on_boundary")]
    t0 = time.time()
    from flow_tpu.utils.config import SchemeConfig

    # f32 cannot reach the f64 default newton_tol=1e-10; the invariant is
    # then set by the f32 ROUNDING of the assembled RHS, not solver slop
    cfg = None if x64 else SchemeConfig(newton_tol=1.0e-5)
    u1, p1 = navsto.IPCS(scheme_config=cfg).step(
        0.1, {0: u0}, p0, u_bcs, [], rho=1.0, mu=1.0,
        f={0: (0.0, g), 1: (0.0, g)}, verbose=False,
        tol=1.0e-13 if x64 else 1.0e-5,
    )
    linf = float(jnp.max(jnp.abs(u1.vector)))
    print(
        f"sealed x64={x64}: |u1|_inf = {linf:.3e}  ({time.time()-t0:.1f}s)",
        flush=True,
    )
    return linf


def probe_speed(x64, n_steps=10, lcar=0.02, n_refine=3):
    jax = setup(x64)
    import jax.numpy as jnp
    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.solvers.multigrid import P1Hierarchy

    prob = KarmanProblem(lcar=lcar, n_refine=n_refine)
    st = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        rotational_form=True, newton_tol=0.0, newton_rtol=1e-3,
        newton_maxiter=4, linear_rtol=3e-2, pressure_rtol=1e-4,
        correction_rtol=1e-5, cfl_target=1.0, dt_max=1.0,
    )
    hier = P1Hierarchy(prob.mesh_hierarchy, bc_mask=st.mask_p, smoother_degree=3)
    st.pressure_precond = hier.v_cycle
    U, P = prob.V.zeros(), prob.Q.zeros()
    dt = jnp.asarray(1e-4, dtype=U.dtype)
    U, P, dt, _ = st.run(U, P, dt, n_steps=n_steps)  # warm + ramp
    float(dt)
    t0 = time.perf_counter()
    U, P, dtf, _ = st.run(U, P, dt, n_steps=n_steps)
    float(dtf)
    el = time.perf_counter() - t0
    n_dofs = 2 * prob.V.n_dofs + prob.Q.n_dofs
    print(
        f"speed x64={x64}: {n_steps/el:.3f} steps/s @ {n_dofs} dofs",
        flush=True,
    )
    return n_steps / el


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "sealed"
    x64 = os.environ.get("F64P_X64", "1") == "1"
    if which == "sealed":
        probe_sealed(x64)
    else:
        probe_speed(x64, n_steps=int(os.environ.get("F64P_STEPS", "10")))
    sys.stdout.flush()
    os._exit(0)
