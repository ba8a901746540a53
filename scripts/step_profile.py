#!/usr/bin/env python
# Per-substep decomposition of the fused projection step at the benchmark
# configuration — answers "where do the seconds go" directly instead of
# inferring from solver counters (r3 chain-7: lagged at 1.9M gained only
# +9% vs +45% at 120k, so something besides the momentum solve dominates
# at scale, or the matvec itself is the wall).
#
# Usage: SP_REFINE=5 SP_CONVECTION=lagged python scripts/step_profile.py
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    if os.environ.get("SP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SP_PLATFORM"])

    import jax.numpy as jnp

    refine = int(os.environ.get("SP_REFINE", "5"))
    convection = os.environ.get("SP_CONVECTION", "lagged")
    lcar = float(os.environ.get("SP_LCAR", "0.02"))

    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.solvers.multigrid import P1Hierarchy
    from flow_tpu.solvers import krylov

    prob = KarmanProblem(lcar=lcar, n_refine=refine)
    newton_rtol = float(os.environ.get("BENCH_NEWTON_RTOL", "1.0e-2"))
    linear_rtol = float(os.environ.get("BENCH_LINEAR_RTOL", "1.0e-1"))
    st = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        convection=convection, rotational_form=True,
        newton_tol=0.0, newton_rtol=newton_rtol, newton_maxiter=4,
        linear_rtol=linear_rtol,
        pressure_rtol=1.0e-4, pressure_maxiter=600, correction_rtol=1.0e-5,
        cfl_target=1.0, dt_max=1.0,
    )
    if refine > 0:
        hier = P1Hierarchy(
            prob.mesh_hierarchy, bc_mask=st.mask_p, smoother_degree=3
        )
        st.pressure_precond = hier.v_cycle
    n_dofs = 2 * prob.V.n_dofs + prob.Q.n_dofs
    print(f"n_dofs={n_dofs} convection={convection} "
          f"tols=({newton_rtol},{linear_rtol})", flush=True)

    # ramp to the CFL dt with real bench stepping (one small chunk at a
    # time to stay under the tunnel watchdog)
    U, P = prob.V.zeros(), prob.Q.zeros()
    dt = 1.0e-4
    ramp = int(os.environ.get("SP_RAMP", "20"))
    chunk = max(1, min(5, int(7.0e5 / n_dofs * 6)))
    done = 0
    while done < ramp:
        U, P, dt, _ = st.run(U, P, dt, n_steps=chunk)
        dt = float(dt)
        done += chunk
    print(f"ramped {done} steps, dt={dt:.4e}", flush=True)
    dtj = jnp.asarray(dt, dtype=U.dtype)

    def wall(fn, reps, sync):
        """Time reps sequential dispatches; sync = value readback."""
        fn()  # compile
        sync()
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync_val = sync(out) if sync.__code__.co_argcount else sync()
        return (time.perf_counter() - t0) / reps

    # --- full fused step (fixed dt, BDF2 path like the bench scan body) ---
    step = jax.jit(lambda u, p: st._step_impl(u, p, dtj))
    o = step(U, P)
    _ = float(o[1][0])
    reps = max(1, int(os.environ.get("SP_REPS", "3")))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = step(U, P)
    _ = float(o[1][0])
    t_step = (time.perf_counter() - t0) / reps
    stats = o[2]
    print(f"fused step        : {t_step*1e3:9.1f} ms  "
          f"(newton={int(stats.newton_iters)} lin={int(stats.linear_iters)} "
          f"p={int(stats.pressure_iters)} c={int(stats.correction_iters)})",
          flush=True)

    # --- pressure solve ---
    psolve = jax.jit(lambda u, p: st._pressure_solve_mg(u, p, dtj))
    o = psolve(U, P); _ = float(o[1])
    t0 = time.perf_counter()
    for _ in range(reps):
        o = psolve(U, P)
    _ = float(o[1])
    t_p = (time.perf_counter() - t0) / reps
    print(f"pressure solve    : {t_p*1e3:9.1f} ms  (iters={int(o[1])})",
          flush=True)

    # --- velocity correction ---
    ctx = st.ctx
    csolve = jax.jit(lambda ui, p1, p0: ctx._velocity_correction_impl(
        ui, p1, p0, st.rho, st.mu, dtj, st.mask_u, st.val_u,
        st.correction_rtol, rotational=st.rotational,
    ))
    o = csolve(U, P, P * 0.9); _ = float(o[1])
    t0 = time.perf_counter()
    for _ in range(reps):
        o = csolve(U, P, P * 0.9)
    _ = float(o[1])
    t_c = (time.perf_counter() - t0) / reps
    print(f"velocity corr     : {t_c*1e3:9.1f} ms  (iters={int(o[1])})",
          flush=True)

    # --- momentum solve alone (lagged: affine solve; newton: full loop) ---
    free_u = 1.0 - st.mask_u
    x0 = free_u * U + st.mask_u * st.val_u

    def res_lag(x):
        r = ctx._residual(
            x, U, None, None, P, st.rho, st.mu, dtj, st.theta,
            transport=x0,
        )
        return free_u * r + st.mask_u * (x - st.val_u)

    w_im = st.theta[1]
    diag = ctx.mass_diag_V + (dtj / st.rho) * w_im * (2.0 * st.mu) * ctx.stiff_diag_V
    diag = free_u * diag + st.mask_u

    @jax.jit
    def mom_solve():
        r0 = res_lag(x0)
        _, Jv = jax.linearize(res_lag, x0)
        dx, sinfo = krylov.bicgstab(
            Jv, -r0, M=lambda t: t / diag, rtol=st.newton_rtol,
            atol=0.0, maxiter=300,
        )
        return x0 + dx, sinfo.iters

    o = mom_solve(); _ = float(o[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        o = mom_solve()
    _ = float(o[0][0, 0])
    t_m = (time.perf_counter() - t0) / reps
    print(f"momentum (lagged) : {t_m*1e3:9.1f} ms  (iters={int(o[1])})",
          flush=True)

    # --- single applies, amortized in one fori_loop execution ---
    import numpy as np

    def amortized(fn, x, reps_in):
        @jax.jit
        def loop(x0):
            def body(_, x):
                y = fn(x)
                return x + 1e-30 * y
            return jax.lax.fori_loop(0, reps_in, body, x0)
        out = loop(x); _ = float(out.ravel()[0])
        t0 = time.perf_counter()
        out = loop(x); _ = float(out.ravel()[0])
        return (time.perf_counter() - t0) / reps_in

    reps_in = max(2, min(50, int(50 * 4.0e5 / n_dofs)))
    t_res = amortized(lambda x: res_lag(x), U, reps_in)
    print(f"  residual apply  : {t_res*1e3:9.1f} ms", flush=True)

    _, Jv0 = jax.linearize(res_lag, x0)
    t_tan = amortized(lambda v: Jv0(v), U, reps_in)
    print(f"  tangent apply   : {t_tan*1e3:9.1f} ms", flush=True)

    t_kq = amortized(lambda p: st._KQ_apply(p), P, reps_in)
    print(f"  KQ apply        : {t_kq*1e3:9.1f} ms", flush=True)
    if st.pressure_precond is not None:
        t_mg = amortized(lambda p: st.pressure_precond(p), P, reps_in)
        print(f"  MG V-cycle      : {t_mg*1e3:9.1f} ms", flush=True)

    # --- forces probe + CFL (the scan-body extras) ---
    from flow_tpu.navier_stokes import forces as nsforces
    if hasattr(prob, "force_dof_weights"):
        pass
    resid = t_step - t_m - t_p - t_c
    print(f"unaccounted       : {resid*1e3:9.1f} ms "
          f"(BDF2 extrap, forces, divnorm, CFL)", flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
