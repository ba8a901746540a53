#!/usr/bin/env python
# Headline benchmark: Karman vortex street timesteps/second plus the other
# two BASELINE.json metric axes (assembly GDoF/s, pressure-Poisson solve ms).
# North star: >50 steps/s @ 10M DoF on v5p-8; this harness runs whatever
# device the driver provides (one v5e chip here) and reports the largest
# problem size that fits, with a size-scaling series for BENCH_NOTES.
#
# Runs the fused FastStepper (whole projection step = one XLA program,
# lax.scan over steps, on-device CFL dt controller) in f32 (SURVEY.md §7
# hard part #4: f32 + loose solver tolerances for the performance path,
# f64 for the correctness suite).
#
# Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
import json
import os
import sys
import time

import numpy as np


def _setup_jax():
    import jax

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
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])


def _calibrated_tols():
    """(newton_rtol, linear_rtol) bench stopping defaults — calibrated
    on-chip (BENCH_NOTES r3 chains 5/6: Newton holds at 2 iterations with
    ~9-iteration inner solves, +147% steps/s @1.9M vs the 1e-3/3e-2
    reference) and physics-guarded (stage-2 limit cycle identical to
    production tolerances). Shared by every bench mode so the karman and
    cavity3d paths cannot drift apart."""
    return (
        float(os.environ.get("BENCH_NEWTON_RTOL", "1.0e-2")),
        float(os.environ.get("BENCH_LINEAR_RTOL", "1.0e-1")),
    )


def _build(lcar, n_refine):
    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.solvers.multigrid import P1Hierarchy

    prob = KarmanProblem(lcar=lcar, n_refine=n_refine)
    # BENCH_PATCH=packed (DEFAULT since round 4): the lane-packed patch
    # stepper (fem/patchpack.py + navier_stokes/patchfast.py) — gather-free
    # AND tile-padding-free; measured 61.9/12.38/1.545 steps/s at
    # 120k/1.9M/10M (8.5x/29x/47x the round-3 records) and physics-guarded
    # by the from-scratch stage-2 DFG 2D-2 limit cycle under the full bench
    # configuration (St 0.29998, Cd_max 3.2492, Cl 0.988 —
    # campaigns/r4chain1/st2_packed.log; committed series agree).
    # BENCH_PATCH=1: the generic patch layout; BENCH_PATCH=0: the round-3
    # einsum path. All iterate-exact vs each other (tests/test_patch*.py);
    # patch modes need the coarse+refine^k hierarchy, so refine-0 falls
    # back to the einsum path.
    patch_env = os.environ.get("BENCH_PATCH", "packed")
    patches = None
    if patch_env in ("1", "packed") and n_refine > 0:
        from flow_tpu.fem.patch import build_patch_info

        patches = build_patch_info(prob.mesh_hierarchy)
    if patch_env == "packed" and patches is not None:
        from flow_tpu.navier_stokes.patchfast import PackedPatchStepper

        stepper = PackedPatchStepper(
            prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
            patches,
            newton_tol=0.0,
            newton_rtol=_calibrated_tols()[0],
            linear_rtol=_calibrated_tols()[1],
            pressure_rtol=float(
                os.environ.get("BENCH_PRESSURE_RTOL", "3.0e-4")
            ),
            correction_rtol=float(
                os.environ.get("BENCH_CORRECTION_RTOL", "1.0e-4")
            ),
            # bicgstab (DEFAULT since r5 chain-3): with the packed
            # operators cheap, the GMRES(32) batched-MGS basis ([33, 2*n2]
            # read 2x/iter) is ~80% of the step's HBM bytes — measured
            # A/B: 12.38 -> 19.84 steps/s at 1.9M, 1.545 -> 2.261 at 10M.
            # BiCGStab holds no basis; its limit cycle is pinned
            # (the production-tolerance stage-2/3 cycles pre-date the
            # gmres adoption and ran bicgstab, tests/test_shedding_*).
            momentum_solver=os.environ.get("BENCH_MOM_SOLVER", "bicgstab"),
            mg_smoother_degree=int(os.environ.get("BENCH_MG_DEGREE", "3")),
            cfl_target=1.0,
            dt_max=1.0,
        )
        return prob, stepper
    stepper = FastStepper(
        prob.V,
        prob.Q,
        prob.u_bcs,
        prob.p_bcs,
        prob.rho,
        prob.mu,
        patches=patches,
        # BENCH_MOMENTUM_PRECOND=vertex enables the SUPG-diagonal vertex
        # correction (A/B measured on the real chip; see BENCH_NOTES r03)
        momentum_precond=os.environ.get("BENCH_MOMENTUM_PRECOND") or None,
        # BENCH_PACKED=0 forces the einsum path (packed-layout A/B)
        packed=(
            False if os.environ.get("BENCH_PACKED", "") == "0" else "auto"
        ),
        # semi-implicit (lagged/extrapolated) convection, DEFAULT since r3
        # chain-7: one linear momentum solve per step. Physics-guarded the
        # same way as the stopping pair — the 148k-DoF stage-2 limit cycle
        # under lagged + the aggressive tolerances reproduces the
        # production-newton values (St 0.30013 vs 0.3001, Cd_max 3.2502 vs
        # 3.2477, Cl 0.99) and runs 1.9x faster there. BENCH_CONVECTION=
        # newton restores the full-Newton path.
        convection=os.environ.get("BENCH_CONVECTION", "lagged"),
        # GMRES(32) momentum solve, DEFAULT since r3 chain-13: BiCGStab
        # pays 2 matvecs/iteration; at the calibrated ~10-iteration solves
        # GMRES's [m+1, N] MXU orthogonalization is free next to the
        # matvec (+6% @120k, +20% @1.9M, BENCH_NOTES chain-11).
        # Physics-guarded: the stage-2 limit cycle developed entirely
        # under lagged + aggressive pair + gmres reproduces the
        # production values (St 0.30013, Cd_max 3.2487 — chain-13;
        # tests/data/schafer_turek_stage2_gmres.npz). FLOW_MOM_SOLVER
        # still overrides (fast.py).
        momentum_solver=os.environ.get("BENCH_MOM_SOLVER", "gmres"),
        rotational_form=True,
        # f32 benchmark tolerances (physics-accuracy checked in the f64
        # suite). Inexact Newton: a loose inner solve with one extra outer
        # iteration costs ~3x fewer momentum applies than tight inner solves
        newton_tol=0.0,
        newton_rtol=_calibrated_tols()[0],
        newton_maxiter=4,
        # BENCH_EW=1: Eisenstat-Walker adaptive inner forcing (re-A/B under
        # the increment-form trajectory measured negative again — it
        # over-solves below the calibrated loose fixed tolerance;
        # BENCH_NOTES r3 chain-5)
        ew_forcing=os.environ.get("BENCH_EW", "0") == "1",
        linear_rtol=_calibrated_tols()[1],
        # calibrated pressure/correction stopping, DEFAULT since r3
        # chain-13 (pressure 3e-4 / correction 1e-4, was 1e-4 / 1e-5):
        # correction CG drops 11 -> 8 iterations, +6% steps/s @120k
        # (chain-11 solo recheck). Loosened pc-stopping was the round-3
        # failure class (full-field stopping floors damped the Hopf
        # mode), so the candidate carried its own stage-2 limit-cycle
        # guard (chain-10, tests/data/schafer_turek_stage2_pcstop.npz)
        # before adoption; the combined gmres+pc guard is chain-13.
        pressure_rtol=float(os.environ.get("BENCH_PRESSURE_RTOL", "3.0e-4")),
        pressure_maxiter=600,
        correction_rtol=float(
            os.environ.get("BENCH_CORRECTION_RTOL", "1.0e-4")
        ),
        cfl_target=1.0,
        dt_max=1.0,
    )
    if n_refine > 0:
        # BENCH_MG_DEGREE: Chebyshev smoother degree per pre/post smooth —
        # the V-cycle cost knob (fine-level ELL applies per cycle scale
        # with it; pressure CG iteration count may grow as it shrinks)
        deg = int(os.environ.get("BENCH_MG_DEGREE", "3"))
        if patches is not None:
            from flow_tpu.solvers.patch_mg import PatchP1Hierarchy

            hier = PatchP1Hierarchy(
                patches, bc_mask=stepper.mask_p, smoother_degree=deg
            )
        else:
            hier = P1Hierarchy(
                prob.mesh_hierarchy, bc_mask=stepper.mask_p,
                smoother_degree=deg,
            )
        stepper.pressure_precond = hier.v_cycle
    return prob, stepper


def _measure_steps(prob, stepper, n_steps):
    import jax.numpy as jnp

    # patch modes: create the state in patch layout so the whole scan
    # stays patch-resident (no per-chunk conversion gathers)
    if hasattr(stepper, "zeros"):  # PackedPatchStepper
        U, P = stepper.zeros()
    else:
        U = stepper.V.zeros()
        P = stepper.Q.zeros()
    dt0 = jnp.asarray(1.0e-4, dtype=U.dtype)

    # granular (host-orchestrated) mode, opt-in via BENCH_GRANULAR=1:
    # one bounded execution per momentum segment / pressure / correction
    # for configurations whose fused step program OOMs HBM or exceeds
    # the tunnel execution cap. With the lane-packed fused path
    # (fem/packed.py) even 7.6M DoF fits fused (~41 s/step survived the
    # watchdog, chain-18), so fused is the default at every size.
    granular = os.environ.get("BENCH_GRANULAR", "0")
    reps = _timed_reps()
    if granular == "1":
        km = int(os.environ.get("BENCH_KRY_MAXITER", "10"))
        U, P, dtw, _ = stepper.run_granular(
            U, P, 1.0e-4, n_steps=n_steps, kry_maxiter=km
        )
        sps_list = []
        dtf, tel = dtw, None
        for _rep in range(reps):
            t0 = time.perf_counter()
            U, P, dtf, tel = stepper.run_granular(
                U, P, dtf, n_steps=n_steps, kry_maxiter=km
            )
            sps_list.append(n_steps / (time.perf_counter() - t0))
        return max(sps_list), float(dtf), tel, (U, P), sps_list
    # chunk the scan so one device execution stays under ~8 s: the axon
    # worker watchdog kills long single executions (a 20-step scan at
    # refine-5 is a single ~300 s execution -> 'TPU device error'; every
    # substep verified fine in isolation). Estimate steps/s from problem
    # size, pick the largest divisor of n_steps under the cap.
    n_dofs = 2 * prob.V.n_dofs + prob.Q.n_dofs
    # throughput estimate for watchdog-safe chunking. The 7e5 constant is a
    # v5e measurement; a config slower than the calibration would produce a
    # chunk exceeding the ~8 s watchdog and kill the whole size (ADVICE r02)
    # — budget 6 s for margin and allow an env override for slow configs.
    # the 7e5 constant is the einsum-path calibration; the packed-patch
    # stepper measured ~40x faster per step (88 ms at 1.9M, r4 profile) —
    # chunking for it with the einsum estimate degenerates to chunk=1 and
    # the per-call dispatch of the ~150-argument hoisted program dominates
    base = 2.5e7 if hasattr(stepper, "bench_residual") else 7.0e5
    est_sps = float(os.environ.get("BENCH_EST_SPS", 0)) or base / n_dofs
    budget_s = float(os.environ.get("BENCH_CHUNK_BUDGET_S", "6"))
    chunk = 1
    for c in sorted({d for d in range(1, n_steps + 1) if n_steps % d == 0}):
        if c <= max(1.0, budget_s * est_sps):
            chunk = c

    def run_n(U, P, dt, total):
        tels = []
        for _ in range(total // chunk):
            U, P, dt, tel = stepper.run(U, P, dt, n_steps=chunk)
            tels.append(tel)
        # axon quirk: block_until_ready on a chain of queued executions
        # returns early (~0.4 ms for a 70 s chain) — only an actual value
        # readback synchronizes. dt depends on every step; pull it.
        float(dt)
        import jax

        tel = jax.tree.map(lambda *xs: jnp.concatenate(xs), *tels)
        return U, P, dt, tel

    # warmup pass compiles the chunk program AND ramps dt toward CFL; the
    # timed passes reuse the compiled program (same static chunk).
    # BEST-OF-N (default 3, BENCH_TIMED_REPS): degraded-device windows
    # produce 3.6x wall-clock swings at identical iteration counts with an
    # identical dispatch canary (BENCH_NOTES chain-18 postmortem; VERDICT
    # r03 weak #2) — a single timed shot measures the device lottery as
    # much as the tree. All N are recorded in the entry so the spread
    # itself is evidence of device health.
    U, P, dtw, _ = run_n(U, P, dt0, n_steps)
    sps_list = []
    dtf, tel = dtw, None
    for _rep in range(reps):
        t0 = time.perf_counter()
        U, P, dtf, tel = run_n(U, P, dtf, n_steps)
        sps_list.append(n_steps / (time.perf_counter() - t0))
    return max(sps_list), float(dtf), tel, (U, P), sps_list


def _timed_reps():
    return max(1, int(os.environ.get("BENCH_TIMED_REPS", "3")))


def _bench_reps(n_dofs, cap=50):
    # keep ONE amortizing fori_loop execution under the ~8 s tunnel
    # watchdog: a residual apply is ~5 ms at 120k dofs and scales ~linearly
    return max(2, min(cap, int(cap * 4.0e5 / max(n_dofs, 1))))


def _measure_assembly(prob, stepper, state, reps=None):
    """Assembly-throughput axis: momentum dofs processed per second by ONE
    full weak-form residual assembly (the gather -> einsum chain -> dof-sum
    pipeline that replaces FFC+DOLFIN assembly; BASELINE 'assembly GDoF/s').
    Amortized inside a single jitted fori_loop — per-call dispatch through
    the axon tunnel is ~1 ms and would swamp the kernel time."""
    import jax
    import jax.numpy as jnp

    U, P = state
    if reps is None:
        reps = _bench_reps(prob.V.n_dofs * prob.V.n_components)
    dt = jnp.asarray(1.0e-3, dtype=U.dtype)

    if hasattr(stepper, "bench_residual"):  # PackedPatchStepper

        @jax.jit
        def loop(x0):
            def body(_, x):
                r = stepper.bench_residual(x, U, P, dt)
                return x + 1e-30 * r

            return jax.lax.fori_loop(0, reps, body, x0)

    else:
        ctx = stepper.ctx

        @jax.jit
        def loop(x0):
            def body(_, x):
                r = ctx._residual(
                    x, U, None, None, P, stepper.rho, stepper.mu, dt,
                    stepper.theta,
                )
                return x + 1e-30 * r

            return jax.lax.fori_loop(0, reps, body, x0)

    out = loop(U)
    float(out.ravel()[0])  # value readback: block_until_ready can return early
    t0 = time.perf_counter()
    out = loop(U)
    float(out.ravel()[0])
    per_apply = (time.perf_counter() - t0) / reps
    n_momentum_dofs = prob.V.n_dofs * prob.V.n_components
    return n_momentum_dofs / per_apply / 1.0e9, per_apply


def _measure_poisson(prob, stepper, state, reps=None):
    """Pressure-Poisson axis: one MG-preconditioned CG solve to the bench
    tolerance, in milliseconds (the PETSc+BoomerAMG replacement; reference
    pressure solve: pressure_correction.py:407-419). Amortized in-loop."""
    import jax
    import jax.numpy as jnp

    U, P = state
    if reps is None:
        reps = _bench_reps(prob.Q.n_dofs, cap=10)
    dt = jnp.asarray(1.0e-3, dtype=U.dtype)

    @jax.jit
    def loop(p0):
        def body(_, carry):
            p, acc = carry
            p1, iters = stepper._pressure_solve_mg(U, p, dt)
            return (p0 + 1e-30 * p1, acc + iters)

        return jax.lax.fori_loop(0, reps, body, (p0, jnp.array(0)))

    (p1, iters) = loop(P * 0.0)
    float(p1.ravel()[0])  # value readback: block_until_ready can return early
    t0 = time.perf_counter()
    (p1, iters) = loop(P * 0.0)
    float(p1.ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1.0e3
    return ms, int(iters) // reps


def _measure_dispatch(reps=5):
    """Per-execution dispatch floor: N trivial executions, each
    synchronized by a value readback. The chain-18 postmortem: a degraded
    device window ran the 1.9M step series 3.6x slow with IDENTICAL
    iteration counts and an IDENTICAL poisson canary (the poisson axis
    amortizes inside ONE execution, so it is blind to per-execution
    cost). This canary makes that mode attributable in the record."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    y = f(jnp.zeros(8, jnp.float32))
    _ = float(y[0])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        y = f(y)
        _ = float(y[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def _run_single(lcar, n_refine, n_steps, with_axes):
    """Measure one size; prints one JSON line (consumed by the parent)."""
    _setup_jax()
    prob, stepper = _build(lcar, n_refine)
    n_dofs = 2 * prob.V.n_dofs + prob.Q.n_dofs
    sps, dtf, tel, state, sps_list = _measure_steps(prob, stepper, n_steps)
    entry = {
        "n_dofs": n_dofs,
        "steps_per_sec": round(sps, 3),
        # all timed reps (best is the headline): the spread attributes
        # degraded-device windows (see _measure_steps)
        "steps_per_sec_reps": [round(s, 3) for s in sps_list],
    }
    try:
        entry["dispatch_ms"] = round(_measure_dispatch(), 2)
    except Exception as e:  # noqa: BLE001
        print(f"dispatch canary failed: {type(e).__name__}", file=sys.stderr)
    if with_axes:
        # the axes programs embed index tables as HLO constants (they are
        # standalone jits, not the hoisted step path) — at ~10M DoF they
        # can exceed the remote-compile request cap (HTTP 413). The
        # steps/s headline is already measured; never lose it to an
        # auxiliary-axis failure.
        try:
            gdofs, per_apply = _measure_assembly(prob, stepper, state)
            entry["assembly_gdof_s"] = round(gdofs, 3)
        except Exception as e:  # noqa: BLE001
            print(f"assembly axis failed: {type(e).__name__}", file=sys.stderr)
        try:
            pms, piters = _measure_poisson(prob, stepper, state)
            entry["poisson_ms"] = round(pms, 3)
            entry["poisson_iters"] = piters
        except Exception as e:  # noqa: BLE001
            print(f"poisson axis failed: {type(e).__name__}", file=sys.stderr)
    print("BENCH_ENTRY " + json.dumps(entry))
    print(
        f"n_dofs={n_dofs} n_cells={prob.mesh.n_cells} "
        f"newton_iters={np.asarray(tel['newton_iters']).tolist()} "
        f"linear_iters={np.asarray(tel['linear_iters']).tolist()} "
        f"pressure_iters={np.asarray(tel['pressure_iters']).tolist()} "
        f"correction_iters={np.asarray(tel['correction_iters']).tolist()} "
        f"dt_final={dtf:.3e}",
        file=sys.stderr,
    )


def main():
    lcar = float(os.environ.get("BENCH_LCAR", "0.02"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    mode = os.environ.get("BENCH_MODE", "karman")

    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        _run_single(lcar, int(sys.argv[2]), n_steps, sys.argv[3] == "1")
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    if mode == "cavity3d":
        _setup_jax()
        _bench_cavity3d(n_steps)
        return

    # candidate sizes, SMALLEST first, each in its own subprocess: a device
    # fault / OOM at a large size must not poison the sizes already measured
    # (observed: one refine-5 'TPU device error' left the in-process client
    # broken for every subsequent size). Headline = largest success.
    # (refine 5 = 1.92M DoF, 4 = 481k, 3 = 120k at lcar 0.02)
    import subprocess
    import time as _time

    def wait_device_claimable(max_wait=600.0):
        if os.environ.get("BENCH_SKIP_GATE") == "1":  # CPU smoke runs
            return True
        # The tunnel daemon holds the device grant for a while after a
        # client dies abruptly (each --single child exits via os._exit);
        # a client that claims during that window wedges FOREVER on its
        # first op while later fresh clients succeed. Gate each size on a
        # cheap fresh-process probe.
        deadline = _time.time() + max_wait
        while _time.time() < deadline:
            try:
                p = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp;"
                     "jnp.zeros(8).block_until_ready()"],
                    capture_output=True,
                    timeout=90,
                )
                if p.returncode == 0:
                    return True
            except subprocess.TimeoutExpired:
                pass
            _time.sleep(10)
        return False

    # default sizes: 120k (quick, guaranteed headline fallback) + 1.9M (the
    # >=1M-DoF point). refine-4 is skipped by default to keep a cold-cache
    # run under ~25 min (its number is recorded in BENCH_NOTES; set
    # BENCH_REFINES=3,4,5 for the full series).
    refines = sorted(
        int(x) for x in os.environ.get("BENCH_REFINES", "3,5").split(",")
    )
    # a COLD-cache refine-5 (machine swap wipes nothing in-repo, but the
    # .jax_cache is per-machine) spends ~15 min in the remote compiler
    # before stepping — give each size room for compile + warm + timed
    per_size_timeout = float(os.environ.get("BENCH_SIZE_TIMEOUT", "2700"))
    series = {}
    headline = None  # (n_refine, entry) — largest size that succeeded
    for i, n_refine in enumerate(refines):
        # up to 2 attempts: the TPU tunnel client occasionally wedges during
        # its handshake (observed: child stuck on a futex with the device
        # responsive to fresh processes) and a device fault at one size must
        # not sink the size (a fresh client recovers)
        for attempt in (1, 2):
            try:
                if not wait_device_claimable():
                    raise RuntimeError("TPU never became claimable")
                log = f"/tmp/bench_single_r{n_refine}_a{attempt}.log"
                with open(log, "w") as fh:
                    r = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--single", str(n_refine), "1"],
                        stdout=fh,
                        stderr=subprocess.STDOUT,
                        timeout=per_size_timeout,
                        cwd=os.path.dirname(os.path.abspath(__file__)),
                    )
                out = open(log).read()
                sys.stderr.write(out[-2000:])
                line = [
                    l for l in out.splitlines()
                    if l.startswith("BENCH_ENTRY ")
                ]
                if not line:
                    raise RuntimeError(
                        f"rc={r.returncode} no entry; tail={out[-200:]!r}"
                    )
                entry = json.loads(line[-1][len("BENCH_ENTRY "):])
                series[n_refine] = entry
                headline = (n_refine, entry)
                break
            except Exception as e:  # OOM / compile fail / timeout / wedge
                print(
                    f"refine={n_refine} attempt {attempt} failed: {e!r}",
                    file=sys.stderr,
                )
                series[n_refine] = {"error": str(e)[:200]}

    cached = _cached_large_entries()
    if headline is None and cached:
        # every LIVE size failed (e.g. the TPU tunnel outage of
        # 2026-08-18, BENCH_NOTES): fall back to the newest
        # campaign-measured entry, EXPLICITLY labeled — better an honest
        # cached record than no record at all
        entry = dict(cached[-1])
        entry["cached_fallback"] = True
        headline = (-1, entry)
        print(
            "WARNING: no live size succeeded; emitting cached campaign "
            "entry (cached_fallback=true)",
            file=sys.stderr,
        )
    assert headline is not None, "no benchmark size succeeded"
    n_refine, entry = headline
    baseline = 50.0  # BASELINE.json north-star: >50 steps/s @10M DoF, v5p-8
    print(
        json.dumps(
            {
                "metric": f"karman_steps_per_sec@{entry['n_dofs']}dof",
                "value": entry["steps_per_sec"],
                "unit": "steps/s",
                "vs_baseline": round(entry["steps_per_sec"] / baseline, 3),
                # work-normalized against the north star (50 steps/s x 10M
                # DoF = 5e8 DoF*steps/s) — the honest cross-size comparison
                "work_vs_baseline": round(
                    entry["steps_per_sec"] * entry["n_dofs"] / 5.0e8, 5
                ),
                "assembly_gdof_s": entry.get("assembly_gdof_s"),
                "poisson_ms": entry.get("poisson_ms"),
                "dispatch_ms": entry.get("dispatch_ms"),
                "cached_fallback": entry.get("cached_fallback", False),
                "series": {str(k): v for k, v in series.items()},
                # large-size points from dedicated campaigns (BENCH_LARGE
                # .json, explicitly labeled cached — the headline above is
                # from THIS live run unless cached_fallback is set)
                "cached_series": cached,
            }
        )
    )


def _cached_large_entries():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LARGE.json")
    try:
        with open(path) as fh:
            return json.load(fh).get("entries", [])
    except Exception:
        return []


def _bench_cavity3d(n_steps):
    """Secondary workload: 3-D lid-driven cavity.

    BENCH_3D_BACKEND=box (DEFAULT since round 5): the box-packed
    structured-lattice stepper (fem/boxpack.py + navier_stokes/boxfast.py)
    — parity-pinned vs the einsum FastStepper in tests/test_boxpack.py;
    zero per-cell geometry/index arrays, so the N>=48 OOM class vanishes.
    BENCH_3D_BACKEND=einsum: the round-3/4 gather path (FastStepper +
    conv-stencil pressure MG) with its chunk/EMA-off fallbacks."""
    import time as _time

    import jax.numpy as jnp

    from flow_tpu.models.cavity3d import Cavity3DProblem
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.solvers.structured_mg import StructuredHierarchy

    n = int(os.environ.get("BENCH_N", "32"))
    if os.environ.get("BENCH_3D_BACKEND", "box") == "box":
        _bench_cavity3d_box(n, n_steps)
        return
    # large 3-D sizes OOM on unchunked (nc, nq, nl)-class quadrature temps
    # (measured: N=48 17.6G, N=64 41.6G vs 15.75G HBM — chains 4/17);
    # default the cell chunk on so the ladder doesn't depend on the
    # campaign script remembering it
    if n >= 48 and not os.environ.get("FLOW_CELL_CHUNK"):
        os.environ["FLOW_CELL_CHUNK"] = "131072"
    # N>=64 still OOMs at compile WITH the chunked EMA build (chain-19b:
    # 24.0G vs 15.75G HBM): the persistent [nc, nl*nl] scalar element
    # tensor at P2-tet N=64 (nc=1.57M, nl=10 -> multi-GB with tile
    # padding) plus MG level operators don't fit. Fall back to
    # matvec-by-quadrature (EMA off, and linfast off since it exists to
    # amortize the EMA build) — only chunk-bounded temps persist.
    if n >= 64:
        os.environ.setdefault("FLOW_LAGGED_EMA", "0")
        os.environ.setdefault("FLOW_GRAN_LINFAST", "0")
    prob = Cavity3DProblem(n=n, mu=0.01)
    n_dofs = 3 * prob.V.n_dofs + prob.Q.n_dofs
    stepper = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        rotational_form=True, newton_tol=0.0,
        # same env knobs + calibrated defaults as the karman path
        newton_rtol=_calibrated_tols()[0],
        # lagged default shared with the karman path (guard: chain-7)
        convection=os.environ.get("BENCH_CONVECTION", "lagged"),
        newton_maxiter=4,
        linear_rtol=_calibrated_tols()[1],
        # cavity3d keeps production pc-stopping and BiCGStab: the chain-13
        # adoption guard (stage-2 Karman limit cycle) certifies the 2-D
        # wake physics only, and the recorded 3-D ladder (BENCH_NOTES)
        # was measured at these defaults
        pressure_rtol=float(os.environ.get("BENCH_PRESSURE_RTOL", "1.0e-4")),
        correction_rtol=float(
            os.environ.get("BENCH_CORRECTION_RTOL", "1.0e-5")
        ),
        cfl_target=1.0, dt_max=0.1,
    )
    stepper.pressure_precond = StructuredHierarchy(prob.mesh).v_cycle
    U, P = prob.V.zeros(), prob.Q.zeros()
    dt0 = jnp.asarray(1.0e-3, dtype=U.dtype)
    # granular (host-orchestrated) mode for sizes whose fused step OOMs
    # HBM on the (nc, nl, m) jvp quadrature temps (N>=48 measured, chain 4)
    # or exceeds the tunnel watchdog — same switch as the karman path
    sps_list = []
    if os.environ.get("BENCH_GRANULAR", "0") == "1":
        km = int(os.environ.get("BENCH_KRY_MAXITER", "10"))
        U, P, dtf, _ = stepper.run_granular(
            U, P, 1.0e-3, n_steps=n_steps, kry_maxiter=km
        )
        for _rep in range(_timed_reps()):
            t0 = _time.perf_counter()
            U, P, dtf, tel = stepper.run_granular(
                U, P, dtf, n_steps=n_steps, kry_maxiter=km
            )
            sps_list.append(n_steps / (_time.perf_counter() - t0))
    else:
        U, P, dtf, _ = stepper.run(U, P, dt0, n_steps=n_steps)
        # axon quirk: block_until_ready on a queued execution chain can
        # return EARLY — only an actual value readback synchronizes (the
        # karman path's run_n already does this; chain-18's c3d32_all
        # "48.6 steps/s" was this bug: elapsed=0.206 s measured dispatch,
        # not execution)
        float(dtf)
        for _rep in range(_timed_reps()):
            t0 = _time.perf_counter()
            U, P, dtf, tel = stepper.run(U, P, dtf, n_steps=n_steps)
            float(dtf)
            sps_list.append(n_steps / (_time.perf_counter() - t0))
    sps = max(sps_list)
    print(
        json.dumps(
            {
                "metric": f"cavity3d_steps_per_sec@{n_dofs}dof",
                "value": round(sps, 3),
                "unit": "steps/s",
                "vs_baseline": round(sps / 50.0, 3),
                "steps_per_sec_reps": [round(s, 3) for s in sps_list],
            }
        )
    )
    print(
        f"n_dofs={n_dofs} best_of={len(sps_list)} "
        f"pressure_iters={np.asarray(tel['pressure_iters']).tolist()}",
        file=sys.stderr,
    )


def _bench_cavity3d_box(n, n_steps):
    import time as _time

    import jax.numpy as jnp

    from flow_tpu.models.cavity3d import Cavity3DProblem
    from flow_tpu.navier_stokes.boxfast import BoxPackedStepper

    prob = Cavity3DProblem(n=n, mu=0.01)
    n_dofs = 3 * prob.V.n_dofs + prob.Q.n_dofs
    stepper = BoxPackedStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        newton_tol=0.0,
        newton_rtol=_calibrated_tols()[0],
        linear_rtol=_calibrated_tols()[1],
        pressure_rtol=float(os.environ.get("BENCH_PRESSURE_RTOL", "1.0e-4")),
        correction_rtol=float(
            os.environ.get("BENCH_CORRECTION_RTOL", "1.0e-5")
        ),
        momentum_solver=os.environ.get("BENCH_MOM_SOLVER_3D", "bicgstab"),
        cfl_target=1.0, dt_max=0.1,
    )
    Uf, Pf = stepper.zeros()
    dt0 = jnp.asarray(1.0e-3, dtype=Uf.dtype)
    Uf, Pf, dtf, _ = stepper.run(Uf, Pf, dt0, n_steps=n_steps)
    float(dtf)  # value-readback sync (axon early-return quirk)
    sps_list = []
    for _rep in range(_timed_reps()):
        t0 = _time.perf_counter()
        Uf, Pf, dtf, tel = stepper.run(Uf, Pf, dtf, n_steps=n_steps)
        float(dtf)
        sps_list.append(n_steps / (_time.perf_counter() - t0))
    sps = max(sps_list)
    print(
        json.dumps(
            {
                "metric": f"cavity3d_steps_per_sec@{n_dofs}dof",
                "value": round(sps, 3),
                "unit": "steps/s",
                "vs_baseline": round(sps / 50.0, 3),
                "steps_per_sec_reps": [round(s, 3) for s in sps_list],
                "backend": "box",
            }
        )
    )
    print(
        f"n_dofs={n_dofs} best_of={len(sps_list)} "
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
