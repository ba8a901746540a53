#!/usr/bin/env python
# Linear-stability probe of the discrete Schafer-Turek DFG 2D-2 base flow —
# the diagnostic testbed for the refined-mesh shedding suppression
# (BENCH_NOTES round-2 stage-2 section; VERDICT r02 item 1c).
#
# Idea: the physical base flow at Re=100 is strongly unstable (sheds), so the
# DISCRETE steady state's dominant growth rate sigma is the one-number
# characterization of each discretization variant. We measure it without any
# linearization machinery: run the nonlinear scheme twice from the steady
# base — once unperturbed (control), once with a tiny antisymmetric
# perturbation — and fit log ||U_pert(t) - U_ctrl(t)|| over time. The
# control run cancels residual base-state drift and solver slop to first
# order; eps=1e-4 in f64 stays linear over many periods.
#
# Modes:
#   base  <refine> [start_ckpt] — settle onto the discrete steady branch with
#         large-step backward Euler (BE strongly damps the oscillatory mode
#         even when it is unstable), save stab_base_r<refine>[tag].npz
#   probe <refine>              — control+perturbed BDF2 runs at fixed dt,
#         report the fitted growth rate sigma [1/s] and per-period factor
#
# Ablation knobs (env):
#   SP_SNAP=0                  refine without circle snap (same polygon as
#                              the coarse mesh — isolates geometry effects)
#   SP_DIRECT=1                direct fine mesh (lcar/2^refine, n_refine=0)
#   SP_TIGHT=1                 tight solver tolerances (slop ablation)
#   FLOW_ABLATE_BND_STRESS=1   drop the mu (grad u)^T n ds term
#   FLOW_ABLATE_DN=1           drop the directional do-nothing ds term
#   SP_DT                      probe dt (default 2.5e-3)
#   SP_STEPS                   probe steps (default 1600)
#   SP_TAG                     suffix for the base/npz filenames
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build(refine):
    import jax

    # the environment pins JAX_PLATFORMS=axon (TPU tunnel); in-process config
    # is the only override that sticks. SP_PLATFORM=axon runs on the chip.
    jax.config.update("jax_platforms", os.environ.get("SP_PLATFORM", "cpu"))
    jax.config.update("jax_enable_x64", os.environ.get("SP_X64", "1") == "1")
    # TPU einsums default to bf16 passes which stall Newton (BENCH_NOTES)
    jax.config.update("jax_default_matmul_precision", "highest")
    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from flow_tpu.models import karman

    snap = os.environ.get("SP_SNAP", "1") != "0"
    if os.environ.get("SP_DIRECT", "") == "1":
        prob = karman.schafer_turek_problem(
            lcar=0.03 / 2**refine, n_refine=0, snap=snap
        )
    else:
        prob = karman.schafer_turek_problem(lcar=0.03, n_refine=refine, snap=snap)
    print(
        f"refine={refine} snap={snap} cells={prob.mesh.n_cells} "
        f"dofs={2 * prob.V.n_dofs + prob.Q.n_dofs} Re={prob.reynolds:.1f}",
        flush=True,
    )
    return prob


def make_stepper(prob, method, tight):
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.solvers.multigrid import P1Hierarchy

    kw = dict(
        time_step_method=method,
        rotational_form=True,
        newton_tol=0.0,
        newton_rtol=1.0e-3,
        newton_maxiter=3,
        linear_rtol=1.0e-4,
        pressure_rtol=1.0e-4,
        correction_rtol=1.0e-5,
        cfl_target=1.0e9,  # fixed dt: the controller never binds below dt_max
        dt_max=1.0,
        forces_probe=prob.consistent_force_probe(),
    )
    if tight:
        # f32-achievable "tight": ~30-100x tighter than the production
        # tolerances but above the f32 round-off floor (a 1e-10 request in
        # f32 just burns maxiter every step). SP_X64=1 runs can override.
        f32 = os.environ.get("SP_X64", "1") != "1" or os.environ.get(
            "SP_PLATFORM", "cpu"
        ) == "axon"
        kw.update(
            newton_rtol=1.0e-5 if f32 else 1.0e-8,
            newton_maxiter=8,
            linear_rtol=1.0e-6 if f32 else 1.0e-8,
            pressure_rtol=3.0e-7 if f32 else 1.0e-10,
            correction_rtol=3.0e-7 if f32 else 1.0e-10,
        )
    if os.environ.get("SP_NEWTON_MAXIT"):
        kw["newton_maxiter"] = int(os.environ["SP_NEWTON_MAXIT"])
    if os.environ.get("SP_EW"):
        # probe the Eisenstat-Walker bench candidate's effect on sigma
        kw["ew_forcing"] = os.environ["SP_EW"] == "1"
    # per-substep tolerance overrides (slop-source bisection: the refine-2
    # exact step map proved the production decay is solver slop; these
    # isolate WHICH substep's inexactness damps the Hopf mode)
    for env, key in [
        ("SP_NEWTON_RTOL", "newton_rtol"),
        ("SP_LINEAR_RTOL", "linear_rtol"),
        ("SP_PRESSURE_RTOL", "pressure_rtol"),
        ("SP_CORRECTION_RTOL", "correction_rtol"),
    ]:
        if os.environ.get(env):
            kw[key] = float(os.environ[env])
    st = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu, **kw
    )
    if len(prob.mesh_hierarchy) > 1:
        hier = P1Hierarchy(
            prob.mesh_hierarchy, bc_mask=st.mask_p, smoother_degree=3
        )
        st.pressure_precond = hier.v_cycle
    return st


def tag():
    t = os.environ.get("SP_TAG", "")
    if os.environ.get("SP_SNAP", "1") == "0":
        t += "_nosnap"
    if os.environ.get("SP_DIRECT", "") == "1":
        t += "_direct"
    return t


def run_chunks(st, U, P, dt, n, chunk, on_chunk):
    import jax.numpy as jnp

    dtj = jnp.asarray(dt, dtype=U.dtype)
    done = 0
    while done < n:
        m = min(chunk, n - done)
        U, P, _, tel = st.run(U, P, dtj, n_steps=m, dt_max=dtj)
        done += m
        on_chunk(done, U, P, tel)
    return U, P


def cmd_base(refine, start=None):
    import jax.numpy as jnp

    prob = build(refine)
    st = make_stepper(prob, "backward euler", tight=os.environ.get("SP_TIGHT") == "1")
    if start and os.path.exists(start):
        d = np.load(start)
        if "U" in d:  # plain npz (a previous cmd_base output — crash resume)
            U = jnp.asarray(d["U"], dtype=prob.mesh.dtype)
            P = jnp.asarray(d["P"], dtype=prob.mesh.dtype)
        else:
            from flow_tpu.io import load_checkpoint

            arrays, _ = load_checkpoint(start, dtype=prob.mesh.dtype)
            U, P = arrays["U"], arrays["P"]
        print(f"start from {start}", flush=True)
    else:
        tol = 1.0e-8 if prob.mesh.dtype == np.float64 else 1.0e-4
        try:
            u0, p0 = prob.stokes_bootstrap(tol=tol, max_iter=4000)
            U, P = u0.vector, p0.vector
            print("start from Stokes bootstrap", flush=True)
        except RuntimeError as e:
            print(f"Stokes bootstrap failed ({e}); starting from rest", flush=True)
            U, P = prob.V.zeros(), prob.Q.zeros()

    dt = float(os.environ.get("SP_BASE_DT", "0.01"))
    n = int(os.environ.get("SP_BASE_STEPS", "3000"))
    t0 = time.time()
    prev = {"U": U}
    out = f"stab_base_r{refine}{tag()}.npz"

    def on_chunk(done, U1, P1, tel):
        dU = float(jnp.linalg.norm(U1 - prev["U"]))
        nrm = max(float(jnp.linalg.norm(U1)), 1e-300)
        cl = np.asarray(tel["forces"])[-1, 1] / prob.force_scale
        cd = np.asarray(tel["forces"])[-1, 0] / prob.force_scale
        print(
            f"  {done} steps t={done * dt:.1f}s |dU|/|U|={dU / nrm:.3e} "
            f"Cd={cd:.4f} Cl={cl:.5f} [{done / (time.time() - t0):.2f} steps/s]",
            flush=True,
        )
        prev["U"] = U1
        # crash resilience: the TPU worker can die mid-campaign (observed
        # 2026-08-18); persist progress so a retry resumes instead of
        # restarting from rest
        np.savez(out, U=np.asarray(U1), P=np.asarray(P1))

    U, P = run_chunks(
        st, U, P, dt, n,
        chunk=int(os.environ.get("SP_CHUNK", "100")), on_chunk=on_chunk,
    )
    out = f"stab_base_r{refine}{tag()}.npz"
    np.savez(out, U=np.asarray(U), P=np.asarray(P))
    print(f"saved {out}", flush=True)


def cmd_probe(refine):
    import jax.numpy as jnp
    from flow_tpu import project
    from flow_tpu.fem.bc import combine_bcs

    prob = build(refine)
    st = make_stepper(prob, "bdf2", tight=os.environ.get("SP_TIGHT") == "1")
    base = os.environ.get("SP_BASE", f"stab_base_r{refine}{tag()}.npz")
    d = np.load(base)
    U0 = jnp.asarray(d["U"], dtype=prob.mesh.dtype)
    P0 = jnp.asarray(d["P"], dtype=prob.mesh.dtype)

    # tiny antisymmetric blob downstream of the cylinder (the shedding mode's
    # symmetry), zeroed on Dirichlet rows
    eps = float(os.environ.get("SP_EPS", "1e-4"))

    def u0x(x):
        return jnp.zeros(x.shape[:-1], dtype=x.dtype)

    def u0y(x):
        r2 = ((x[..., 0] - 0.35) ** 2 + (x[..., 1] - 0.20) ** 2) / 0.05**2
        return eps * jnp.exp(-r2)

    dU = project((u0x, u0y), prob.V).vector
    mask_u, _ = combine_bcs(prob.V, prob.u_bcs)
    dU = (1.0 - mask_u) * dU

    dt = float(os.environ.get("SP_DT", "2.5e-3"))
    n = int(os.environ.get("SP_STEPS", "1600"))
    chunk = int(os.environ.get("SP_CHUNK", "50"))

    # BDF2 probe runs: carry (U, Um1, dt, dtp) manually through chunks
    def run_bdf2(U, P, label):
        Um1, dtp = U, jnp.asarray(dt, dtype=U.dtype)
        dtj = jnp.asarray(dt, dtype=U.dtype)
        traj = []
        done = 0
        t0 = time.time()
        while done < n:
            m = min(chunk, n - done)
            U, P, _, tel, (Um1, dtp) = st.run(
                U, P, dtj, n_steps=m, Um1=Um1, dtp0=dtp, dt_max=dtj
            )
            done += m
            traj.append((np.asarray(U), np.asarray(tel["forces"])))
            if done % (chunk * 4) == 0:
                print(
                    f"  [{label}] {done}/{n} steps "
                    f"[{done / (time.time() - t0):.2f} steps/s]",
                    flush=True,
                )
        return traj

    print("control run...", flush=True)
    traj_c = run_bdf2(U0, P0, "ctrl")
    print("perturbed run...", flush=True)
    traj_p = run_bdf2(U0 + dU, P0, "pert")

    ts, diffs, cls = [], [], []
    for k, ((Uc, Fc), (Up, Fp)) in enumerate(zip(traj_c, traj_p)):
        t = (k + 1) * chunk * dt
        ts.append(t)
        diffs.append(float(np.linalg.norm(Up - Uc)))
        cls.append((Fp[-1, 1] - Fc[-1, 1]) / prob.force_scale)
    ts, diffs = np.array(ts), np.array(diffs)
    d0 = float(np.linalg.norm(np.asarray(dU)))
    for t, dv, dcl in zip(ts, diffs, cls):
        print(f"  t={t:.3f}s  |dU|={dv:.6e}  dCl={dcl:+.3e}", flush=True)

    # fit sigma on the second half (skip the initial transient/projection
    # onto the dominant mode)
    half = len(ts) // 2
    good = diffs[half:] > 1e-13
    if good.sum() >= 2:
        A = np.polyfit(ts[half:][good], np.log(diffs[half:][good]), 1)
        sigma = A[0]
        T = 1.0 / 3.3  # approx shedding period [s]
        print(
            f"SIGMA = {sigma:+.3f} 1/s  (per-period factor "
            f"{np.exp(sigma * T):.3f}; |dU|0={d0:.3e})",
            flush=True,
        )
    out = f"stab_probe_r{refine}{tag()}.npz"
    np.savez(out, t=ts, diff=diffs, dcl=np.array(cls))
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    refine = int(sys.argv[2])
    if mode == "base":
        cmd_base(refine, start=sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        assert mode == "probe"
        cmd_probe(refine)
    sys.stdout.flush()
    os._exit(0)
