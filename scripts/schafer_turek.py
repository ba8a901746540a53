#!/usr/bin/env python
# DFG 2D-2 benchmark (Schaefer & Turek 1996): cylinder in a channel at
# Re=100 with an unsteady wake. Published targets: St ~ 0.300,
# Cd_max ~ 3.22-3.24, Cl amplitude ~ +-1.0. This is the quantitative
# physics validation of the drag/lift/Strouhal probes (the reference's own
# Karman geometry is too confined to shed at its parameters).
#
# Usage: python scripts/schafer_turek.py [n_steps] [lcar] [n_refine] [dt_max]
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    # the axon plugin ignores JAX_PLATFORMS env; in-process config is the
    # only way to force CPU (smoke tests)
    if os.environ.get("ST_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["ST_PLATFORM"])

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    lcar = float(sys.argv[2]) if len(sys.argv) > 2 else 0.03
    n_refine = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    dt_max = float(sys.argv[4]) if len(sys.argv) > 4 else 4.0e-3

    from flow_tpu.models import karman

    prob = karman.schafer_turek_problem(lcar=lcar, n_refine=n_refine)
    print(
        f"Re={prob.reynolds:.1f}  cells={prob.mesh.n_cells}  "
        f"dofs={2 * prob.V.n_dofs + prob.Q.n_dofs}",
        flush=True,
    )

    # antisymmetric vortex-blob perturbation downstream of the cylinder:
    # seeds the unstable shedding mode (a symmetric impulsive start stays on
    # the unstable steady branch for ~20+ s otherwise)
    import jax.numpy as jnp
    from flow_tpu import project

    amp = float(os.environ.get("ST_PERTURB", "0.4"))

    def u0x(x):
        return jnp.zeros(x.shape[:-1], dtype=x.dtype)

    def u0y(x):
        r2 = ((x[..., 0] - 0.35) ** 2 + (x[..., 1] - 0.20) ** 2) / 0.05**2
        return amp * jnp.exp(-r2)

    U0 = project((u0x, u0y), prob.V).vector
    # zero the Dirichlet rows so the perturbation respects the BCs
    from flow_tpu.fem.bc import combine_bcs

    mask_u, val_u = combine_bcs(prob.V, prob.u_bcs)
    U0 = (1.0 - mask_u) * U0

    ckpt = os.environ.get("ST_CKPT", "st_ckpt.npz")
    resume = os.environ.get("ST_RESUME", "") == "1"
    # BDF2 default: second-order with only mild damping at backward-Euler
    # per-step cost — the integrator that lets shedding onset develop
    # (first-order BE at these step sizes damps the instability; CN is ~4x
    # slower per step on TPU)
    method = os.environ.get("ST_METHOD", "bdf2")

    initial_state = (U0, prob.Q.zeros())
    dt0 = 1.0e-4

    # seed from a coarser-refinement checkpoint: prolong the developed state
    # up the refine_uniform hierarchy (fem/transfer.py) — onset is developed
    # cheaply at low resolution, measured at high resolution
    seed = os.environ.get("ST_SEED_CKPT", "")
    if seed and os.path.exists(seed):
        from flow_tpu.io import load_checkpoint
        from flow_tpu.fem.spaces import VectorFunctionSpace, FunctionSpace
        from flow_tpu.fem.transfer import prolong_vector, restrict_vector

        lvl = int(os.environ.get("ST_SEED_REFINE", str(n_refine - 1)))
        arrays, scalars = load_checkpoint(seed, dtype=U0.dtype)
        Us, Ps = arrays["U"], arrays["P"]
        dt0 = min(float(scalars["dt"]), dt_max)
        # prolong a coarser seed up, or restrict (injection) a finer seed
        # down the refine_uniform hierarchy — e.g. re-deriving a stage-2
        # measurement from the stage-3 saturated checkpoint
        hier_top = max(lvl, n_refine)
        if hier_top > n_refine:
            from flow_tpu.models import karman as _karman

            hier = _karman.schafer_turek_problem(
                lcar=lcar, n_refine=hier_top
            ).mesh_hierarchy
        else:
            hier = prob.mesh_hierarchy
        for k in range(lvl, n_refine):
            mc, mf = hier[k], hier[k + 1]
            Vc, Vf = VectorFunctionSpace(mc, 2), VectorFunctionSpace(mf, 2)
            Qc, Qf = FunctionSpace(mc, 1), FunctionSpace(mf, 1)
            Us = prolong_vector(Us, Vc, Vf)
            Ps = prolong_vector(Ps, Qc, Qf)
        for k in range(lvl, n_refine, -1):
            mc, mf = hier[k - 1], hier[k]
            Vc, Vf = VectorFunctionSpace(mc, 2), VectorFunctionSpace(mf, 2)
            Qc, Qf = FunctionSpace(mc, 1), FunctionSpace(mf, 1)
            Us = restrict_vector(Us, Vf, Vc)
            Ps = restrict_vector(Ps, Qf, Qc)
        mask_s, val_s = combine_bcs(prob.V, prob.u_bcs)
        Us = (1.0 - mask_s) * Us + mask_s * val_s  # re-impose fine BCs
        initial_state = (Us, Ps)
        print(f"seeded from {seed} (refine {lvl} -> {n_refine})", flush=True)
    elif resume and os.path.exists(ckpt):
        # restart from the checkpointed state; ST_REPERTURB=1 re-seeds the
        # antisymmetric mode on top of it (useful after a steady-branch run)
        from flow_tpu.io import load_checkpoint

        arrays, scalars = load_checkpoint(ckpt, dtype=U0.dtype)
        Ur, Pr = arrays["U"], arrays["P"]
        dt0 = min(float(scalars["dt"]), dt_max)
        if os.environ.get("ST_REPERTURB", "") == "1":
            Ur = Ur + U0  # U0 already zeroed on Dirichlet rows
        initial_state = (Ur, Pr)

    # solver tolerances: the refine-2 exact step map (BENCH_NOTES round 3)
    # proved the production set damps the Hopf mode by ~4.7/s — more than
    # its +2.57/s growth — so validation campaigns must run tighter.
    # ST_TOL=tight selects the f32-achievable tight set; individual env
    # overrides (ST_NEWTON_RTOL etc.) refine the slop/cost trade.
    tol_kw = {}
    if os.environ.get("ST_TOL", "") == "tight":
        tol_kw = dict(
            newton_rtol=1.0e-5, newton_maxiter=8, linear_rtol=1.0e-6,
            pressure_rtol=3.0e-7, correction_rtol=3.0e-7,
        )
    for env, key in [
        ("ST_NEWTON_RTOL", "newton_rtol"),
        ("ST_LINEAR_RTOL", "linear_rtol"),
        ("ST_PRESSURE_RTOL", "pressure_rtol"),
        ("ST_CORRECTION_RTOL", "correction_rtol"),
    ]:
        if os.environ.get(env):
            tol_kw[key] = float(os.environ[env])
    if os.environ.get("ST_NEWTON_MAXIT"):
        tol_kw["newton_maxiter"] = int(os.environ["ST_NEWTON_MAXIT"])
    if os.environ.get("ST_EW"):
        # Eisenstat-Walker adaptive inner forcing (perf-candidate physics
        # validation: the bench knob BENCH_EW must not damp the Hopf mode)
        tol_kw["ew_forcing"] = os.environ["ST_EW"] == "1"
    if os.environ.get("ST_CONVECTION"):
        # semi-implicit (lagged/extrapolated) convection — the bench knob
        # BENCH_CONVECTION=lagged must reproduce the limit cycle before it
        # can become a bench default
        tol_kw["convection"] = os.environ["ST_CONVECTION"]
    if os.environ.get("ST_BACKEND"):
        # ST_BACKEND=packed: the round-4 lane-packed patch stepper — the
        # physics guard for adopting it as the bench default (same
        # protocol as the lagged/gmres adoptions: reproduce the stage-2
        # limit cycle before any default flip)
        tol_kw["backend"] = os.environ["ST_BACKEND"]
        if tol_kw["backend"] == "packed":
            tol_kw["convection"] = "lagged"

    t0 = time.time()
    out = karman.run_karman_fast(
        num_steps=n_steps,
        dt0=dt0,
        dt_max=dt_max,
        problem=prob,
        chunk_size=int(os.environ.get("SHED_CHUNK", "25")),
        progress=True,
        initial_state=initial_state,
        checkpoint_path=ckpt,
        resume=False,
        time_step_method=method,
        **tol_kw,
    )
    elapsed = time.time() - t0

    t = out["t"]
    fx = out["forces"][:, 0]
    fy = out["forces"][:, 1]
    scale = prob.force_scale

    k0 = int(0.5 * len(t))  # settled half
    cd = fx[k0:] / scale
    cl = fy[k0:] / scale
    st_dfg = karman.strouhal_number(
        t[k0:], fy[k0:], diameter=prob.diameter, u_ref=prob.u_ref
    )
    f_shed = (st_dfg or 0.0) * prob.u_ref / prob.diameter

    print(
        f"steps={n_steps} t_end={t[-1]:.2f}s wall={elapsed:.1f}s "
        f"({n_steps / elapsed:.2f} steps/s)"
    )
    print(f"Cd max={cd.max():.4f} mean={cd.mean():.4f}")
    print(f"Cl max={cl.max():.4f} min={cl.min():.4f}")
    print(f"shedding f={f_shed:.4f} Hz  St={st_dfg}")
    # ST_OUT names the series file per campaign — the default path once cost
    # us a stage-2 series when stage-3 reused it before the commit
    out_path = os.environ.get("ST_OUT", "schafer_turek.npz")
    np.savez(out_path, t=t, fx=fx, fy=fy, dt=out["telemetry"]["dt"])


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    # the axon TPU tunnel leaves non-daemon threads that block interpreter
    # exit; the run is done — leave decisively
    os._exit(0)
