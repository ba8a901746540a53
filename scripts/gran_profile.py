# Granular-mode dispatch profiler: decompose the measured ~3x
# granular-vs-fused tax at >=7.6M DoF (BENCH_NOTES chain-17) into fixed
# per-execution cost vs real compute.
#
# Measures, at the bench karman configuration (BENCH_LCAR/BENCH_REFINES):
#   t_noop     — a trivial hoisted execution (x + 0.0 on the packed state):
#                the tunnel/dispatch floor per execution
#   t_matvec   — one EMA lagged tangent matvec (the granular Krylov unit)
#   t_sweep    — one full granular Newton sweep (tangent build +
#                kry_maxiter Krylov + residual)
#   t_pressure — the granular pressure solve execution
#   t_corr     — the granular correction solve execution
# Prints one JSON line. Timing synchronizes via value readback (the
# tunnel's block_until_ready returns early on queued chains).
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as _bench  # noqa: E402 (reuse jax setup + builder)

_bench._setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(fn, n=5):
    # warmup (compile) then n timed reps, each synchronized by readback
    out = fn()
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        out = fn()
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / len(ts)


def main():
    lcar = float(os.environ.get("BENCH_LCAR", "0.02"))
    refines = int(os.environ.get("BENCH_REFINES", "6"))
    prob, st = _bench._build(lcar, refines)
    n_dofs = 2 * prob.V.n_dofs + prob.Q.n_dofs
    print(f"n_dofs={n_dofs} packed={st.packed}", file=sys.stderr)

    from flow_tpu.utils.hostsetup import setup_on_cpu

    with setup_on_cpu():
        import numpy as np

        rng = np.random.default_rng(3)
        if st.packed:
            x = jnp.asarray(rng.standard_normal(2 * prob.V.n_dofs),
                            dtype=jnp.float32)
        else:
            x = jnp.asarray(rng.standard_normal((prob.V.n_dofs, 2)),
                            dtype=jnp.float32)
        P = jnp.asarray(rng.standard_normal(prob.Q.n_dofs) * 1e-2,
                        dtype=jnp.float32)
    x = jax.device_put(x)
    P = jax.device_put(P)
    dt = jnp.asarray(1.0e-3, dtype=jnp.float32)
    res = {"n_dofs": n_dofs}

    # 1) dispatch floor
    noop = st._gran_cached("prof_noop", lambda z: z + 0.0, x)
    res["t_noop_min"], res["t_noop_avg"] = timed(
        lambda: st._gran_cached("prof_noop", lambda z: z + 0.0, x)
    )

    # 2) one tangent matvec (packed EMA if active, else dense)
    if st.packed and st._lagged_ema:
        def mv(z, xf, dtv):
            Jv = st._ema_Jv_pk(xf, dtv, 1.0 - st.mask_uf)
            return Jv(z)
        res["t_matvec_min"], res["t_matvec_avg"] = timed(
            lambda: st._gran_cached("prof_mv", mv, x, x, dt)
        )

    # 3) full granular newton sweep
    km = int(os.environ.get("PROF_KRY_MAXITER", "10"))
    if st.packed:
        def sweep(z, Uf, Pf, dtv):
            return st._gran_newton_iter_pk(z, Uf, Pf, dtv, km)
        res["t_sweep_min"], res["t_sweep_avg"] = timed(
            lambda: st._gran_cached(f"prof_sweep{km}", sweep, x, x, P, dt)
        )

        # 3b) linfast decomposition: one-time setup (EMA tensor + true
        # residual by quadrature) vs a pure Krylov segment
        if st._gran_fast_ok:
            res["t_lf_setup_min"], res["t_lf_setup_avg"] = timed(
                lambda: st._gran_cached(
                    "prof_lfset",
                    lambda Uf, Pf, dtv: st._gran_lagged_setup_pk(
                        Uf, Pf, dtv
                    ), x, P, dt,
                )
            )
            r0, rn0, S = st._gran_cached(
                "prof_lfset",
                lambda Uf, Pf, dtv: st._gran_lagged_setup_pk(Uf, Pf, dtv),
                x, P, dt,
            )
            res["t_lf_seg_min"], res["t_lf_seg_avg"] = timed(
                lambda: st._gran_cached(
                    f"prof_lfseg{km}",
                    lambda z, r, Sv, Uf, dtv: st._gran_lagged_segment_pk(
                        z, r, Sv, Uf, dtv, km
                    ), x, r0, S, x, dt,
                )
            )

        # 4) pressure + correction executions
        res["t_pressure_min"], res["t_pressure_avg"] = timed(
            lambda: st._gran_cached(
                "prof_prs", lambda U, Pf, dtv: st._pressure_solve_pk(
                    U, Pf, dtv
                ), x, P, dt,
            )
        )
        res["t_corr_min"], res["t_corr_avg"] = timed(
            lambda: st._gran_cached(
                "prof_cor", lambda U, P1, Pf, dtv: st._correction_pk(
                    U, P1, Pf, dtv
                ), x, P, P, dt,
            )
        )

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in res.items()}))
    os._exit(0)


if __name__ == "__main__":
    main()
