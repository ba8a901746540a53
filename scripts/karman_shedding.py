#!/usr/bin/env python
# Long Karman vortex-shedding run: drives the fused fast path until the
# wake sheds, then extracts drag/lift coefficients and the Strouhal number
# (the physics half of the BASELINE north-star metric).
#
# Usage: python scripts/karman_shedding.py [n_steps] [n_refine]
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

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_refine = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    dt_max = float(sys.argv[3]) if len(sys.argv) > 3 else 0.04
    mu = float(sys.argv[4]) if len(sys.argv) > 4 else 0.002

    from flow_tpu.models import karman

    t0 = time.time()
    out = karman.run_karman_fast(
        num_steps=n_steps,
        lcar=0.02,
        n_refine=n_refine,
        mu=mu,
        dt0=1.0e-4,
        dt_max=dt_max,
        chunk_size=int(os.environ.get("SHED_CHUNK", "100")),
        progress=True,
    )
    elapsed = time.time() - t0

    t = out["t"]
    fx = out["forces"][:, 0]
    fy = out["forces"][:, 1]
    prob = out["problem"]
    scale = 0.5 * prob.rho * 0.01**2 * 0.04

    # use the last 60% of the series (settled shedding)
    k0 = int(0.4 * len(t))
    cd = fx[k0:] / scale
    cl = fy[k0:] / scale
    st = karman.strouhal_number(t[k0:], fy[k0:])

    print(f"steps={n_steps} refine={n_refine} mu={mu} t_end={t[-1]:.2f}s wall={elapsed:.1f}s "
          f"({n_steps/elapsed:.2f} steps/s)")
    print(f"Cd mean={cd.mean():.4f} (osc +/- {cd.std():.4f})")
    print(f"Cl mean={cl.mean():.4f} amplitude~{np.abs(cl - cl.mean()).max():.4f}")
    print(f"Strouhal: {st}")
    np.savez(
        "karman_shedding.npz",
        t=t, fx=fx, fy=fy, dt=out["telemetry"]["dt"],
    )


if __name__ == "__main__":
    main()
