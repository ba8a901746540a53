#!/usr/bin/env python
# Feasibility probe: Pallas/Mosaic dynamic-gather support + throughput, vs
# XLA's gather lowering — the decision data for a Pallas ELL/dof-sum kernel
# (SURVEY §7 hard part #1; ROADMAP item 8 blamed Mosaic's missing vectorized
# dynamic gathers — this records the current state either way).
#
# Three candidate within-kernel gather formulations over a VMEM-resident
# table x [n] with indices idx [R, W]:
#   A. direct advanced indexing x[idx]  (vectorized dynamic gather)
#   B. jnp.take(x, idx, axis=0)
#   C. one-hot contraction fallback (iota == idx) — always compiles, O(n*R)
# plus the XLA baseline gather on the same shapes.
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    if os.environ.get("PROBE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PROBE_PLATFORM"])

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = int(os.environ.get("PROBE_N", str(128 * 1024)))  # table rows
    W = 8  # ELL width
    R = n  # one output row per table row (ELL apply shape)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    # banded indices (RCM-like locality): within +-64 of the row
    base = np.arange(R)[:, None]
    idx = np.clip(base + rng.integers(-64, 64, size=(R, W)), 0, n - 1)
    idx = jnp.asarray(idx, dtype=jnp.int32)
    vals = jnp.asarray(rng.standard_normal((R, W)), dtype=jnp.float32)

    def timeit(f, *a, reps=50):
        o = f(*a)
        o.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*a)
        o.block_until_ready()
        return (time.perf_counter() - t0) / reps

    # ---- XLA baseline: the current ELLMatrix.apply shape ----
    @jax.jit
    def xla_ell(xv, iv, vv):
        return jnp.einsum("nk,nk->n", vv, xv[iv])

    t_xla = timeit(xla_ell, x, idx, vals)
    bytes_moved = R * W * 8 + n * 4 + R * 4  # idx+vals reads, x, out
    print(f"XLA gather+contract : {t_xla*1e3:8.3f} ms "
          f"({bytes_moved/t_xla/1e9:.1f} GB/s effective)", flush=True)

    # ---- Pallas variants ----
    TILE = 2048

    def make_kernel(gather_fn):
        def kernel(idx_ref, vals_ref, x_ref, out_ref):
            out_ref[:] = jnp.sum(
                vals_ref[:] * gather_fn(x_ref[:], idx_ref[:]), axis=1
            )

        @jax.jit
        def run(xv, iv, vv):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
                grid=(R // TILE,),
                in_specs=[
                    pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, W), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
            )(iv, vv, xv)

        return run

    for name, fn in [
        ("A: x[idx]", lambda xv, iv: xv[iv]),
        ("B: jnp.take", lambda xv, iv: jnp.take(xv, iv, axis=0)),
    ]:
        try:
            run = make_kernel(fn)
            t = timeit(run, x, idx, vals)
            ok = jnp.allclose(run(x, idx, vals), xla_ell(x, idx, vals),
                              atol=1e-5)
            print(f"Pallas {name:12s}: {t*1e3:8.3f} ms "
                  f"({bytes_moved/t/1e9:.1f} GB/s) correct={bool(ok)}",
                  flush=True)
        except Exception as e:
            print(f"Pallas {name:12s}: FAILED TO COMPILE/RUN: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)

    # raw gather-free ceiling: same traffic without the indirection
    @jax.jit
    def stream(vv):
        return jnp.sum(vv, axis=1)

    t_s = timeit(stream, vals)
    print(f"stream ceiling      : {t_s*1e3:8.3f} ms "
          f"({(R*W*4+R*4)/t_s/1e9:.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
