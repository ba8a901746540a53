#!/usr/bin/env python
# Window-blocked ONE-HOT gather probe (VERDICT r02 item 10, round-3 design).
#
# Prior measurements (BENCH_NOTES round 2) established that TPU gathers are
# ROW-COUNT-bound (~0.6-3e8 rows/s: each gathered row costs a serialized
# random access), and that Pallas x[idx]/take inside VMEM hits the same
# architectural bound. This probe tests the formulation that ELIMINATES the
# gather instruction entirely:
#
#   - sort rows so each block of R rows reads only a W-wide index window
#     (RCM-ordered FEM meshes have this locality; W ~ bandwidth),
#   - DMA x[w0 : w0+W] into VMEM (contiguous, full HBM bandwidth),
#   - "gather" inside the block as a compare + contract:
#         onehot[r, w] = (lidx[r] == w)          [VPU compares]
#         gathered[r]  = sum_w onehot[r, w] win[w]   [MXU/VPU contract]
#
# Per-row cost is O(W) VPU ops instead of one serialized random access;
# at W <= ~1k and the VPU's ~1e12 ops/s this crosses over far above the
# 3e8 rows/s gather engine. The probe measures the ELL-apply shape
# (row-major J=8 indices per row, banded +-64 locality) on:
#   A. XLA gather baseline (the current ELL apply)
#   B. Pallas window + one-hot contract
#   C. stream ceiling (same byte traffic, no indirection)
#
# PROBE_PLATFORM=cpu runs Pallas in interpret mode (correctness only).
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
    interpret = False
    if os.environ.get("PROBE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PROBE_PLATFORM"])
        interpret = os.environ["PROBE_PLATFORM"] == "cpu"

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = int(os.environ.get("PROBE_N", str(1024 * 1024)))  # rows
    J = 8            # indices per row (ELL width)
    R = int(os.environ.get("PROBE_R", "128"))   # rows per block
    BAND = int(os.environ.get("PROBE_BAND", "64"))  # index locality (RCM-like)
    # span per block: R-1 rows + 2*BAND offsets + up to 127 alignment loss
    W = int(os.environ.get("PROBE_W", "0")) or (
        ((R + 2 * BAND + 127 + 127) // 128) * 128
    )
    nb = n // R
    print(f"n={n} J={J} R={R} W={W} blocks={nb}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n + W), dtype=jnp.float32)  # padded
    base = np.arange(n)[:, None]
    idx = np.clip(base + rng.integers(-BAND, BAND, size=(n, J)), 0, n - 1)
    vals = jnp.asarray(rng.standard_normal((n, J)), dtype=jnp.float32)

    # per-block 128-aligned window starts + block-local indices
    idx_blk = idx.reshape(nb, R * J)
    w0 = (idx_blk.min(axis=1) // 128) * 128
    assert int((idx_blk.max(axis=1) - w0).max()) < W, "window overflow"
    lidx = jnp.asarray(idx_blk - w0[:, None], dtype=jnp.int32).reshape(nb, R, J)
    w0 = jnp.asarray(w0, dtype=jnp.int32)
    idx = jnp.asarray(idx, dtype=jnp.int32)

    def timeit(f, *a, reps=30):
        o = f(*a)
        o.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*a)
        o.block_until_ready()
        return (time.perf_counter() - t0) / reps

    # ---- A. XLA gather baseline (ELLMatrix.apply shape) ----
    @jax.jit
    def xla_ell(xv, iv, vv):
        return jnp.einsum("nk,nk->n", vv, xv[iv])

    t_xla = timeit(xla_ell, x, idx, vals)
    rows_s = n * J / t_xla
    print(f"A XLA gather      : {t_xla*1e3:8.3f} ms "
          f"({rows_s/1e6:.0f} M gathered-rows/s)", flush=True)

    # ---- B. Pallas window one-hot ----
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, R, J), lambda b, w0r: (b, 0, 0)),
            pl.BlockSpec((1, R, J), lambda b, w0r: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, R), lambda b, w0r: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((W,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel_wrap(w0_ref, lidx_ref, vals_ref, x_hbm, out_ref, win, sem):
        # block shapes arrive with the leading grid axis; drop it
        b = pl.program_id(0)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(w0_ref[b], W)], win, sem)
        cp.start()
        cp.wait()
        li = lidx_ref[0].reshape(R * J)
        # one-hot contract (VPU-explicit: compare, mask-multiply, reduce)
        oh = li[:, None] == jax.lax.broadcasted_iota(jnp.int32, (R * J, W), 1)
        g = jnp.sum(
            jnp.where(oh, win[...][None, :], 0.0), axis=1
        )
        out_ref[0] = jnp.sum(vals_ref[0] * g.reshape(R, J), axis=1)

    @jax.jit
    def pallas_onehot(w0v, lv, vv, xv):
        return pl.pallas_call(
            kernel_wrap,
            out_shape=jax.ShapeDtypeStruct((nb, R), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(w0v, lv, vv.reshape(nb, R, J), xv)

    try:
        out_b = pallas_onehot(w0, lidx, vals, x)
        ref = xla_ell(x, idx, vals).reshape(nb, R)
        ok = bool(jnp.allclose(out_b, ref, atol=1e-4, rtol=1e-4))
        t_b = timeit(pallas_onehot, w0, lidx, vals, x)
        print(f"B Pallas one-hot  : {t_b*1e3:8.3f} ms "
              f"({n*J/t_b/1e6:.0f} M rows/s-equiv) correct={ok} "
              f"speedup={t_xla/t_b:.2f}x", flush=True)
    except Exception as e:
        print(f"B Pallas one-hot  : FAILED: {type(e).__name__}: "
              f"{str(e)[:400]}", flush=True)

    # ---- B2. two-level one-hot (the O(W) contract on the MXU) ----
    # idx = hi*B2 + lo: rowsel = onehot_hi[RJ, A2] @ win2d[A2, B2]  (MXU),
    # out[r] = sum_b (lo[r]==b) rowsel[r, b]                        (VPU).
    # Per-row VPU cost A2 + B2 ~ 2 sqrt(W) instead of W — this is the
    # variant that stays cheap at the real-mesh window widths W ~ O(sqrt n)
    # (measured: 6-13k at 1.9M-10M dofs).
    B2 = 128
    A2 = W // B2 if W % B2 == 0 else None
    if A2:
        def kernel_two(w0_ref, lidx_ref, vals_ref, x_hbm, out_ref, win, sem):
            b = pl.program_id(0)
            cp = pltpu.make_async_copy(x_hbm.at[pl.ds(w0_ref[b], W)], win, sem)
            cp.start()
            cp.wait()
            li = lidx_ref[0].reshape(R * J)
            hi = li // B2
            lo = li - hi * B2
            oh_hi = (
                hi[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (R * J, A2), 1)
            ).astype(jnp.float32)
            win2d = win[...].reshape(A2, B2)
            rowsel = jnp.dot(
                oh_hi, win2d, preferred_element_type=jnp.float32
            )  # [RJ, B2] on the MXU
            oh_lo = lo[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (R * J, B2), 1
            )
            g = jnp.sum(jnp.where(oh_lo, rowsel, 0.0), axis=1)
            out_ref[0] = jnp.sum(vals_ref[0] * g.reshape(R, J), axis=1)

        @jax.jit
        def pallas_two(w0v, lv, vv, xv):
            return pl.pallas_call(
                kernel_two,
                out_shape=jax.ShapeDtypeStruct((nb, R), jnp.float32),
                grid_spec=grid_spec,
                interpret=interpret,
            )(w0v, lv, vv.reshape(nb, R, J), xv)

        try:
            out_c = pallas_two(w0, lidx, vals, x)
            ref = xla_ell(x, idx, vals).reshape(nb, R)
            ok = bool(jnp.allclose(out_c, ref, atol=1e-4, rtol=1e-4))
            t_c = timeit(pallas_two, w0, lidx, vals, x)
            print(f"B2 two-level MXU  : {t_c*1e3:8.3f} ms "
                  f"({n*J/t_c/1e6:.0f} M rows/s-equiv) correct={ok} "
                  f"speedup={t_xla/t_c:.2f}x", flush=True)
        except Exception as e:
            print(f"B2 two-level MXU  : FAILED: {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)

    # ---- C. stream ceiling ----
    @jax.jit
    def stream(vv):
        return jnp.sum(vv, axis=1)

    t_s = timeit(stream, vals)
    print(f"C stream ceiling  : {t_s*1e3:8.3f} ms "
          f"({(n*J*4+n*4)/t_s/1e9:.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
