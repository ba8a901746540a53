# Pallas TPU stencil kernel: 27-point (3-D) / 9-point (2-D) constant-stencil
# apply on a structured vertex grid — a hand-scheduled alternative backend
# for ops/structured.StructuredLaplacian's convolution.
#
# Kernel design (see /opt/skills/guides/pallas_guide.md):
#   * the grid array stays in HBM; each program instance owns one x-plane of
#     the output and DMAs its 3-plane input window HBM -> VMEM scratch
#     (boundary planes are masked rather than specialized);
#   * in-plane +/-1 shifts are pltpu.roll with edge masking (zero padding
#     semantics, matching the conv path; the O(surface) boundary-row
#     correction is applied outside, exactly as for the conv backend);
#   * 27 fused multiply-adds per point, all VPU, no gathers.
#
# Numerically identical to lax.conv with zero padding; validated against it
# in tests/test_pallas_stencil.py (interpret mode on CPU, compiled on TPU).
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stencil_apply_3d", "stencil_apply_2d"]


def _shift2d(t, dy, dz):
    """out[j, k] = t[j+dy, k+dz] with zero fill (no wraparound)."""
    Y, Z = t.shape
    if dy != 0:
        t = pltpu.roll(t, (-dy) % Y, 0)  # pltpu.roll wants shift >= 0
        rows = jax.lax.broadcasted_iota(jnp.int32, (Y, Z), 0)
        keep = rows < Y - dy if dy > 0 else rows >= -dy
        t = jnp.where(keep, t, 0.0)
    if dz != 0:
        t = pltpu.roll(t, (-dz) % Z, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Y, Z), 1)
        keep = cols < Z - dz if dz > 0 else cols >= -dz
        t = jnp.where(keep, t, 0.0)
    return t


def _kernel(x_hbm, k_smem, y_ref, scratch, sem):
    i = pl.program_id(0)
    X = pl.num_programs(0)
    Y, Z = y_ref.shape[1], y_ref.shape[2]

    # DMA the clamped 3-plane window [max(i-1,0), ...] into scratch
    start = jnp.clip(i - 1, 0, X - 3)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(start, 3)], scratch, sem)
    dma.start()
    dma.wait()
    # window row that corresponds to plane i-1+dx: (i-1+dx) - start
    base = i - 1 - start  # 0 normally; -? clamped at edges

    acc = jnp.zeros((Y, Z), dtype=y_ref.dtype)
    for dx in (-1, 0, 1):
        row = base + dx + 1
        # plane exists iff 0 <= i+dx < X
        valid = jnp.logical_and(i + dx >= 0, i + dx < X)
        plane = jnp.where(valid, 1.0, 0.0) * scratch[jnp.clip(row, 0, 2)]
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                c = k_smem[dx + 1, dy + 1, dz + 1]
                acc = acc + c * _shift2d(plane, dy, dz)
    y_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def stencil_apply_3d(xgrid, kernel, interpret=False):
    """y[i,j,k] = sum_{d in {-1,0,1}^3} kernel[d] * x[i+d] (zero padded).

    xgrid: [X, Y, Z]; kernel: [3, 3, 3]. Grid over x-planes.
    """
    X, Y, Z = xgrid.shape
    return pl.pallas_call(
        _kernel,
        grid=(X,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM, manual DMA
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Y, Z), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), xgrid.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, Y, Z), xgrid.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xgrid, kernel)


def _kernel2d(x_hbm, k_smem, y_ref, scratch, sem):
    # y_ref blocks are [1, 1, Y]: Mosaic requires the last two block dims
    # to divide (8, 128) or equal the array dims, so a (1, Y) row block of
    # a [X, Y] array is illegal on real TPU — the singleton axis makes the
    # last-two dims exact matches.
    i = pl.program_id(0)
    X = pl.num_programs(0)
    Y = y_ref.shape[2]

    start = jnp.clip(i - 1, 0, X - 3)
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(start, 3)], scratch, sem)
    dma.start()
    dma.wait()
    base = i - 1 - start

    acc = jnp.zeros((1, Y), dtype=y_ref.dtype)
    for dx in (-1, 0, 1):
        row = base + dx + 1
        valid = jnp.logical_and(i + dx >= 0, i + dx < X)
        line = jnp.where(valid, 1.0, 0.0) * scratch[jnp.clip(row, 0, 2)]
        line = line.reshape(1, Y)
        for dy in (-1, 0, 1):
            c = k_smem[dx + 1, dy + 1]
            if True:
                t = line
                if dy != 0:
                    t = pltpu.roll(t, (-dy) % Y, 1)
                    cols = jax.lax.broadcasted_iota(jnp.int32, (1, Y), 1)
                    keep = cols < Y - dy if dy > 0 else cols >= -dy
                    t = jnp.where(keep, t, 0.0)
                acc = acc + c * t
    y_ref[0, 0, :] = acc[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def stencil_apply_2d(xgrid, kernel, interpret=False):
    """y[i,j] = sum_{d in {-1,0,1}^2} kernel[d] * x[i+d] (zero padded).

    xgrid: [X, Y]; kernel: [3, 3]."""
    X, Y = xgrid.shape
    out = pl.pallas_call(
        _kernel2d,
        grid=(X,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Y), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((X, 1, Y), xgrid.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, Y), xgrid.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xgrid, kernel)
    return out.reshape(X, Y)
