# Gather-free window-blocked Pallas operator kernels.
#
# Built on fem/window.py's uniform-stride layout: per block, ONE contiguous
# DMA brings the dof window into VMEM; the cell-dof "gather" and the
# transpose "scatter" are two-level one-hot contracts whose O(W) part runs
# on the MXU (see scripts/onehot_window_probe.py):
#
#   gather:  li = hi*128 + lo
#            rowsel = onehot(hi) @ win2d          [C, 128]     (MXU)
#            u_j[c] = sum_b onehot_lo[c,b] rowsel[c,b]         (VPU)
#   scatter: masked = loc_i[c,None] * onehot_lo               (VPU)
#            win2d += onehot(hi)^T-contract masked             (MXU)
#
# No gather/scatter instruction appears anywhere: the row-count-bound
# gather engine (0.6-3e8 rows/s, the measured wall of every FEM hot path,
# BENCH_NOTES round 2) is bypassed entirely. Output windows overlap-add
# into the result by W/S shifted contiguous adds (window.py).
#
# Mosaic shape discipline (learned on the first real-TPU run; interpret
# mode checks none of this):
#   - the last two dims of every block must divide (8, 128) or equal the
#     array dims -> per-block tables carry the blocked axis FIRST and the
#     full (rows, C) extent in the last two dims;
#   - arbitrary reshapes ((C, NL) <-> (C*NL,)) are unsupported shape casts
#     -> the kernels unroll the tiny local-dof axis in Python and work on
#     [C] lane vectors throughout;
#   - windows are DMA'd as 2-D row slabs ([W/128, 128] from the [n/128,
#     128] view of the state) so no 1-D->2-D reshape is needed in-kernel;
#   - small reference tensors (Mref, Kref) live in SMEM and are read as
#     scalars.
#
# v1 kernel: the consistent-mass apply (the velocity-correction operator,
# /root/reference/flow/navier_stokes/pressure_correction.py:448-449's
# (u, v) term). Equivalence vs assembly.mass_apply is pinned in
# tests/test_winkernel.py; interpret=True runs on CPU.
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fem import assembly
from .window import build_window_layout

__all__ = ["WindowMassOperator", "WindowStiffnessOperator"]

_LO = 128  # two-level one-hot low radix (= lane width)

# The unrolled kernel bodies hold many [C]-lane temporaries live at once;
# at default Mosaic scoped-vmem (16 MB) the momentum kernel overflowed by
# ~5% on a real v5e (BENCH_NOTES r3 chain-3). Explicit blocks/scratch are
# tiny (KBs), so raising the scoped budget is safe; v5e VMEM is 128 MB.
_VMEM_LIMIT_BYTES = (
    int(os.environ.get("FLOW_VMEM_LIMIT_MB", "100")) * 1024 * 1024
)


def compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _onehots(lidx_ref, j, C, A2):
    """One-hot factors of window-local dof j of every cell: [C, A2] f32
    (high radix, MXU side) and [C, 128] bool (lane side)."""
    li = lidx_ref[0, j]
    hi = li // _LO
    lo = li - hi * _LO
    oh_hi = (
        hi[:, None] == jax.lax.broadcasted_iota(jnp.int32, (C, A2), 1)
    ).astype(jnp.float32)
    oh_lo = lo[:, None] == jax.lax.broadcasted_iota(jnp.int32, (C, _LO), 1)
    return oh_hi, oh_lo


def _gather_dof(win2d, oh_hi, oh_lo):
    # HIGHEST precision is load-bearing: a single bf16 MXU pass would
    # TRUNCATE the gathered window values (the one-hot contract must be an
    # exact selection), independent of the global matmul-precision config.
    rowsel = jnp.dot(
        oh_hi, win2d, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sum(jnp.where(oh_lo, rowsel, 0.0), axis=1)  # [C]


def _scatter_dof(acc, loc, oh_hi, oh_lo):
    masked = jnp.where(oh_lo, loc[:, None], 0.0)  # [C, 128]
    return acc + jax.lax.dot_general(
        oh_hi, masked, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [A2, 128]


def _mass_kernel(lidx_ref, valid_ref, detj_ref, mref_smem, x_hbm, out_ref,
                 win2d, sem, *, S, W, C, NL):
    b = pl.program_id(0)
    rS, A2 = S // _LO, W // _LO
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(b * rS, A2)], win2d, sem)
    cp.start()
    cp.wait()
    win = win2d[...]

    ohs = [_onehots(lidx_ref, j, C, A2) for j in range(NL)]
    u = [_gather_dof(win, oh, ol) for oh, ol in ohs]

    s = detj_ref[0, 0] * valid_ref[0, 0]  # [C]
    acc = jnp.zeros((A2, _LO), dtype=jnp.float32)
    for i in range(NL):
        loc = s * sum(mref_smem[i, j] * u[j] for j in range(NL))
        acc = _scatter_dof(acc, loc, *ohs[i])
    out_ref[0] = acc


class WindowMassOperator:
    """Gather-free consistent-mass apply on a scalar FunctionSpace.

    apply(x) computes (in the ORIGINAL dof numbering) the same vector as
    assembly.mass_apply(space, geom, x) for scalar x [n], via the window
    kernel. Vector states apply per component.
    """

    def __init__(self, space, S=None, interpret=False):
        self.space = space
        wl = build_window_layout(space, S=S)
        self.wl = wl
        self.interpret = interpret
        geom = assembly.geometry(space.mesh)
        mref = np.asarray(
            assembly.ref_mass(space.degree, assembly._dim(space))
        )
        detj = np.asarray(geom.detJ)[np.asarray(wl.cells, dtype=np.int64)]
        # kernel runs f32 (Mosaic has no f64); callers cast at the boundary.
        # Per-block [nb, C] tables carry a singleton sublane axis so block
        # (1, 1, C) matches the array's last-two dims exactly.
        self.detj = jnp.asarray(detj, dtype=jnp.float32)[:, None, :]
        self.mref = jnp.asarray(mref, dtype=jnp.float32)
        # [nb, NL, C]: local-dof rows are sublane picks in-kernel
        self.lidx = jnp.asarray(np.transpose(np.asarray(wl.lidx), (0, 2, 1)))
        self.valid = jnp.asarray(wl.valid, dtype=jnp.float32)[:, None, :]
        self.perm = jnp.asarray(wl.perm.astype(np.int32))
        self.inv = jnp.asarray(wl.inv.astype(np.int32))
        self._call = jax.jit(self._apply_impl)

    def _pallas(self, xw_pad):
        wl = self.wl
        C, NL = wl.C, self.lidx.shape[1]
        A2 = wl.W // _LO
        kern = functools.partial(
            _mass_kernel, S=wl.S, W=wl.W, C=C, NL=NL
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(wl.nb,),
            in_specs=[
                pl.BlockSpec((1, NL, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, A2, _LO), lambda b: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((A2, _LO), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((wl.nb, A2, _LO), jnp.float32),
            grid_spec=grid_spec,
            interpret=self.interpret,
            compiler_params=compiler_params(),
        )(
            self.lidx, self.valid, self.detj, self.mref,
            xw_pad.reshape(-1, _LO),
        )
        return out.reshape(wl.nb, wl.W)

    def _apply_impl(self, x):
        wl = self.wl
        xw = x[self.perm]
        xw_pad = jnp.concatenate(
            [xw, jnp.zeros(wl.n_pad - wl.n, dtype=x.dtype)]
        )
        wins = self._pallas(xw_pad.astype(jnp.float32))
        yw = wl.overlap_add(wins, jnp)
        return yw.astype(x.dtype)[self.inv]

    def apply(self, x):
        return self._call(x)


def _stiff_kernel(lidx_ref, valid_ref, cg_ref, kref_smem, x_hbm, out_ref,
                  win2d, sem, *, S, W, C, NL, DIM):
    b = pl.program_id(0)
    rS, A2 = S // _LO, W // _LO
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(b * rS, A2)], win2d, sem)
    cp.start()
    cp.wait()
    win = win2d[...]

    ohs = [_onehots(lidx_ref, j, C, A2) for j in range(NL)]
    u = [_gather_dof(win, oh, ol) for oh, ol in ohs]

    v = valid_ref[0, 0]  # [C]
    acc = jnp.zeros((A2, _LO), dtype=jnp.float32)
    for i in range(NL):
        loc = None
        for k in range(DIM):
            for l in range(DIM):
                # scalar stiffness: sum_kl Cg[c,k,l] K[k,l,i,j] u_j[c]
                s = sum(
                    kref_smem[(DIM * k + l) * NL + i, j] * u[j]
                    for j in range(NL)
                )
                t = cg_ref[0, DIM * k + l] * s
                loc = t if loc is None else loc + t
        acc = _scatter_dof(acc, loc * v, *ohs[i])
    out_ref[0] = acc


class WindowStiffnessOperator:
    """Gather-free scalar stiffness apply (the pressure-Poisson / MG-level
    operator: K x with K = int grad(u).grad(v))."""

    def __init__(self, space, S=None, interpret=False):
        from ..fem.forms import ref_stiffness

        self.space = space
        wl = build_window_layout(space, S=S)
        self.wl = wl
        self.interpret = interpret
        geom = assembly.geometry(space.mesh)
        cells = np.asarray(wl.cells, dtype=np.int64)
        dim = assembly._dim(space)
        self.dim = dim
        # [nb, dim^2, C] with row dim*k+l: geometry picks are sublane rows
        cg = np.asarray(geom.C)[cells]  # [nb, C, dim, dim]
        self.Cg = jnp.asarray(
            np.transpose(cg, (0, 2, 3, 1)).reshape(cg.shape[0], dim * dim, -1),
            dtype=jnp.float32,
        )
        kref = np.asarray(ref_stiffness(space.degree, dim), dtype=np.float32)
        nl = kref.shape[-1]
        # [(dim*k+l)*NL + i, j] scalar table in SMEM
        self.kref = jnp.asarray(kref.reshape(dim * dim * nl, nl))
        self.lidx = jnp.asarray(np.transpose(np.asarray(wl.lidx), (0, 2, 1)))
        self.valid = jnp.asarray(wl.valid, dtype=jnp.float32)[:, None, :]
        self.perm = jnp.asarray(wl.perm.astype(np.int32))
        self.inv = jnp.asarray(wl.inv.astype(np.int32))
        self._call = jax.jit(self._apply_impl)

    def _pallas(self, xw_pad):
        wl = self.wl
        C, NL = wl.C, self.lidx.shape[1]
        A2 = wl.W // _LO
        d2 = self.dim * self.dim
        kern = functools.partial(
            _stiff_kernel, S=wl.S, W=wl.W, C=C, NL=NL, DIM=self.dim
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(wl.nb,),
            in_specs=[
                pl.BlockSpec((1, NL, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, d2, C), lambda b: (b, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, A2, _LO), lambda b: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((A2, _LO), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((wl.nb, A2, _LO), jnp.float32),
            grid_spec=grid_spec,
            interpret=self.interpret,
            compiler_params=compiler_params(),
        )(
            self.lidx, self.valid, self.Cg, self.kref,
            xw_pad.reshape(-1, _LO),
        )
        return out.reshape(wl.nb, wl.W)

    def _apply_impl(self, x):
        wl = self.wl
        xw = x.astype(jnp.float32)[self.perm]
        xw_pad = jnp.concatenate(
            [xw, jnp.zeros(wl.n_pad - wl.n, dtype=jnp.float32)]
        )
        wins = self._pallas(xw_pad)
        yw = wl.overlap_add(wins, jnp)
        return yw[self.inv].astype(x.dtype)

    def apply(self, x):
        return self._call(x)
