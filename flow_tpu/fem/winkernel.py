# Gather-free window-blocked Pallas operator kernels.
#
# Built on fem/window.py's uniform-stride layout: per block, ONE contiguous
# DMA brings the dof window into VMEM; the cell-dof "gather" and the
# transpose "scatter" are two-level one-hot contracts whose O(W) part runs
# on the MXU (see scripts/onehot_window_probe.py):
#
#   gather:  li = hi*128 + lo
#            rowsel = onehot(hi) @ win2d          [CNL, 128]   (MXU)
#            u[r]   = sum_b onehot_lo[r,b] rowsel[r,b]         (VPU)
#   scatter: masked = loc[r,None] * onehot_lo                  (VPU)
#            win2d += onehot(hi).T @ masked                    (MXU)
#
# No gather/scatter instruction appears anywhere: the row-count-bound
# gather engine (0.6-3e8 rows/s, the measured wall of every FEM hot path,
# BENCH_NOTES round 2) is bypassed entirely. Output windows overlap-add
# into the result by W/S shifted contiguous adds (window.py).
#
# v1 kernel: the consistent-mass apply (the velocity-correction operator,
# /root/reference/flow/navier_stokes/pressure_correction.py:448-449's
# (u, v) term). Equivalence vs assembly.mass_apply is pinned in
# tests/test_winkernel.py; interpret=True runs on CPU.
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import assembly, elements
from .window import build_window_layout

__all__ = ["WindowMassOperator", "WindowStiffnessOperator"]

_LO = 128  # two-level one-hot low radix (= lane width)


def _mass_kernel(lidx_ref, valid_ref, detj_ref, mref_ref, x_hbm, out_ref,
                 win, sem, *, S, W, C, NL):
    # valid/detj arrive as [1, 1, C] blocks and out as [1, 1, W]: Mosaic
    # requires the last two block dims to be divisible by (8, 128) or
    # equal to the array dims, so per-block rows of a 2-D [nb, C] array
    # (block (1, C)) are illegal on real TPU — the singleton axis makes
    # the last-two dims exact matches.
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(b * S, W)], win, sem)
    cp.start()
    cp.wait()

    CNL = C * NL
    A2 = W // _LO
    li = lidx_ref[0].reshape(CNL)
    hi = li // _LO
    lo = li - hi * _LO
    oh_hi = (
        hi[:, None] == jax.lax.broadcasted_iota(jnp.int32, (CNL, A2), 1)
    ).astype(jnp.float32)
    oh_lo = lo[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (CNL, _LO), 1
    )

    # gather u at cell dofs
    win2d = win[...].reshape(A2, _LO)
    rowsel = jnp.dot(oh_hi, win2d, preferred_element_type=jnp.float32)
    u = jnp.sum(jnp.where(oh_lo, rowsel, 0.0), axis=1).reshape(C, NL)

    # element mass: loc[c, i] = detJ_c * sum_j Mref[i, j] u[c, j]
    loc = jnp.dot(u, mref_ref[...].T, preferred_element_type=jnp.float32)
    loc = loc * (detj_ref[0, 0] * valid_ref[0, 0])[:, None]

    # transpose scatter into the window
    rows = loc.reshape(CNL)
    masked = jnp.where(oh_lo, rows[:, None], 0.0)
    out2d = jnp.dot(oh_hi.T, masked, preferred_element_type=jnp.float32)
    out_ref[0, 0] = out2d.reshape(W)


class WindowMassOperator:
    """Gather-free consistent-mass apply on a scalar FunctionSpace.

    apply(x) computes (in the ORIGINAL dof numbering) the same vector as
    assembly.mass_apply(space, geom, x) for scalar x [n], via the window
    kernel. Vector states apply per component.
    """

    def __init__(self, space, S=512, interpret=False):
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
        # [nb, C] per-block tables carry a singleton sublane axis (see
        # _mass_kernel).
        self.detj = jnp.asarray(detj, dtype=jnp.float32)[:, None, :]
        self.mref = jnp.asarray(mref, dtype=jnp.float32)
        self.lidx = jnp.asarray(wl.lidx)
        self.valid = jnp.asarray(wl.valid, dtype=jnp.float32)[:, None, :]
        self.perm = jnp.asarray(wl.perm.astype(np.int32))
        self.inv = jnp.asarray(wl.inv.astype(np.int32))
        self._call = jax.jit(self._apply_impl)

    def _pallas(self, xw_pad):
        wl = self.wl
        C, NL = wl.C, wl.lidx.shape[2]
        kern = functools.partial(
            _mass_kernel, S=wl.S, W=wl.W, C=C, NL=NL
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(wl.nb,),
            in_specs=[
                pl.BlockSpec((1, C, NL), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((NL, NL), lambda b: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, wl.W), lambda b: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((wl.W,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((wl.nb, 1, wl.W), jnp.float32),
            grid_spec=grid_spec,
            interpret=self.interpret,
        )(self.lidx, self.valid, self.detj, self.mref, xw_pad)
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


def _stiff_kernel(lidx_ref, valid_ref, cg_ref, kref_ref, x_hbm, out_ref,
                  win, sem, *, S, W, C, NL):
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(b * S, W)], win, sem)
    cp.start()
    cp.wait()

    CNL = C * NL
    A2 = W // _LO
    li = lidx_ref[0].reshape(CNL)
    hi = li // _LO
    lo = li - hi * _LO
    oh_hi = (
        hi[:, None] == jax.lax.broadcasted_iota(jnp.int32, (CNL, A2), 1)
    ).astype(jnp.float32)
    oh_lo = lo[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (CNL, _LO), 1
    )

    win2d = win[...].reshape(A2, _LO)
    rowsel = jnp.dot(oh_hi, win2d, preferred_element_type=jnp.float32)
    u = jnp.sum(jnp.where(oh_lo, rowsel, 0.0), axis=1).reshape(C, NL)

    # scalar stiffness: loc[c, i] = sum_kl Cg[c,k,l] (u K[k,l]^T)[c, i]
    Kref = kref_ref[...]
    Cg = cg_ref[0]
    loc = None
    for k in range(2):
        for l in range(2):
            t = Cg[:, k, l, None] * jnp.dot(
                u, Kref[k, l].T, preferred_element_type=jnp.float32
            )
            loc = t if loc is None else loc + t
    loc = loc * valid_ref[0, 0][:, None]

    rows = loc.reshape(CNL)
    masked = jnp.where(oh_lo, rows[:, None], 0.0)
    out2d = jnp.dot(oh_hi.T, masked, preferred_element_type=jnp.float32)
    out_ref[0, 0] = out2d.reshape(W)


class WindowStiffnessOperator:
    """Gather-free scalar stiffness apply (the pressure-Poisson / MG-level
    operator: K x with K = int grad(u).grad(v))."""

    def __init__(self, space, S=512, interpret=False):
        from .forms import ref_stiffness

        self.space = space
        wl = build_window_layout(space, S=S)
        self.wl = wl
        self.interpret = interpret
        geom = assembly.geometry(space.mesh)
        cells = np.asarray(wl.cells, dtype=np.int64)
        self.Cg = jnp.asarray(np.asarray(geom.C)[cells], dtype=jnp.float32)
        self.kref = jnp.asarray(
            np.asarray(ref_stiffness(space.degree, assembly._dim(space))),
            dtype=jnp.float32,
        )
        self.lidx = jnp.asarray(wl.lidx)
        self.valid = jnp.asarray(wl.valid, dtype=jnp.float32)[:, None, :]
        self.perm = jnp.asarray(wl.perm.astype(np.int32))
        self.inv = jnp.asarray(wl.inv.astype(np.int32))
        self._call = jax.jit(self._apply_impl)

    def _pallas(self, xw_pad):
        wl = self.wl
        C, NL = wl.C, wl.lidx.shape[2]
        kern = functools.partial(
            _stiff_kernel, S=wl.S, W=wl.W, C=C, NL=NL
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(wl.nb,),
            in_specs=[
                pl.BlockSpec((1, C, NL), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, C, 2, 2), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((2, 2, NL, NL), lambda b: (0, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, wl.W), lambda b: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((wl.W,), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((wl.nb, 1, wl.W), jnp.float32),
            grid_spec=grid_spec,
            interpret=self.interpret,
        )(self.lidx, self.valid, self.Cg, self.kref, xw_pad)
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
