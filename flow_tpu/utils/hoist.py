# Constant-hoisting jit: compile programs whose closed-over arrays become
# PARAMETERS instead of embedded HLO constants.
#
# The fused-step programs close over large mesh index tables (cell_dofs,
# dof-sum adjacency, ELL cols/vals, boundary tabulations, geometry factors).
# Embedded as constants they (a) inflate the serialized program ~linearly
# with mesh size — at 7.6M DoF past the remote-compile relay's request cap
# (HTTP 413, BENCH_NOTES round-2) — and (b) re-upload with every new program
# compiled against the same mesh. Hoisting turns them into device-resident
# arguments transferred once.
#
# jax.closure_convert does NOT do this: it only hoists consts that may be
# perturbed by autodiff tracers (it exists for custom_vjp closures). Here we
# trace with make_jaxpr and replay the jaxpr with its consts bound as
# arguments.
from __future__ import annotations

import jax
import numpy as np
from jax import tree_util

__all__ = ["HoistedFunction"]


class HoistedFunction:
    """``f(*example_args)`` retraced so every closed-over constant becomes an
    argument; calling the instance runs the jitted hoisted program.

    The constant buffers are deduplicated (by object identity) and
    device_put once on first call; subsequent calls reuse the committed
    device arrays with zero re-transfer. Output pytree structure is
    preserved. The argument-shape signature is fixed at construction.
    """

    def __init__(self, f, example_args):
        flat_ex, in_tree = tree_util.tree_flatten(example_args)
        self._in_tree = in_tree

        def flat_f(*flat_args):
            return f(*tree_util.tree_unflatten(in_tree, list(flat_args)))

        closed, out_shape = jax.make_jaxpr(flat_f, return_shape=True)(*flat_ex)
        self._out_tree = tree_util.tree_structure(out_shape)
        self._jaxpr = closed.jaxpr

        # dedup constant buffers by identity (the same table is typically
        # captured by several sub-closures: residual + Jacobian + probes)
        uniq, index = [], []
        seen = {}
        for c in closed.consts:
            k = id(c)
            if k not in seen:
                seen[k] = len(uniq)
                uniq.append(c)
            index.append(seen[k])
        self._const_index = index

        # PACK the unique constants into ONE buffer per dtype: the axon
        # tunnel pays a per-buffer dispatch cost (~30-40 ms) on every call,
        # so a 150-argument hoisted program costs ~6 s/call in pure
        # dispatch (measured round-4, scripts/hoist_overhead_probe.py:
        # hoisted run 6.45 s vs the same program with embedded constants
        # 86 ms). Packed, a call passes a handful of buffers; the program
        # re-slices the constants device-side (one fused relayout pass,
        # outside any scan).
        # Group buffers are 2-D [rows, LANE] with every constant starting
        # on a row boundary. A giant 1-D parameter is a trap: the TPU
        # compiler's slice-of-reshape canonicalization re-factors it into
        # an arbitrary 2-D shape before tiling, and a bad factorization
        # tile-pads the minor dim to 128 (measured twice at 10M DoF:
        # f32[90657734, 3] = 46 GB, then f32[135987200, 2] = 69 GB, both
        # OOMing compile). A [rows, 1024] parameter has a fixed sane
        # tiling, and each constant is a contiguous ROW SLICE of it.
        LANE = 1024
        groups = {}  # dtype name -> list of (uniq_idx, row_off, nrows,
        #              size, shape)
        buffers = {}
        for i, c in enumerate(uniq):
            arr = np.asarray(c)
            dt = arr.dtype.name
            buf = buffers.setdefault(dt, [])
            row_off = sum(b.shape[0] for b in buf)
            nrows = max(1, -(-arr.size // LANE))
            padded = np.zeros(nrows * LANE, dtype=arr.dtype)
            padded[: arr.size] = arr.ravel()
            buf.append(padded.reshape(nrows, LANE))
            groups.setdefault(dt, []).append(
                (i, row_off, nrows, arr.size, arr.shape)
            )
        self._group_names = sorted(buffers)
        self._packed_np = [
            np.concatenate(buffers[g], axis=0) for g in self._group_names
        ]
        spec = [None] * len(uniq)
        for gi, g in enumerate(self._group_names):
            for (i, row_off, nrows, size, shape) in groups[g]:
                spec[i] = (gi, row_off, nrows, size, shape)
        self._spec = spec
        self._n_const_bytes = sum(b.nbytes for b in self._packed_np)
        self._packed = None  # device_put on first call

        def run(packed, flat_args):
            consts = [
                packed[gi][row_off: row_off + nrows]
                .reshape(-1)[:size]
                .reshape(shape)
                for (gi, row_off, nrows, size, shape) in self._spec
            ]
            full = [consts[i] for i in self._const_index]
            out = jax.core.eval_jaxpr(self._jaxpr, full, *flat_args)
            return tree_util.tree_unflatten(self._out_tree, out)

        self._run = jax.jit(run)

    @property
    def n_const_bytes(self):
        return self._n_const_bytes

    def __call__(self, *args):
        if self._packed is None:
            # one-time bulk transfer of the dtype-packed buffers to the
            # default device; every call reuses the committed handles
            self._packed = jax.device_put(self._packed_np)
            self._packed_np = None  # host copies no longer needed
        flat, tree2 = tree_util.tree_flatten(args)
        assert tree2 == self._in_tree, (tree2, self._in_tree)
        return self._run(self._packed, flat)

    def lower(self, *args):
        if self._packed is None:
            self._packed = jax.device_put(self._packed_np)
            self._packed_np = None
        flat, _ = tree_util.tree_flatten(args)
        return self._run.lower(self._packed, flat)
