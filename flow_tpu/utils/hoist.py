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
        self._consts = uniq  # device_put lazily on first call
        self._committed = False

        def run(consts, flat_args):
            full = [consts[i] for i in self._const_index]
            out = jax.core.eval_jaxpr(self._jaxpr, full, *flat_args)
            return tree_util.tree_unflatten(self._out_tree, out)

        self._run = jax.jit(run)

    @property
    def n_const_bytes(self):
        # metadata only — must not device_get the (potentially GB-sized)
        # committed constant arrays
        return sum(
            int(np.prod(c.shape)) * c.dtype.itemsize for c in self._consts
        )

    def __call__(self, *args):
        if not self._committed:
            # one-time bulk transfer to the default device; afterwards the
            # committed arrays are reused by every call
            self._consts = jax.device_put(self._consts)
            self._committed = True
        flat, tree2 = tree_util.tree_flatten(args)
        assert tree2 == self._in_tree, (tree2, self._in_tree)
        return self._run(self._consts, flat)

    def lower(self, *args):
        flat, _ = tree_util.tree_flatten(args)
        return self._run.lower(self._consts, flat)
