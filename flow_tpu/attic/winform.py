# Generic gather-free apply of a COMPILED element matrix (formlang ->
# window kernel bridge).
#
# fem/formlang.py compiles any scalar bilinear form to a per-cell element
# matrix loc[e, i, j] (CompiledForm._loc). This module turns that matrix
# into a window-blocked Pallas operator: per block, one contiguous DMA
# brings the dof window into VMEM and the element matrix rows are applied
# as [C]-vector FMAs — the same gather-free structure as
# fem/winkernel.py, but FORM-GENERIC. Together with formlang this closes
# the FFC-replacement loop end to end on the TPU path:
#     symbolic form -> element kernel (einsum) -> element matrix
#                   -> gather-free Pallas apply.
# (SURVEY §2.2 "FFC form compiler" row; the reference JITs UFL forms to
# C++ element kernels, /root/reference/flow/heat.py:41-44.)
#
# The element matrix costs NL^2 f32 per cell (36 for scalar P2 in 2-D,
# 100 for P2 tets) — the right trade for coefficient-bearing forms
# (convection-diffusion, SUPG-stabilized heat) whose quadrature chains
# would otherwise be recomputed every matvec. Constant-coefficient hot
# operators (mass/stiffness/momentum) keep their factored hand kernels
# (fem/winkernel.py, fem/winmom.py).
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import winkernel
from .window import build_window_layout
from .winkernel import _LO, _onehots, _gather_dof, _scatter_dof

__all__ = ["WindowElementOperator", "window_operator"]


def _elem_kernel(lidx_ref, valid_ref, aloc_ref, x_hbm, out_ref,
                 win2d, sem, *, S, W, C, NL):
    b = pl.program_id(0)
    rS, A2 = S // _LO, W // _LO
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(b * rS, A2)], win2d, sem)
    cp.start()
    cp.wait()
    win = win2d[...]

    ohs = [_onehots(lidx_ref, j, C, A2) for j in range(NL)]
    u = [_gather_dof(win, oh, ol) for oh, ol in ohs]

    v = valid_ref[0, 0]
    acc = jnp.zeros((A2, _LO), dtype=jnp.float32)
    for i in range(NL):
        # loc_i[c] = sum_j A[c, i, j] u_j[c] — element-matrix rows are
        # [C] lane vectors (row i*NL+j)
        loc = sum(aloc_ref[0, i * NL + j] * u[j] for j in range(NL))
        acc = _scatter_dof(acc, loc * v, *ohs[i])
    out_ref[0] = acc


class WindowElementOperator:
    """Gather-free apply of a per-cell element matrix loc[e, i, j] on a
    scalar FunctionSpace: y = A x with A the assembled operator. The
    element matrix is re-blockable per step (set_matrix) without
    recompiling — it is a kernel INPUT, not a constant."""

    def __init__(self, space, loc=None, S=None, interpret=False):
        self.space = space
        wl = build_window_layout(space, S=S)
        self.wl = wl
        self.interpret = interpret
        self.lidx = jnp.asarray(np.transpose(np.asarray(wl.lidx), (0, 2, 1)))
        self.valid = jnp.asarray(wl.valid, dtype=jnp.float32)[:, None, :]
        self.perm = jnp.asarray(wl.perm.astype(np.int32))
        self.inv = jnp.asarray(wl.inv.astype(np.int32))
        self.nl = int(np.asarray(wl.lidx).shape[2])
        self._cells = jnp.asarray(wl.cells.astype(np.int32))
        self.aloc = None if loc is None else self.block_matrix(loc)
        self._call = jax.jit(self._apply_impl)

    def block_matrix(self, loc):
        """loc [nc, NL, NL] element matrices -> blocked [nb, NL*NL, C]
        kernel input (row i*NL+j). jit-safe (pure jnp ops)."""
        nb = self.wl.nb
        nl = self.nl
        lb = jnp.asarray(loc, jnp.float32)[self._cells]  # [nb, C, NL, NL]
        return jnp.transpose(lb, (0, 2, 3, 1)).reshape(nb, nl * nl, -1)

    def set_matrix(self, loc):
        self.aloc = self.block_matrix(loc)

    def _pallas(self, xw_pad, aloc):
        wl = self.wl
        C, NL = wl.C, self.nl
        A2 = wl.W // _LO
        kern = functools.partial(
            _elem_kernel, S=wl.S, W=wl.W, C=C, NL=NL
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(wl.nb,),
            in_specs=[
                pl.BlockSpec((1, NL, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, NL * NL, C), lambda b: (b, 0, 0)),
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
            compiler_params=winkernel.compiler_params(),
        )(self.lidx, self.valid, aloc, xw_pad.reshape(-1, _LO))
        return out.reshape(wl.nb, wl.W)

    def _apply_impl(self, x, aloc):
        wl = self.wl
        xw = x.astype(jnp.float32)[self.perm]
        xw_pad = jnp.concatenate(
            [xw, jnp.zeros(wl.n_pad - wl.n, dtype=jnp.float32)]
        )
        wins = self._pallas(xw_pad, aloc)
        yw = wl.overlap_add(wins, jnp)
        return yw[self.inv].astype(x.dtype)

    def apply(self, x, aloc=None):
        if aloc is None:
            aloc = self.aloc
            assert aloc is not None, (
                "no element matrix: pass aloc or call set_matrix first"
            )
        return self._call(x, aloc)


def window_operator(form, S=None, interpret=False):
    """CompiledForm (scalar bilinear, same test/trial space) -> gather-free
    WindowElementOperator applying the same discrete operator."""
    assert form.space_j is not None and form.axes == "", (
        "window_operator covers scalar bilinear forms; vector-coupled "
        "forms use the dedicated momentum kernel (fem/winmom.py)"
    )
    assert form.space_i is form.space_j, "test/trial space must match"
    return WindowElementOperator(
        form.space_i, loc=form.local(), S=S, interpret=interpret
    )
