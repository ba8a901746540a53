# Gather-free lagged momentum operator (window-blocked, Pallas-ready).
#
# The semi-implicit ("lagged") tentative-velocity system is LINEAR:
#   A v = M v + s [ rho c_lag(T; v) + sym_grad(v) ],   s = dt/rho * w_im,
# with the transport T fixed per step (navier_stokes/fast.py lagged
# branch). Because no autodiff is needed to apply A, the whole hot-path
# matvec can run as one window-blocked kernel (fem/window.py layout +
# fem/winkernel.py one-hot contracts) — the gather-free replacement for
# the jax.linearize tangent pipeline whose gathers are the measured
# per-apply wall (BENCH_NOTES round 2).
#
# This module holds the BLOCK MATH shared by the pure-JAX reference path
# (vmapped over blocks; correctness on CPU) and the Pallas kernel: given
# the gathered cell-dof values of both components, per-cell geometry and
# the precomputed transport at quadrature points, produce the local
# element contributions [C, NL] per component.
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import assembly, elements
from .window import build_window_layout

__all__ = ["WindowLaggedMomentum"]

_LO = 128


def _block_loc(u0, u1, Tq, detJ, G, Cg, valid, consts, mass_w, s_rho, s_mu):
    # consts are NUMPY arrays (inlined as literals in the kernel); the
    # scalar weights are traced values read from SMEM by the caller
    """Element contributions loc[m] [C, NL] of A v for one cell block.

    u0, u1 [C, NL]: gathered component values of v
    Tq [C, nq, 2]: transport at quadrature points
    detJ [C], G [C,2,2], Cg [C,2,2] (= geom.C), valid [C]
    consts: (phi [nq,NL], dphi [nq,NL,2], w [nq], Mref [NL,NL],
             Kref [2,2,NL,NL])
    """
    phi, dphi, w, Mref, Kref = consts
    w = w.reshape(-1)
    U = [u0, u1]
    wd = w[None, :] * detJ[:, None]  # [C, nq]

    loc = [None, None]
    # mass + conv_lag per component (component-diagonal terms)
    for m in range(2):
        lm = mass_w * detJ[:, None] * jnp.dot(
            U[m], Mref.T, preferred_element_type=jnp.float32
        )
        # reference gradients rg[k] [C, nq]
        rg = [
            jnp.dot(U[m], dphi[:, :, k].T, preferred_element_type=jnp.float32)
            for k in range(2)
        ]
        gv = [
            G[:, d, 0, None] * rg[0] + G[:, d, 1, None] * rg[1]
            for d in range(2)
        ]
        vq = jnp.dot(U[m], phi.T, preferred_element_type=jnp.float32)
        val = 0.5 * (Tq[:, :, 0] * gv[0] + Tq[:, :, 1] * gv[1])
        lm = lm + s_rho * jnp.dot(
            wd * val, phi, preferred_element_type=jnp.float32
        )
        for d in range(2):
            gpart = -0.5 * Tq[:, :, d] * vq  # [C, nq]
            for k in range(2):
                lm = lm + s_rho * G[:, d, k, None] * jnp.dot(
                    wd * gpart, dphi[:, :, k],
                    preferred_element_type=jnp.float32,
                )
        loc[m] = lm

    # stress: mu * [ C_kl Kref[k,l] U_a  +  detJ G_ak G_bl Kref[l,k]^T U_b ]
    # (matches forms.sym_grad_loc's two einsums)
    for k in range(2):
        for l in range(2):
            Kkl = Kref[k, l]
            for m in range(2):
                loc[m] = loc[m] + (s_mu * Cg[:, k, l])[:, None] * jnp.dot(
                    U[m], Kkl.T, preferred_element_type=jnp.float32
                )
            # coupling term: contribution to component a from component b
            # (sym_grad_loc's second einsum "e,eak,ebl,klji,ejb->eia":
            # contract U over j against Kref[k,l,j,i] — K[k,l], untransposed)
            for b in range(2):
                mb = jnp.dot(U[b], Kkl, preferred_element_type=jnp.float32)
                for a in range(2):
                    loc[a] = loc[a] + (
                        s_mu * detJ * G[:, a, k] * G[:, b, l]
                    )[:, None] * mb

    v = valid[:, None]
    return loc[0] * v, loc[1] * v


def _mom_kernel(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
                tq_ref, phi_ref, dphi_ref, w_ref, mref_ref, kref_ref,
                x_hbm, out0_ref, out1_ref, win0, win1, sem0, sem1,
                *, S, W, C, NL, n_pad):
    # valid/detj are [1, 1, C] blocks and outputs [1, 1, W]: Mosaic needs
    # the last two block dims divisible by (8, 128) or equal to the array
    # dims, so per-block rows of 2-D [nb, C]/[nb, W] arrays are illegal on
    # real TPU — the singleton sublane axis makes them exact matches.
    mass_w = scal_ref[0]
    s_rho = scal_ref[1]
    s_mu = scal_ref[2]
    consts = (
        phi_ref[...], dphi_ref[...], w_ref[...], mref_ref[...],
        kref_ref[...],
    )
    b = pl.program_id(0)
    cp0 = pltpu.make_async_copy(x_hbm.at[pl.ds(b * S, W)], win0, sem0)
    cp1 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(n_pad + b * S, W)], win1, sem1
    )
    cp0.start()
    cp1.start()
    cp0.wait()
    cp1.wait()

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

    def gather(win):
        win2d = win[...].reshape(A2, _LO)
        rowsel = jnp.dot(oh_hi, win2d, preferred_element_type=jnp.float32)
        return jnp.sum(jnp.where(oh_lo, rowsel, 0.0), axis=1).reshape(C, NL)

    u0 = gather(win0)
    u1 = gather(win1)
    l0, l1 = _block_loc(
        u0, u1, tq_ref[0], detj_ref[0, 0], g_ref[0], cg_ref[0],
        valid_ref[0, 0], consts, mass_w, s_rho, s_mu,
    )

    def scatter(loc):
        rows = loc.reshape(CNL)
        masked = jnp.where(oh_lo, rows[:, None], 0.0)
        out2d = jnp.dot(oh_hi.T, masked, preferred_element_type=jnp.float32)
        return out2d.reshape(W)

    out0_ref[0, 0] = scatter(l0)
    out1_ref[0, 0] = scatter(l1)


class WindowLaggedMomentum:
    """Gather-free apply of the lagged momentum volume operator on a
    vector-P2 space. State convention: [n, 2] in the ORIGINAL numbering
    (set_transport/apply handle the permutation; the solve-side fast path
    works directly in permuted coordinates via apply_permuted)."""

    def __init__(self, V, dt_s_rho=None, S=512, interpret=False):
        self.V = V
        self.wl = build_window_layout(V, S=S)
        self.interpret = interpret
        wl = self.wl
        geom = assembly.geometry(V.mesh)
        dt = V.mesh.dtype
        cells = np.asarray(wl.cells, dtype=np.int64)
        self.detj = jnp.asarray(
            np.asarray(geom.detJ)[cells], dtype=jnp.float32
        )[:, None, :]
        self.G = jnp.asarray(np.asarray(geom.G)[cells], dtype=jnp.float32)
        self.Cg = jnp.asarray(np.asarray(geom.C)[cells], dtype=jnp.float32)
        self.lidx = jnp.asarray(wl.lidx)
        self.valid = jnp.asarray(wl.valid, dtype=jnp.float32)[:, None, :]
        self.perm = jnp.asarray(wl.perm.astype(np.int32))
        self.inv = jnp.asarray(wl.inv.astype(np.int32))

        tab = assembly.tabulation(V, 5)  # CONV_RULE
        self.tab = tab
        mref = np.asarray(assembly.ref_mass(V.degree, assembly._dim(V)))
        kref = np.asarray(
            elements.__dict__.get("ref_stiffness_tensor", None)
            or _ref_stiffness(V)
        )
        f32 = np.float32
        # NUMPY constants: inlined into the kernel as literals (jnp arrays
        # would be captured tracers, which pallas_call rejects)
        self.consts = (
            np.asarray(tab.phi, f32), np.asarray(tab.dphi, f32),
            np.asarray(tab.w, f32), np.asarray(mref, f32),
            np.asarray(kref, f32),
        )
        self._apply_jit = jax.jit(self._apply_original)

    # -- per-step transport ------------------------------------------------
    def transport_qp(self, T):
        """T [n, 2] (original numbering) -> Tq [nb, C, nq, 2] blocked."""
        tab = self.tab
        Tloc = self.V.gather(T)  # [nc, NL, 2]
        Tq = assembly.values_at_qp(tab, Tloc)  # [nc, nq, 2]
        return jnp.asarray(
            Tq[jnp.asarray(self.wl.cells.astype(np.int32))], jnp.float32
        )

    # -- applies -------------------------------------------------------------
    def _pallas(self, x_flat_pad, Tq, mass_w, s_rho, s_mu):
        wl = self.wl
        C, NL = wl.C, wl.lidx.shape[2]
        nq = self.tab.phi.shape[0]
        kern = functools.partial(
            _mom_kernel, S=wl.S, W=wl.W, C=C, NL=NL, n_pad=wl.n_pad,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(wl.nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, C, NL), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, C, 2, 2), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, C, 2, 2), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, C, nq, 2), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((nq, NL), lambda b: (0, 0)),
                pl.BlockSpec((nq, NL, 2), lambda b: (0, 0, 0)),
                pl.BlockSpec((1, nq), lambda b: (0, 0)),
                pl.BlockSpec((NL, NL), lambda b: (0, 0)),
                pl.BlockSpec((2, 2, NL, NL), lambda b: (0, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, wl.W), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, wl.W), lambda b: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((wl.W,), jnp.float32),
                pltpu.VMEM((wl.W,), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        out0, out1 = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((wl.nb, 1, wl.W), jnp.float32),
                jax.ShapeDtypeStruct((wl.nb, 1, wl.W), jnp.float32),
            ],
            grid_spec=grid_spec,
            interpret=self.interpret,
        )(
            jnp.asarray([mass_w, s_rho, s_mu], dtype=jnp.float32),
            self.lidx, self.valid, self.detj, self.G, self.Cg, Tq,
            jnp.asarray(self.consts[0]), jnp.asarray(self.consts[1]),
            jnp.asarray(self.consts[2])[None, :], jnp.asarray(self.consts[3]),
            jnp.asarray(self.consts[4]), x_flat_pad,
        )
        wl = self.wl
        return out0.reshape(wl.nb, wl.W), out1.reshape(wl.nb, wl.W)

    def apply_permuted(self, xp, Tq, mass_w, s_rho, s_mu):
        """xp [2, n_pad] permuted+padded components -> y same layout."""
        wl = self.wl
        wins0, wins1 = self._pallas(
            xp.reshape(2 * wl.n_pad), Tq, mass_w, s_rho, s_mu
        )
        y0 = wl.overlap_add(wins0, jnp)
        y1 = wl.overlap_add(wins1, jnp)
        return y0, y1

    def apply_perm_rows(self, v, Tq, mass_w, s_rho, s_mu):
        """v [n, 2] in PERMUTED row order -> A v, same layout. The
        zero-permute fast path for solves that live in window coordinates
        (fast.py winkernel lagged branch)."""
        wl = self.wl
        pad = jnp.zeros(wl.n_pad - wl.n, dtype=jnp.float32)
        xp = jnp.stack([
            jnp.concatenate([v[:, 0].astype(jnp.float32), pad]),
            jnp.concatenate([v[:, 1].astype(jnp.float32), pad]),
        ])
        y0, y1 = self.apply_permuted(xp, Tq, mass_w, s_rho, s_mu)
        return jnp.stack([y0, y1], axis=1).astype(v.dtype)

    def _apply_original(self, x, Tq, mass_w, s_rho, s_mu):
        """x [n, 2] original numbering -> A x [n, 2] (volume terms)."""
        wl = self.wl
        pad = jnp.zeros(wl.n_pad - wl.n, dtype=jnp.float32)
        xp = jnp.stack([
            jnp.concatenate([x[:, 0].astype(jnp.float32)[self.perm], pad]),
            jnp.concatenate([x[:, 1].astype(jnp.float32)[self.perm], pad]),
        ])
        y0, y1 = self.apply_permuted(xp, Tq, mass_w, s_rho, s_mu)
        return jnp.stack([y0[self.inv], y1[self.inv]], axis=1).astype(x.dtype)

    def apply(self, x, Tq, mass_w, s_rho, s_mu):
        return self._apply_jit(x, Tq, mass_w, s_rho, s_mu)


def _ref_stiffness(V):
    from .forms import ref_stiffness

    return ref_stiffness(V.degree, assembly._dim(V))
