# Gather-free lagged momentum operator (window-blocked Pallas kernel).
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
# Mosaic shape discipline (see fem/winkernel.py header): the tiny local
# axes (local dofs NL, quadrature nq, tensor 2x2) are unrolled in Python;
# every in-kernel value is a [C] lane vector, per-cell tables are stored
# rows-first ([nb, rows, C]) so picks are sublane selections, reference
# tensors are SMEM scalars, and windows arrive as 2-D row slabs.
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import assembly
from .window import build_window_layout
from .winkernel import _LO, _onehots, _gather_dof, _scatter_dof

__all__ = ["WindowLaggedMomentum"]


def _mom_body(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
              tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
              x_hbm, out0_ref, out1_ref, win0, win1, sem0, sem1,
              uq_ref, gu_ref, *, S, W, C, NL, NQ, n_rows):
    """Shared kernel body. With uq_ref/gu_ref (Newton mode) the apply also
    adds the convection reaction term c(v; x) — the tangent of the skew
    form w.r.t. its transport slot — making the full Newton tangent:
      J v = M v + s [ rho (c(x; v) + c(v; x)) + sym_grad(v) ].
    Without them (lagged mode) it is the semi-implicit operator."""
    mass_w = scal_ref[0]
    s_rho = scal_ref[1]
    s_mu = scal_ref[2]
    b = pl.program_id(0)
    rS, A2 = S // _LO, W // _LO
    cp0 = pltpu.make_async_copy(x_hbm.at[pl.ds(b * rS, A2)], win0, sem0)
    cp1 = pltpu.make_async_copy(
        x_hbm.at[pl.ds(n_rows + b * rS, A2)], win1, sem1
    )
    cp0.start()
    cp1.start()
    cp0.wait()
    cp1.wait()

    ohs = [_onehots(lidx_ref, j, C, A2) for j in range(NL)]
    U = [
        [_gather_dof(win0[...], oh, ol) for oh, ol in ohs],
        [_gather_dof(win1[...], oh, ol) for oh, ol in ohs],
    ]

    detj = detj_ref[0, 0]                       # [C]
    G = [[g_ref[0, 2 * d + k] for k in range(2)] for d in range(2)]
    Cg = [cg_ref[0, kl] for kl in range(4)]
    Tq = [[tq_ref[0, d * NQ + q] for q in range(NQ)] for d in range(2)]
    wd = [w_s[0, q] * detj for q in range(NQ)]  # [C] per q

    # direction values at quadrature points, [C] per (component, q) —
    # needed across components by the reaction term
    vq_all = [
        [sum(phi_s[q, j] * U[m][j] for j in range(NL)) for q in range(NQ)]
        for m in range(2)
    ]

    loc = [[None] * NL, [None] * NL]
    for m in range(2):
        u = U[m]
        vq = vq_all[m]
        rg = [
            [
                sum(dphi_s[k * NQ + q, j] * u[j] for j in range(NL))
                for q in range(NQ)
            ]
            for k in range(2)
        ]
        gv = [
            [G[d][0] * rg[0][q] + G[d][1] * rg[1][q] for q in range(NQ)]
            for d in range(2)
        ]
        # skew convection: 0.5 (T.grad v) - 0.5 div-weighted part
        wv = [
            wd[q] * 0.5 * (Tq[0][q] * gv[0][q] + Tq[1][q] * gv[1][q])
            for q in range(NQ)
        ]
        wg = [
            [wd[q] * (-0.5) * Tq[d][q] * vq[q] for q in range(NQ)]
            for d in range(2)
        ]
        for i in range(NL):
            lm = mass_w * detj * sum(
                mref_s[i, j] * u[j] for j in range(NL)
            )
            conv = sum(wv[q] * phi_s[q, i] for q in range(NQ))
            for d in range(2):
                for k in range(2):
                    conv = conv + G[d][k] * sum(
                        wg[d][q] * dphi_s[k * NQ + q, i] for q in range(NQ)
                    )
            lm = lm + s_rho * conv
            # stress, component-diagonal part: Cg[k,l] Kref[k,l,i,j] u_j
            st = None
            for k in range(2):
                for l in range(2):
                    t = Cg[2 * k + l] * sum(
                        kref_s[(2 * k + l) * NL + i, j] * u[j]
                        for j in range(NL)
                    )
                    st = t if st is None else st + t
            loc[m][i] = lm + s_mu * st

    # stress coupling: loc[a][i] += s_mu detj G[a,k] G[b,l] K[k,l,j,i] u_b_j
    for k in range(2):
        for l in range(2):
            for bb in range(2):
                for i in range(NL):
                    mb = sum(
                        kref_s[(2 * k + l) * NL + j, i] * U[bb][j]
                        for j in range(NL)
                    )
                    smb = s_mu * detj * mb
                    for a in range(2):
                        loc[a][i] = loc[a][i] + G[a][k] * G[bb][l] * smb

    if uq_ref is not None:
        # Newton reaction c(v; x), skew form:
        #   0.5 [ (v.grad x)_m phi_i - (v.grad phi_i) x_m ]
        # with x the state at quadrature points (uq: row m*NQ+q) and its
        # physical gradient (gu: row (d*2+m)*NQ+q holds d_d x_m).
        xq = [[uq_ref[0, m * NQ + q] for q in range(NQ)] for m in range(2)]
        for m in range(2):
            wt2a = [
                0.5 * wd[q] * (
                    vq_all[0][q] * gu_ref[0, (0 * 2 + m) * NQ + q]
                    + vq_all[1][q] * gu_ref[0, (1 * 2 + m) * NQ + q]
                )
                for q in range(NQ)
            ]
            ws2 = [
                [0.5 * wd[q] * vq_all[d][q] * xq[m][q] for q in range(NQ)]
                for d in range(2)
            ]
            for i in range(NL):
                re = sum(wt2a[q] * phi_s[q, i] for q in range(NQ))
                for d in range(2):
                    for k in range(2):
                        re = re - G[d][k] * sum(
                            ws2[d][q] * dphi_s[k * NQ + q, i]
                            for q in range(NQ)
                        )
                loc[m][i] = loc[m][i] + s_rho * re

    v = valid_ref[0, 0]
    acc0 = jnp.zeros((A2, _LO), dtype=jnp.float32)
    acc1 = jnp.zeros((A2, _LO), dtype=jnp.float32)
    for i in range(NL):
        acc0 = _scatter_dof(acc0, loc[0][i] * v, *ohs[i])
        acc1 = _scatter_dof(acc1, loc[1][i] * v, *ohs[i])
    out0_ref[0] = acc0
    out1_ref[0] = acc1


def _mom_kernel(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
                tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
                x_hbm, out0_ref, out1_ref, win0, win1, sem0, sem1,
                *, S, W, C, NL, NQ, n_rows):
    _mom_body(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
              tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
              x_hbm, out0_ref, out1_ref, win0, win1, sem0, sem1,
              None, None, S=S, W=W, C=C, NL=NL, NQ=NQ, n_rows=n_rows)


def _mom_newton_kernel(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref,
                       cg_ref, tq_ref, uq_ref, gu_ref, phi_s, dphi_s, w_s,
                       mref_s, kref_s, x_hbm, out0_ref, out1_ref,
                       win0, win1, sem0, sem1,
                       *, S, W, C, NL, NQ, n_rows):
    _mom_body(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
              tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
              x_hbm, out0_ref, out1_ref, win0, win1, sem0, sem1,
              uq_ref, gu_ref, S=S, W=W, C=C, NL=NL, NQ=NQ, n_rows=n_rows)


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
        cells = np.asarray(wl.cells, dtype=np.int64)
        f32 = np.float32
        nb = wl.nb
        self.detj = jnp.asarray(
            np.asarray(geom.detJ)[cells], dtype=jnp.float32
        )[:, None, :]
        # [nb, 4, C] with row 2a+k: geometry picks are sublane rows
        g = np.asarray(geom.G)[cells]
        self.G4 = jnp.asarray(
            np.transpose(g, (0, 2, 3, 1)).reshape(nb, 4, -1), f32
        )
        cg = np.asarray(geom.C)[cells]
        self.Cg4 = jnp.asarray(
            np.transpose(cg, (0, 2, 3, 1)).reshape(nb, 4, -1), f32
        )
        self.lidx = jnp.asarray(np.transpose(np.asarray(wl.lidx), (0, 2, 1)))
        self.valid = jnp.asarray(wl.valid, dtype=jnp.float32)[:, None, :]
        self.perm = jnp.asarray(wl.perm.astype(np.int32))
        self.inv = jnp.asarray(wl.inv.astype(np.int32))

        tab = assembly.tabulation(V, 5)  # CONV_RULE
        self.tab = tab
        nq, nl = np.asarray(tab.phi).shape
        self.nq = nq
        mref = np.asarray(assembly.ref_mass(V.degree, assembly._dim(V)))
        kref = np.asarray(_ref_stiffness(V))
        # SMEM scalar tables: phi [nq, NL]; dphi rows k*nq+q -> dphi[q,:,k];
        # w [1, nq]; mref [NL, NL]; kref rows (2k+l)*NL+i -> K[k,l,i,:]
        dphi = np.asarray(tab.dphi, f32)  # [nq, NL, 2]
        self.phi_s = jnp.asarray(np.asarray(tab.phi, f32))
        self.dphi_s = jnp.asarray(
            np.transpose(dphi, (2, 0, 1)).reshape(2 * nq, nl)
        )
        self.w_s = jnp.asarray(np.asarray(tab.w, f32).reshape(1, nq))
        self.mref_s = jnp.asarray(np.asarray(mref, f32))
        self.kref_s = jnp.asarray(np.asarray(kref, f32).reshape(4 * nl, nl))
        self._apply_jit = jax.jit(self._apply_original)

    # -- per-step transport ------------------------------------------------
    def transport_qp(self, T):
        """T [n, 2] (original numbering) -> Tq [nb, 2*nq, C] blocked
        (row d*nq+q holds component d at quadrature point q)."""
        tab = self.tab
        Tloc = self.V.gather(T)  # [nc, NL, 2]
        Tq = assembly.values_at_qp(tab, Tloc)  # [nc, nq, 2]
        Tqb = jnp.asarray(
            Tq[jnp.asarray(self.wl.cells.astype(np.int32))], jnp.float32
        )  # [nb, C, nq, 2]
        nb = self.wl.nb
        return jnp.transpose(Tqb, (0, 3, 2, 1)).reshape(nb, 2 * self.nq, -1)

    def state_qp(self, x):
        """x [n, 2] (original numbering) -> (Tq, Uq, Gu) blocked tables for
        the Newton tangent: values (row m*nq+q) and physical gradients
        (row (d*2+m)*nq+q holds d_d x_m) at quadrature points."""
        tab = self.tab
        geom = assembly.geometry(self.V.mesh)
        nb, nq = self.wl.nb, self.nq
        cells = jnp.asarray(self.wl.cells.astype(np.int32))
        Xloc = self.V.gather(x)  # [nc, NL, 2]
        Xq = assembly.values_at_qp(tab, Xloc)  # [nc, nq, 2]
        Tq = jnp.transpose(
            jnp.asarray(Xq[cells], jnp.float32), (0, 3, 2, 1)
        ).reshape(nb, 2 * nq, -1)
        # reference gradients -> physical: d_d x_m = G[d,k] dphi[q,j,k] X[j,m]
        dphi = jnp.asarray(np.asarray(tab.dphi, np.float32))  # [nq, NL, 2]
        rgrad = jnp.einsum(
            "cjm,qjk->cqkm", Xloc.astype(jnp.float32), dphi
        )  # [nc, nq, 2(k), 2(m)]
        G = jnp.asarray(geom.G, jnp.float32)  # [nc, 2(d), 2(k)]
        gU = jnp.einsum("cdk,cqkm->cdmq", G, rgrad)  # [nc, d, m, q]
        Gub = jnp.asarray(gU[cells], jnp.float32)  # [nb, C, 2, 2, nq]
        Gu = jnp.transpose(Gub, (0, 2, 3, 4, 1)).reshape(nb, 4 * nq, -1)
        return Tq, Tq, Gu  # Uq shares Tq's (m*nq+q) row layout

    # -- applies -------------------------------------------------------------
    def _pallas(self, x_flat_pad, Tq, mass_w, s_rho, s_mu, Uq=None, Gu=None):
        wl = self.wl
        C, NL = wl.C, self.lidx.shape[1]
        nq = self.nq
        A2 = wl.W // _LO
        n_rows = wl.n_pad // _LO
        newton = Uq is not None
        kern = functools.partial(
            _mom_newton_kernel if newton else _mom_kernel,
            S=wl.S, W=wl.W, C=C, NL=NL, NQ=nq, n_rows=n_rows,
        )
        state_specs = [
            pl.BlockSpec((1, 2 * nq, C), lambda b: (b, 0, 0)),
        ]
        state_args = [Tq]
        if newton:
            state_specs += [
                pl.BlockSpec((1, 2 * nq, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 4 * nq, C), lambda b: (b, 0, 0)),
            ]
            state_args += [Uq, Gu]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(wl.nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, NL, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 4, C), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 4, C), lambda b: (b, 0, 0)),
                *state_specs,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, A2, _LO), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, A2, _LO), lambda b: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((A2, _LO), jnp.float32),
                pltpu.VMEM((A2, _LO), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        out0, out1 = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((wl.nb, A2, _LO), jnp.float32),
                jax.ShapeDtypeStruct((wl.nb, A2, _LO), jnp.float32),
            ],
            grid_spec=grid_spec,
            interpret=self.interpret,
        )(
            jnp.asarray([mass_w, s_rho, s_mu], dtype=jnp.float32),
            self.lidx, self.valid, self.detj, self.G4, self.Cg4,
            *state_args,
            self.phi_s, self.dphi_s, self.w_s, self.mref_s, self.kref_s,
            x_flat_pad.reshape(-1, _LO),
        )
        return out0.reshape(wl.nb, wl.W), out1.reshape(wl.nb, wl.W)

    def apply_permuted(self, xp, Tq, mass_w, s_rho, s_mu, Uq=None, Gu=None):
        """xp [2, n_pad] permuted+padded components -> y same layout."""
        wl = self.wl
        wins0, wins1 = self._pallas(
            xp.reshape(2 * wl.n_pad), Tq, mass_w, s_rho, s_mu, Uq, Gu
        )
        y0 = wl.overlap_add(wins0, jnp)
        y1 = wl.overlap_add(wins1, jnp)
        return y0, y1

    def apply_perm_rows(self, v, Tq, mass_w, s_rho, s_mu, Uq=None, Gu=None):
        """v [n, 2] in PERMUTED row order -> A v, same layout. The
        zero-permute fast path for solves that live in window coordinates
        (fast.py winkernel lagged/newton branches). With Uq/Gu the apply
        is the full Newton tangent."""
        wl = self.wl
        pad = jnp.zeros(wl.n_pad - wl.n, dtype=jnp.float32)
        xp = jnp.stack([
            jnp.concatenate([v[:, 0].astype(jnp.float32), pad]),
            jnp.concatenate([v[:, 1].astype(jnp.float32), pad]),
        ])
        y0, y1 = self.apply_permuted(xp, Tq, mass_w, s_rho, s_mu, Uq, Gu)
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
