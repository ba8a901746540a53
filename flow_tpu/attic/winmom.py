# Gather-free momentum operator (window-blocked Pallas kernel), 2-D/3-D.
#
# The semi-implicit ("lagged") tentative-velocity system is LINEAR:
#   A v = M v + s [ rho c_lag(T; v) + sym_grad(v) ],   s = dt/rho * w_im,
# with the transport T fixed per step (navier_stokes/fast.py lagged
# branch); with the reaction term c(v; x) added (Newton mode) the apply
# is the exact volume Newton tangent
#   J v = M v + s [ rho (c(x; v) + c(v; x)) + sym_grad(v) ].
# Either way no autodiff is needed, so the hot-path matvec runs as one
# window-blocked kernel (fem/window.py layout + fem/winkernel.py one-hot
# contracts) — the gather-free replacement for the jax.linearize tangent
# pipeline whose gathers are the measured per-apply wall (BENCH_NOTES
# round 2).
#
# Mosaic shape discipline (see fem/winkernel.py header): tiny local axes
# (local dofs NL, quadrature nq, DIM x DIM tensors) are unrolled in
# Python; every in-kernel value is a [C] lane vector, per-cell tables are
# stored rows-first ([nb, rows, C]) so picks are sublane selections,
# reference tensors are SMEM scalars, windows arrive as 2-D row slabs.
#
# Blocked-table row layouts (all [nb, rows, C]):
#   geometry G    row DIM*d + k           = G[c, d, k]
#   geometry Cg   row DIM*k + l           = C[c, k, l]
#   transport Tq  row d*nq + q            = T_d(x_q)
#   state  Uq     row m*nq + q            = x_m(x_q)        (Newton)
#   grads  Gu     row (d*DIM + m)*nq + q  = d_d x_m (x_q)   (Newton)
# SMEM tables: phi [nq, NL]; dphi row k*nq+q -> dphi[q, :, k];
#   w [1, nq]; mref [NL, NL]; kref row (DIM*k+l)*NL+i -> K[k,l,i,:].
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fem import assembly
from . import winkernel
from .window import build_window_layout
from .winkernel import _LO, _onehots, _gather_dof, _scatter_dof

__all__ = ["WindowLaggedMomentum"]


def _mom_body(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
              tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
              x_hbm, outs, wins, sems, uq_ref, gu_ref,
              *, S, W, C, NL, NQ, DIM, n_rows):
    mass_w = scal_ref[0]
    s_rho = scal_ref[1]
    s_mu = scal_ref[2]
    b = pl.program_id(0)
    rS, A2 = S // _LO, W // _LO
    cps = [
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(m * n_rows + b * rS, A2)], wins[m], sems[m]
        )
        for m in range(DIM)
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    # gather, then DROP the one-hot list (scatter recomputes per-i):
    # keeping all NL (oh_hi, oh_lo) pairs live across the unrolled body
    # costs ~NL*2*C*128 f32 of scoped vmem — part of the measured 16.8M
    # stack overflow on v5e (BENCH_NOTES r3 chain-3)
    ohs = [_onehots(lidx_ref, j, C, A2) for j in range(NL)]
    U = [
        [_gather_dof(wins[m][...], oh, ol) for oh, ol in ohs]
        for m in range(DIM)
    ]
    del ohs

    detj = detj_ref[0, 0]                                    # [C]
    G = [[g_ref[0, DIM * d + k] for k in range(DIM)] for d in range(DIM)]
    Cg = [cg_ref[0, kl] for kl in range(DIM * DIM)]
    Tq = [[tq_ref[0, d * NQ + q] for q in range(NQ)] for d in range(DIM)]
    wd = [w_s[0, q] * detj for q in range(NQ)]               # [C] per q

    # direction values at quadrature points, [C] per (component, q) —
    # needed across components by the reaction term
    vq_all = [
        [sum(phi_s[q, j] * U[m][j] for j in range(NL)) for q in range(NQ)]
        for m in range(DIM)
    ]

    loc = [[None] * NL for _ in range(DIM)]
    for m in range(DIM):
        u = U[m]
        vq = vq_all[m]
        # reference gradients at quadrature points, [C] per (k, q)
        rg = [
            [
                sum(dphi_s[k * NQ + q, j] * u[j] for j in range(NL))
                for q in range(NQ)
            ]
            for k in range(DIM)
        ]
        gv = [
            [
                sum(G[d][k] * rg[k][q] for k in range(DIM))
                for q in range(NQ)
            ]
            for d in range(DIM)
        ]
        # skew convection c(T; v): 0.5 (T.grad v) phi - 0.5 (T.grad phi) v
        wv = [
            wd[q] * 0.5 * sum(Tq[d][q] * gv[d][q] for d in range(DIM))
            for q in range(NQ)
        ]
        wg = [
            [wd[q] * (-0.5) * Tq[d][q] * vq[q] for q in range(NQ)]
            for d in range(DIM)
        ]
        for i in range(NL):
            lm = mass_w * detj * sum(
                mref_s[i, j] * u[j] for j in range(NL)
            )
            conv = sum(wv[q] * phi_s[q, i] for q in range(NQ))
            for d in range(DIM):
                for k in range(DIM):
                    conv = conv + G[d][k] * sum(
                        wg[d][q] * dphi_s[k * NQ + q, i] for q in range(NQ)
                    )
            lm = lm + s_rho * conv
            # stress, component-diagonal part: Cg[k,l] Kref[k,l,i,j] u_j
            st = None
            for k in range(DIM):
                for l in range(DIM):
                    t = Cg[DIM * k + l] * sum(
                        kref_s[(DIM * k + l) * NL + i, j] * u[j]
                        for j in range(NL)
                    )
                    st = t if st is None else st + t
            loc[m][i] = lm + s_mu * st

    # stress coupling: loc[a][i] += s_mu detj G[a,k] G[b,l] K[k,l,j,i] u_b_j
    for k in range(DIM):
        for l in range(DIM):
            for bb in range(DIM):
                for i in range(NL):
                    mb = sum(
                        kref_s[(DIM * k + l) * NL + j, i] * U[bb][j]
                        for j in range(NL)
                    )
                    smb = s_mu * detj * mb
                    for a in range(DIM):
                        loc[a][i] = loc[a][i] + G[a][k] * G[bb][l] * smb

    if uq_ref is not None:
        # Newton reaction c(v; x), skew form:
        #   0.5 [ (v.grad x)_m phi_i - (v.grad phi_i) x_m ]
        # with x the state at quadrature points (uq: row m*NQ+q) and its
        # physical gradient (gu: row (d*DIM+m)*NQ+q holds d_d x_m).
        xq = [[uq_ref[0, m * NQ + q] for q in range(NQ)] for m in range(DIM)]
        for m in range(DIM):
            wt2a = [
                0.5 * wd[q] * sum(
                    vq_all[d][q] * gu_ref[0, (d * DIM + m) * NQ + q]
                    for d in range(DIM)
                )
                for q in range(NQ)
            ]
            ws2 = [
                [0.5 * wd[q] * vq_all[d][q] * xq[m][q] for q in range(NQ)]
                for d in range(DIM)
            ]
            for i in range(NL):
                re = sum(wt2a[q] * phi_s[q, i] for q in range(NQ))
                for d in range(DIM):
                    for k in range(DIM):
                        re = re - G[d][k] * sum(
                            ws2[d][q] * dphi_s[k * NQ + q, i]
                            for q in range(NQ)
                        )
                loc[m][i] = loc[m][i] + s_rho * re

    v = valid_ref[0, 0]
    for i in range(NL):
        oh_i = _onehots(lidx_ref, i, C, A2)
        for m in range(DIM):
            acc = outs[m][0] if i else jnp.zeros((A2, _LO), jnp.float32)
            outs[m][0] = _scatter_dof(acc, loc[m][i] * v, *oh_i)


def _mom_kernel_2d(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
                   tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
                   x_hbm, out0, out1, win0, win1, sem0, sem1, **kw):
    _mom_body(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
              tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
              x_hbm, [out0, out1], [win0, win1], [sem0, sem1],
              None, None, **kw)


def _mom_newton_kernel_2d(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref,
                          cg_ref, tq_ref, uq_ref, gu_ref, phi_s, dphi_s,
                          w_s, mref_s, kref_s, x_hbm, out0, out1,
                          win0, win1, sem0, sem1, **kw):
    _mom_body(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
              tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
              x_hbm, [out0, out1], [win0, win1], [sem0, sem1],
              uq_ref, gu_ref, **kw)


def _mom_kernel_3d(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
                   tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
                   x_hbm, out0, out1, out2, win0, win1, win2,
                   sem0, sem1, sem2, **kw):
    _mom_body(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
              tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
              x_hbm, [out0, out1, out2], [win0, win1, win2],
              [sem0, sem1, sem2], None, None, **kw)


def _mom_newton_kernel_3d(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref,
                          cg_ref, tq_ref, uq_ref, gu_ref, phi_s, dphi_s,
                          w_s, mref_s, kref_s, x_hbm, out0, out1, out2,
                          win0, win1, win2, sem0, sem1, sem2, **kw):
    _mom_body(scal_ref, lidx_ref, valid_ref, detj_ref, g_ref, cg_ref,
              tq_ref, phi_s, dphi_s, w_s, mref_s, kref_s,
              x_hbm, [out0, out1, out2], [win0, win1, win2],
              [sem0, sem1, sem2], uq_ref, gu_ref, **kw)


_KERNELS = {
    (2, False): _mom_kernel_2d,
    (2, True): _mom_newton_kernel_2d,
    (3, False): _mom_kernel_3d,
    (3, True): _mom_newton_kernel_3d,
}


def momentum_tables_apply(lidx, valid, detj, g4, cg4, Tq, sm_tabs,
                          x_flat_pad, scal, *, S, W, C, NL, NQ, DIM, nb,
                          n_rows, interpret=False, Uq=None, Gu=None):
    """Functional window-momentum apply: every blocked table is an
    ARGUMENT, not a captured constant — required by shard_map'ed callers
    (parallel/halo_win.py) whose tables are per-device shards.

    lidx [nb, NL, C] i32; valid/detj [nb, 1, C]; g4/cg4 [nb, DIM^2, C];
    Tq (+Uq/Gu for Newton mode) per fem/winmom.py row layouts;
    sm_tabs = (phi, dphi, w, mref, kref) SMEM scalar tables;
    x_flat_pad [DIM * n_rows * 128] f32 (components at m*n_rows rows);
    scal = [mass_w, s_rho, s_mu] f32. Returns DIM [nb, W] window outputs.
    """
    A2 = W // _LO
    newton = Uq is not None
    kern = functools.partial(
        _KERNELS[(DIM, newton)],
        S=S, W=W, C=C, NL=NL, NQ=NQ, DIM=DIM, n_rows=n_rows,
    )
    state_specs = [pl.BlockSpec((1, DIM * NQ, C), lambda b: (b, 0, 0))]
    state_args = [Tq]
    if newton:
        state_specs += [
            pl.BlockSpec((1, DIM * NQ, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, DIM * DIM * NQ, C), lambda b: (b, 0, 0)),
        ]
        state_args += [Uq, Gu]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NL, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, DIM * DIM, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, DIM * DIM, C), lambda b: (b, 0, 0)),
            *state_specs,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, A2, _LO), lambda b: (b, 0, 0))
            for _ in range(DIM)
        ],
        scratch_shapes=(
            [pltpu.VMEM((A2, _LO), jnp.float32) for _ in range(DIM)]
            + [pltpu.SemaphoreType.DMA for _ in range(DIM)]
        ),
    )
    outs = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((nb, A2, _LO), jnp.float32)
            for _ in range(DIM)
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=winkernel.compiler_params(),
    )(
        scal, lidx, valid, detj, g4, cg4, *state_args, *sm_tabs,
        x_flat_pad.reshape(-1, _LO),
    )
    return [o.reshape(nb, W) for o in outs]


def smem_tables(tab, degree, dim):
    """SMEM scalar tables (phi, dphi, w, mref, kref) for a tabulation."""
    from ..fem.forms import ref_stiffness

    f32 = np.float32
    nq, nl = np.asarray(tab.phi).shape
    dphi = np.asarray(tab.dphi, f32)
    return (
        jnp.asarray(np.asarray(tab.phi, f32)),
        jnp.asarray(np.transpose(dphi, (2, 0, 1)).reshape(dim * nq, nl)),
        jnp.asarray(np.asarray(tab.w, f32).reshape(1, nq)),
        jnp.asarray(np.asarray(assembly.ref_mass(degree, dim), f32)),
        jnp.asarray(
            np.asarray(ref_stiffness(degree, dim), f32).reshape(
                dim * dim * nl, nl
            )
        ),
    )


class WindowLaggedMomentum:
    """Gather-free apply of the momentum volume operator on a vector-P2
    space (2-D triangles or 3-D tets). State convention: [n, DIM] in the
    ORIGINAL numbering (apply handles the permutation; the solve-side fast
    path works directly in permuted coordinates via apply_perm_rows)."""

    def __init__(self, V, dt_s_rho=None, S=None, interpret=False):
        self.V = V
        self.wl = build_window_layout(V, S=S)
        self.interpret = interpret
        wl = self.wl
        geom = assembly.geometry(V.mesh)
        cells = np.asarray(wl.cells, dtype=np.int64)
        f32 = np.float32
        nb = wl.nb
        dim = assembly._dim(V)
        # the kernel's component loops assume velocity components == mesh
        # dim (true for every NS space here; a mismatch would silently
        # drop/alias components)
        assert V.n_components == dim, (V.n_components, dim)
        self.dim = dim
        self.detj = jnp.asarray(
            np.asarray(geom.detJ)[cells], dtype=jnp.float32
        )[:, None, :]
        # [nb, dim^2, C] with row dim*a+k: geometry picks are sublane rows
        g = np.asarray(geom.G)[cells]
        self.G4 = jnp.asarray(
            np.transpose(g, (0, 2, 3, 1)).reshape(nb, dim * dim, -1), f32
        )
        cg = np.asarray(geom.C)[cells]
        self.Cg4 = jnp.asarray(
            np.transpose(cg, (0, 2, 3, 1)).reshape(nb, dim * dim, -1), f32
        )
        self.lidx = jnp.asarray(np.transpose(np.asarray(wl.lidx), (0, 2, 1)))
        self.valid = jnp.asarray(wl.valid, dtype=jnp.float32)[:, None, :]
        self.perm = jnp.asarray(wl.perm.astype(np.int32))
        self.inv = jnp.asarray(wl.inv.astype(np.int32))
        self._cells = jnp.asarray(wl.cells.astype(np.int32))

        tab = assembly.tabulation(V, assembly.CONV_RULE)
        self.tab = tab
        nq, nl = np.asarray(tab.phi).shape
        self.nq = nq
        self.sm_tabs = smem_tables(tab, V.degree, dim)
        self._apply_jit = jax.jit(self._apply_original)

    # -- per-step transport ------------------------------------------------
    def transport_qp(self, T):
        """T [n, DIM] (original numbering) -> Tq [nb, DIM*nq, C] blocked
        (row d*nq+q holds component d at quadrature point q)."""
        return blocked_transport_q(
            self.tab, self._cells, self.wl.nb, self.dim, self.nq,
            self.V.gather(T),
        )

    def state_qp(self, x):
        """x [n, DIM] (original numbering) -> (Tq, Uq, Gu) blocked tables
        for the Newton tangent: values (row m*nq+q) and physical gradients
        (row (d*DIM+m)*nq+q holds d_d x_m) at quadrature points."""
        geom = assembly.geometry(self.V.mesh)
        return blocked_state_q(
            self.tab, self._cells, self.wl.nb, self.dim, self.nq,
            self.V.gather(x), geom.G,
        )

    # -- applies -------------------------------------------------------------
    def _pallas(self, x_flat_pad, Tq, mass_w, s_rho, s_mu, Uq=None, Gu=None):
        wl = self.wl
        return momentum_tables_apply(
            self.lidx, self.valid, self.detj, self.G4, self.Cg4, Tq,
            self.sm_tabs, x_flat_pad,
            jnp.asarray([mass_w, s_rho, s_mu], dtype=jnp.float32),
            S=wl.S, W=wl.W, C=wl.C, NL=self.lidx.shape[1], NQ=self.nq,
            DIM=self.dim, nb=wl.nb, n_rows=wl.n_pad // _LO,
            interpret=self.interpret, Uq=Uq, Gu=Gu,
        )

    def apply_permuted(self, xp, Tq, mass_w, s_rho, s_mu, Uq=None, Gu=None):
        """xp [DIM, n_pad] permuted+padded components -> y same layout."""
        wl = self.wl
        wins = self._pallas(
            xp.reshape(self.dim * wl.n_pad), Tq, mass_w, s_rho, s_mu, Uq, Gu
        )
        return [wl.overlap_add(w, jnp) for w in wins]

    def apply_perm_rows(self, v, Tq, mass_w, s_rho, s_mu, Uq=None, Gu=None):
        """v [n, DIM] in PERMUTED row order -> A v, same layout. The
        zero-permute fast path for solves that live in window coordinates
        (fast.py winkernel lagged/newton branches). With Uq/Gu the apply
        is the full Newton tangent."""
        wl = self.wl
        pad = jnp.zeros(wl.n_pad - wl.n, dtype=jnp.float32)
        xp = jnp.stack([
            jnp.concatenate([v[:, m].astype(jnp.float32), pad])
            for m in range(self.dim)
        ])
        ys = self.apply_permuted(xp, Tq, mass_w, s_rho, s_mu, Uq, Gu)
        return jnp.stack(ys, axis=1).astype(v.dtype)

    def _apply_original(self, x, Tq, mass_w, s_rho, s_mu):
        """x [n, DIM] original numbering -> A x [n, DIM] (volume terms)."""
        wl = self.wl
        pad = jnp.zeros(wl.n_pad - wl.n, dtype=jnp.float32)
        xp = jnp.stack([
            jnp.concatenate(
                [x[:, m].astype(jnp.float32)[self.perm], pad]
            )
            for m in range(self.dim)
        ])
        ys = self.apply_permuted(xp, Tq, mass_w, s_rho, s_mu)
        return jnp.stack(
            [y[self.inv] for y in ys], axis=1
        ).astype(x.dtype)

    def apply(self, x, Tq, mass_w, s_rho, s_mu):
        return self._apply_jit(x, Tq, mass_w, s_rho, s_mu)


# -- shared blocked-table builders (single-chip methods above and the
#    distributed per-device path in parallel/halo_win.py both delegate
#    here so the kernel row-layout conventions live in one place) ----------
def blocked_transport_q(tab, cells, nb, dim, nq, Tloc):
    """Local dof values Tloc [nc, NL, DIM] -> Tq [nb, DIM*nq, C] blocked
    (row m*nq+q holds component m at quadrature point q)."""
    Xq = assembly.values_at_qp(tab, Tloc)  # [nc, nq, DIM]
    Tqb = jnp.asarray(Xq, jnp.float32)[cells]  # [nb, C, nq, DIM]
    return jnp.transpose(Tqb, (0, 3, 2, 1)).reshape(nb, dim * nq, -1)


def blocked_state_q(tab, cells, nb, dim, nq, Xloc, G):
    """(Tq, Uq, Gu) blocked Newton tables from local dof values Xloc
    [nc, NL, DIM] and geometry G [nc, dim, dim]. Gu row (d*DIM+m)*nq+q
    holds d_d x_m at quadrature point q; Uq shares Tq's layout."""
    Tq = blocked_transport_q(tab, cells, nb, dim, nq, Xloc)
    # reference gradients -> physical: d_d x_m = G[d,k] dphi[q,j,k] X[j,m]
    dphi = jnp.asarray(np.asarray(tab.dphi, np.float32))  # [nq, NL, dim]
    rgrad = jnp.einsum("cjm,qjk->cqkm", Xloc.astype(jnp.float32), dphi)
    gU = jnp.einsum(
        "cdk,cqkm->cdmq", jnp.asarray(G, jnp.float32), rgrad
    )  # [nc, d, m, q]
    Gub = gU[cells]  # [nb, C, d, m, q]
    Gu = jnp.transpose(Gub, (0, 2, 3, 4, 1)).reshape(nb, dim * dim * nq, -1)
    return Tq, Tq, Gu
