# Distributed (halo-path) window kernels: per-device gather-free momentum
# matvecs inside shard_map.
#
# Each device builds a WindowLayout (fem/window.py) over its EXTENDED
# local dof set (owned + halo + dummy slots, HaloSpace numbering). Because
# a shard_map body is one program for every device, the per-device blocked
# tables are stacked with COMMON static shape (S, W, nb, C = maxima over
# devices; shorter devices padded with valid=0 blocks) and ride through
# shard_map as sharded arguments — the kernel (fem/winmom.py
# momentum_tables_apply) takes every table as an argument precisely so
# this works. The matvec then is:
#     fwd halo exchange -> per-device window kernel -> bwd exchange,
# replacing the gather -> einsum forms -> dof_sum chain of the einsum
# halo path (parallel/halo_step.py _substep_core). Boundary ds-terms
# (O(surface)) stay einsum.
from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp

from ..fem import assembly
from .window import build_window_layout, overlap_add_fn
from .winmom import (
    _LO,
    blocked_state_q,
    blocked_transport_q,
    momentum_tables_apply,
    smem_tables,
)
from ..fem.assembly import CONV_RULE

__all__ = ["build_halo_window_tables", "halo_window_momentum",
           "halo_transport_q", "halo_state_q"]


def build_halo_window_tables(Vh, detJ_np, G_np, C_np, dim):
    """Host-side: per-device window layouts over the extended dof sets,
    padded to common shapes and stacked for axis-0 sharding.

    Vh: HaloSpace of the velocity space; detJ/G/C: numpy geometry in
    cell_order with global padding ([ntot, ...], ntot = ndev * c_per).
    Returns (meta dict of Python ints, dict of stacked arrays)."""
    ndev, c_per, n_ext = Vh.ndev, Vh.c_loc, Vh.n_ext
    cd_ext = np.asarray(Vh.cell_dofs_ext_np)  # [ndev, c_per, nl]
    dummy = Vh.dummy
    nl = cd_ext.shape[2]
    f32, i32 = np.float32, np.int32

    shims, reals = [], []
    empty = np.zeros(ndev, dtype=bool)
    for d in range(ndev):
        cd_d = cd_ext[d]
        real = np.where(~np.all(cd_d == dummy, axis=1))[0]
        if len(real) == 0:
            # device owns only padding cells (tiny mesh over many devices —
            # the einsum halo path supports this); emit one fully-masked
            # block so the stacked shapes stay uniform
            empty[d] = True
            real = np.zeros(1, dtype=np.int64)
        reals.append(real)
        shims.append(
            SimpleNamespace(cell_dofs_np=cd_d[real], n_dofs=n_ext)
        )
    tmp = [build_window_layout(s) for s in shims]
    S = max(w.S for w in tmp)
    # the RCM dof permutation is S-independent: reuse it when re-bucketing
    # a device at the fleet-wide S
    wls = [
        w if w.S == S else build_window_layout(s, S=S, rcm=(w.perm, w.inv))
        for w, s in zip(tmp, shims)
    ]
    W = max(w.W for w in wls)
    nb = max(w.nb for w in wls)
    C = max(w.C for w in wls)

    lidx = np.zeros((ndev, nb, nl, C), i32)
    valid = np.zeros((ndev, nb, 1, C), f32)
    cells = np.zeros((ndev, nb, C), i32)
    detj = np.zeros((ndev, nb, 1, C), f32)
    g4 = np.zeros((ndev, nb, dim * dim, C), f32)
    cg4 = np.zeros((ndev, nb, dim * dim, C), f32)
    perm = np.zeros((ndev, n_ext), i32)
    inv = np.zeros((ndev, n_ext), i32)
    for d, w in enumerate(wls):
        nb_d, C_d = w.nb, w.C
        lidx[d, :nb_d, :, :C_d] = np.transpose(np.asarray(w.lidx), (0, 2, 1))
        if not empty[d]:
            valid[d, :nb_d, 0, :C_d] = w.valid
        loc_cells = reals[d][np.asarray(w.cells, dtype=np.int64)]
        cells[d, :nb_d, :C_d] = loc_cells
        sl = slice(d * c_per, (d + 1) * c_per)
        detj[d, :nb_d, 0, :C_d] = np.asarray(detJ_np)[sl][loc_cells]
        gG = np.asarray(G_np)[sl][loc_cells]  # [nb_d, C_d, dim, dim]
        g4[d, :nb_d, :, :C_d] = np.transpose(gG, (0, 2, 3, 1)).reshape(
            nb_d, dim * dim, C_d
        )
        gC = np.asarray(C_np)[sl][loc_cells]
        cg4[d, :nb_d, :, :C_d] = np.transpose(gC, (0, 2, 3, 1)).reshape(
            nb_d, dim * dim, C_d
        )
        perm[d] = w.perm
        inv[d] = w.inv

    n_pad = nb * S + W
    tab = assembly.tabulation(Vh.space, CONV_RULE)
    nq = int(np.asarray(tab.phi).shape[0])
    meta = dict(
        S=S, W=W, nb=nb, C=C, NL=nl, NQ=nq, DIM=dim,
        n_pad=n_pad, n_rows=n_pad // _LO, n_ext=n_ext,
    )
    tabs = dict(
        lidx=jnp.asarray(lidx.reshape(ndev * nb, nl, C)),
        valid=jnp.asarray(valid.reshape(ndev * nb, 1, C)),
        detj=jnp.asarray(detj.reshape(ndev * nb, 1, C)),
        g4=jnp.asarray(g4.reshape(ndev * nb, dim * dim, C)),
        cg4=jnp.asarray(cg4.reshape(ndev * nb, dim * dim, C)),
        cells=jnp.asarray(cells.reshape(ndev * nb, C)),
        perm=jnp.asarray(perm.reshape(ndev * n_ext)),
        inv=jnp.asarray(inv.reshape(ndev * n_ext)),
    )
    return meta, tabs, smem_tables(tab, Vh.space.degree, dim), tab


def halo_transport_q(meta, tab, cells, cd_V, T_ext):
    """Blocked transport at quadrature points, per device (in-shard):
    T_ext [n_ext, DIM] -> Tq [nb, DIM*nq, C]."""
    return blocked_transport_q(
        tab, cells, meta["nb"], meta["DIM"], meta["NQ"], T_ext[cd_V]
    )


def halo_state_q(meta, tab, cells, cd_V, G_cells, x_ext):
    """(Tq, Uq, Gu) blocked Newton tables, per device (in-shard).
    G_cells [c_per, dim, dim] is the device's geometry shard."""
    return blocked_state_q(
        tab, cells, meta["nb"], meta["DIM"], meta["NQ"], x_ext[cd_V], G_cells
    )


def halo_window_momentum(meta, sm_tabs, t, v_ext, Tq, mass_w, s_rho, s_mu,
                         Uq=None, Gu=None, interpret=False):
    """Per-device gather-free momentum volume apply on EXTENDED state:
    v_ext [n_ext, DIM] -> A v [n_ext, DIM] (element contributions; caller
    does the bwd halo exchange). t = per-device table shards."""
    n_ext, DIM, n_pad = meta["n_ext"], meta["DIM"], meta["n_pad"]
    perm, inv = t["perm"], t["inv"]
    pad = jnp.zeros(n_pad - n_ext, jnp.float32)
    xp = jnp.concatenate(
        [
            jnp.concatenate([v_ext[:, m].astype(jnp.float32)[perm], pad])
            for m in range(DIM)
        ]
    )
    outs = momentum_tables_apply(
        t["lidx"], t["valid"], t["detj"], t["g4"], t["cg4"], Tq, sm_tabs,
        xp, jnp.asarray([mass_w, s_rho, s_mu], dtype=jnp.float32),
        S=meta["S"], W=meta["W"], C=meta["C"], NL=meta["NL"],
        NQ=meta["NQ"], DIM=DIM, nb=meta["nb"], n_rows=meta["n_rows"],
        interpret=interpret, Uq=Uq, Gu=Gu,
    )
    return jnp.stack(
        [
            overlap_add_fn(o, meta["S"], meta["W"], n_ext, jnp)[inv]
            for o in outs
        ],
        axis=1,
    ).astype(v_ext.dtype)
