# Padded-ELL sparse operators for CONSTANT bilinear forms.
#
# The matrix-free quadrature path (assembly.stiffness_apply) evaluates
#   gather(x) -> per-cell einsum -> dof_sum (a second gather)
# per apply. For operators whose matrix never changes (the pressure-Poisson
# stiffness, multigrid level operators, mass matrices), assembling once into
# a padded ELL table turns every apply into ONE row-gather x[cols] plus a
# vals*rows contraction — about half the HBM traffic and no intermediate
# [nc, nl] materialization. This is the TPU analog of PETSc's assembled AIJ
# operators on the solver hot path (reference pressure solve:
# /root/reference/flow/navier_stokes/pressure_correction.py:407-419), kept
# static-shape (padded rows + masked columns) so it jits cleanly.
#
# Rows are kept in dof order (locality follows the mesh numbering — pair
# with RCM ordering for banded gathers).
#
# Layouts: XLA:TPU tiles the minor-most two axes of every array to (8, 128),
# so the natural row layout [n, K] pads its K~7..28 minor dim to 128 lanes —
# every apply then STREAMS 4..18x more HBM bytes of cols/vals than logical
# (the round-3 tile-padding discovery, BENCH_NOTES). The "lane" layout
# stores cols/vals transposed [K, n] (n minor — tile-friendly) and unrolls
# the K-term contraction into K lane-parallel fused multiply-adds.
# FLOW_ELL_LAYOUT={row,lane} selects the default at construction.
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .spaces import FunctionSpace

__all__ = ["ELLMatrix", "ell_from_local", "ell_stiffness", "ell_scaled_ZtMZ"]


class ELLMatrix:
    """Static-shape padded ELL matrix: cols [n, K] int32, vals [n, K]
    (constructor inputs are always row layout; `layout="lane"` stores them
    transposed [K, n] internally — see module header).

    Padding entries have col=0, val=0 (they multiply row 0 harmlessly).
    apply(x) supports x [n] or [n, m] (component-diagonal vector apply).
    """

    def __init__(self, cols, vals, dtype, valid=None, layout=None):
        self.layout = layout or os.environ.get("FLOW_ELL_LAYOUT", "row")
        assert self.layout in ("row", "lane"), self.layout
        self.n, self.width = cols.shape
        if self.layout == "lane":
            cols = np.asarray(cols).T.copy()
            vals = np.asarray(vals).T.copy()
            valid = None if valid is None else np.asarray(valid).T.copy()
        self.cols = jnp.asarray(cols)
        self.vals = jnp.asarray(vals, dtype=dtype)
        # slot-validity mask: padding slots carry cols==0, and row 0's
        # padding would otherwise alias its diagonal test if external vals
        # violate the zero-padding invariant
        self._valid = None if valid is None else jnp.asarray(valid)

    def apply(self, x):
        if self.layout == "lane":
            # K unrolled lane-parallel FMAs; each term gathers an [n] vector
            # from an [n] array — no [n, K] tile-padded operand anywhere
            ext = (slice(None),) + (None,) * (x.ndim - 1)
            acc = self.vals[0][ext] * x[self.cols[0]]
            for k in range(1, self.width):
                acc = acc + self.vals[k][ext] * x[self.cols[k]]
            return acc
        xg = x[self.cols]  # [n, K(,m)]
        if x.ndim == 1:
            return jnp.einsum("nk,nk->n", self.vals, xg)
        return jnp.einsum("nk,nkm->nm", self.vals, xg)

    def diag(self):
        """Operator diagonal (for Jacobi/Chebyshev smoothers)."""
        rng = jnp.arange(self.n, dtype=self.cols.dtype)
        eye = self.cols == (rng[None, :] if self.layout == "lane" else rng[:, None])
        if self._valid is not None:
            eye = jnp.logical_and(eye, self._valid)
        return jnp.sum(jnp.where(eye, self.vals, 0.0),
                       axis=0 if self.layout == "lane" else 1)

    def __call__(self, x):
        return self.apply(x)


def ell_from_local(space: FunctionSpace, loc) -> ELLMatrix:
    """Assemble element matrices loc [nc, nl, nl] into an ELLMatrix.

    Host-side, one-time: duplicate (row, col) pairs are summed; rows are
    padded to the max row valence.
    """
    loc = np.asarray(loc, dtype=np.float64)
    cd = space.cell_dofs_np.astype(np.int64)
    nl = cd.shape[1]
    n = space.n_dofs
    rows = np.repeat(cd, nl, axis=1).ravel()  # i index varies slower
    cols = np.tile(cd, (1, nl)).ravel()
    vals = loc.reshape(len(cd), nl * nl).ravel()

    # sum duplicates via lexicographic sort on (row, col)
    key = rows * n + cols
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    vals_s = vals[order]
    uniq, start = np.unique(key_s, return_index=True)
    sums = np.add.reduceat(vals_s, start)
    r = (uniq // n).astype(np.int64)
    c = (uniq % n).astype(np.int64)

    counts = np.bincount(r, minlength=n)
    width = int(counts.max())
    pos = np.arange(len(r)) - np.concatenate([[0], np.cumsum(counts)])[r]
    cols_pad = np.zeros((n, width), dtype=np.int32)
    vals_pad = np.zeros((n, width), dtype=np.float64)
    cols_pad[r, pos] = c
    vals_pad[r, pos] = sums
    valid = np.arange(width)[None, :] < counts[:, None]
    return ELLMatrix(cols_pad, vals_pad, space.mesh.dtype, valid=valid)


def ell_stiffness(space: FunctionSpace, geom, coeff=None) -> ELLMatrix:
    """Assembled stiffness K_ij = int c grad(phi_i).grad(phi_j) as ELL
    (identical values to assembly.stiffness_apply — exact factored tensors)."""
    from . import assembly
    from ..utils.hostsetup import setup_on_cpu

    with setup_on_cpu():
        loc = assembly.stiffness_local(space, geom, coeff=coeff)
    return ell_from_local(space, np.asarray(loc))


def ell_scaled_ZtMZ(space: FunctionSpace, loc) -> ELLMatrix:
    """Generic: assemble any precomputed element matrices (e.g. multigrid
    Galerkin level operators) into ELL."""
    return ell_from_local(space, loc)


# ---------------------------------------------------------------------------
# ELL graph + on-device assembly (the state-dependent-operator path)
# ---------------------------------------------------------------------------
class ELLGraph:
    """Sparsity structure of the scalar dof-connectivity graph as padded ELL,
    plus gather tables that let element tensors be assembled ON DEVICE
    without any scatter in the compiled graph.

    This is what makes a per-Newton-iteration ASSEMBLED momentum Jacobian
    viable on TPU: the graph and source tables are host-precomputed once;
    each rebuild is a handful of gathers + adds, amortized over the ~2
    matvecs/Krylov-iteration x O(10) iterations that then run as cheap
    row-gather ELL applies (the TPU analog of PETSc's
    MatSetValues+assembled AIJ inside SNES; reference Newton:
    /root/reference/flow/navier_stokes/pressure_correction.py:224-254).
    """

    def __init__(self, space: FunctionSpace):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(space)

    def _build(self, space: FunctionSpace):
        cd = space.cell_dofs_np.astype(np.int64)
        nc, nl = cd.shape
        n = space.n_dofs
        # the gather tables below store flat element-entry indices
        # (0..nc*nl*nl) as int32; a 3-D P2 problem near ~200M cells would
        # silently overflow and corrupt assembly
        assert nc * nl * nl < 2**31, (
            f"ELLGraph gather tables need int64: nc*nl^2 = {nc * nl * nl} "
            f">= 2^31 (nc={nc}, nl={nl})"
        )
        rows = np.repeat(cd, nl, axis=1).ravel()
        cols = np.tile(cd, (1, nl)).ravel()
        key = rows * n + cols
        uniq, inv = np.unique(key, return_inverse=True)
        r = (uniq // n).astype(np.int64)
        c = (uniq % n).astype(np.int64)
        counts = np.bincount(r, minlength=n)
        width = int(counts.max())
        pos = np.arange(len(r)) - np.concatenate([[0], np.cumsum(counts)])[r]
        cols_pad = np.zeros((n, width), dtype=np.int32)
        cols_pad[r, pos] = c
        # slot-validity mask (diag() correctness does not depend on the
        # zero-padding invariant of externally-constructed vals)
        self._valid = jnp.asarray(np.arange(width)[None, :] < counts[:, None])
        # row-class split for apply(): P2 vertex rows are ~2x wider than
        # edge-midpoint rows (valence ~17-25 vs <=9), and TPU gathers are
        # row-count-bound — one table padded to the global max gathers
        # ~1.9x more rows than exist. Dof numbering puts vertices first
        # (FunctionSpace._build), so apply() slices the SAME [n, W] value
        # layout into [:nv, :W] and [nv:, :We] — assemble() is unchanged.
        nv = space.mesh.n_points if space.degree == 2 else n
        self.n_vert = int(nv)
        self.w_edge = int(counts[nv:].max()) if nv < n else 0
        # flat destination slot for every (cell, i, j) entry
        slot_of_uniq = (r * width + pos).astype(np.int32)
        self.dest_np = slot_of_uniq[inv].reshape(nc, nl, nl)
        self.cols_np = cols_pad
        self.cols = jnp.asarray(cols_pad)
        self.n, self.width = n, width
        self.n_local = nl

        # gather-based device assembly (TPU executes scatter-adds serially —
        # measured ~100 ms per rebuild at 26k cells — so the scatter is
        # turned into gathers, the same trick as FunctionSpace.dof_sum):
        # each occupied ELL slot gathers its source element-tensor entries
        # from a padded flat buffer; slots are multiplicity-split (almost
        # all have <= 2 sources, diagonal slots have up to the dof valence);
        # one final permutation gather lays results out in [n, W] order.
        n_entries = nc * nl * nl
        U = len(uniq)
        mult = np.bincount(inv, minlength=U)
        order2 = np.argsort(inv, kind="stable").astype(np.int64)
        lo = mult <= 2
        maxhi = int(mult.max()) if U else 1

        def src_table_v(sel, w):
            ids = np.nonzero(sel)[0]
            if len(ids) == 0:
                return ids, np.full((0, w), n_entries, dtype=np.int32)
            sub = np.isin(inv[order2], ids)
            src = order2[sub]
            owner = inv[order2][sub]
            remap = np.full(U, -1, dtype=np.int64)
            remap[ids] = np.arange(len(ids))
            rowpos = np.arange(len(src)) - np.concatenate(
                [[0], np.cumsum(mult[ids])]
            )[remap[owner]]
            tab = np.full((len(ids), w), n_entries, dtype=np.int32)
            tab[remap[owner], rowpos] = src
            return ids, tab

        ids_lo, tab_lo = src_table_v(lo, 2)
        ids_hi, tab_hi = src_table_v(~lo, maxhi)
        # permutation: concat(res_lo, res_hi, zero-pad) -> [n*W] slot order
        perm_src = np.full(n * width, len(ids_lo) + len(ids_hi), dtype=np.int32)
        perm_src[slot_of_uniq[ids_lo]] = np.arange(len(ids_lo))
        perm_src[slot_of_uniq[ids_hi]] = len(ids_lo) + np.arange(len(ids_hi))
        self._tab_lo = jnp.asarray(tab_lo)
        self._tab_hi = jnp.asarray(tab_hi)
        self._perm = jnp.asarray(perm_src)
        # class-split permutation (same motivation as apply(): the edge-row
        # slots beyond w_edge are all padding, ~47% of n*W on P2 — skip
        # gathering them and pad with a cheap bandwidth write instead)
        if 0 < self.w_edge < width and self.n_vert < n:
            pm = perm_src.reshape(n, width)
            self._perm_v = jnp.asarray(pm[: self.n_vert].ravel())
            self._perm_e = jnp.asarray(pm[self.n_vert :, : self.w_edge].ravel())
        else:
            self._perm_v = None
            self._perm_e = None

    def assemble_np(self, loc):
        """Host (numpy) assembly of element tensors — for constant operator
        parts precomputed at setup time. Same output layout as assemble()."""
        loc = np.asarray(loc)
        if loc.ndim == 3:
            flat = np.zeros(self.n * self.width, dtype=loc.dtype)
            np.add.at(flat, self.dest_np.ravel(), loc.ravel())
            return flat.reshape(self.n, self.width)
        m = loc.shape[-1]
        flat = np.zeros((self.n * self.width, m, m), dtype=loc.dtype)
        np.add.at(flat, self.dest_np.ravel(), loc.reshape(-1, m, m))
        return flat.reshape(self.n, self.width, m, m)

    def assemble(self, loc):
        """Element tensors -> padded ELL values, on device — pure gathers
        (multiplicity-split source tables + one permutation gather; no
        scatter in the compiled graph). Padding slots come out exactly zero
        (apply() relies on this zero-padding invariant).

        loc [nc, nl, nl]        -> vals [n, W]
        loc [nc, nl, nl, m, m]  -> vals [n, W, m, m]  (component blocks)
        """
        block = loc.shape[3:]
        flat = loc.reshape((-1,) + block)
        pad = jnp.zeros((1,) + block, dtype=loc.dtype)
        flat = jnp.concatenate([flat, pad], axis=0)
        r_lo = flat[self._tab_lo].sum(axis=1)  # [n_lo(,m,m)]
        r_hi = flat[self._tab_hi].sum(axis=1)  # [n_hi(,m,m)]
        cat = jnp.concatenate([r_lo, r_hi, pad], axis=0)
        if self._perm_v is not None:
            nv, w, we = self.n_vert, self.width, self.w_edge
            out_v = cat[self._perm_v].reshape((nv, w) + block)
            out_e = cat[self._perm_e].reshape((self.n - nv, we) + block)
            padw = [(0, 0), (0, w - we)] + [(0, 0)] * len(block)
            return jnp.concatenate([out_v, jnp.pad(out_e, padw)], axis=0)
        out = cat[self._perm]
        return out.reshape((self.n, self.width) + block)

    def apply(self, vals, x):
        """vals [n,W] @ x [n(,m)] or vals [n,W,m,m] @ x [n,m].

        One row-gather x[cols] plus a small contraction — the whole point:
        ~2 HBM reads per nonzero vs the quadrature pipeline's
        gather -> einsum chain -> dof-sum per apply. Vertex and edge row
        classes are gathered at their own widths (see _build)."""
        nv, we = self.n_vert, self.w_edge
        if 0 < we < self.width and nv < self.n:
            return jnp.concatenate(
                [
                    self._apply_rows(vals[:nv], self.cols[:nv], x),
                    self._apply_rows(vals[nv:, :we], self.cols[nv:, :we], x),
                ],
                axis=0,
            )
        return self._apply_rows(vals, self.cols, x)

    @staticmethod
    def _apply_rows(vals, cols, x):
        xg = x[cols]
        if vals.ndim == 2:
            if x.ndim == 1:
                return jnp.einsum("nk,nk->n", vals, xg)
            return jnp.einsum("nk,nkm->nm", vals, xg)
        return jnp.einsum("nkab,nkb->na", vals, xg)

    def diag(self, vals):
        """Block diagonal: [n] from [n,W], [n,m] from [n,W,m,m]."""
        eye = self.cols == jnp.arange(self.n, dtype=self.cols.dtype)[:, None]
        eye = jnp.logical_and(eye, self._valid)
        if vals.ndim == 2:
            return jnp.sum(jnp.where(eye, vals, 0.0), axis=1)
        d = jnp.einsum("nkaa->nka", vals)
        return jnp.sum(jnp.where(eye[:, :, None], d, 0.0), axis=1)


class FacetMassELL:
    """Per-step device assembly of a weighted facet mass term into the cell
    ELL graph: given per-facet-qp weights s [nb, nq],

        vals[i, j] += sum_f sum_q  wl[f,q] s[f,q] phi_i(x_q) phi_j(x_q)

    Used for the directional do-nothing ds-Jacobian 0.5 rho (T.n)+ (u, v) ds
    of the semi-implicit momentum operator, whose weight follows the lagged
    transport each step. The scatter-add is O(nb * nl^2) — surface-sized —
    so a plain XLA scatter is fine here (unlike the volume assembly, which
    ELLGraph turns into gathers)."""

    def __init__(self, graph: ELLGraph, btab, dtype):
        phi = np.asarray(btab.phi, dtype=np.float64)  # [f, q, i]
        wl = np.asarray(btab.wl, dtype=np.float64)  # [f, q]
        cells = np.asarray(btab.cells)
        core = np.einsum("fq,fqi,fqj->fqij", wl, phi, phi)
        self._core = jnp.asarray(core, dtype=dtype)
        self._dest = jnp.asarray(graph.dest_np[cells].reshape(-1))
        self._n, self._w = graph.n, graph.width

    def assemble(self, s):
        """s [nb, nq] -> vals [n, W] (zero outside boundary-cell slots)."""
        el = jnp.einsum("fqij,fq->fij", self._core, s)
        flat = jnp.zeros(self._n * self._w, dtype=el.dtype)
        flat = flat.at[self._dest].add(el.reshape(-1))
        return flat.reshape(self._n, self._w)


def momentum_const_ell(V: FunctionSpace, geom, graph: ELLGraph):
    """Constant (state-independent) ELL pieces of the momentum Jacobian
    J = M delta_ab + (dt/rho) w_im [rho J_conv(u) + mu J_visc]:

      mass_vals  [n, W]        M_ij = int phi_i phi_j
      visc1_vals [n, W]        int grad phi_i . grad phi_j   (delta_ab part)
      visc2_vals [n, W, d, d]  int d_a phi_j d_b phi_i       (grad-transpose
                               part of the stress form mu (grad u + grad u^T))

    Host-side numpy, chunked over cells to bound the [nc, nl, nl, d, d]
    intermediate. Element tensors match fem/forms.py sym_grad_loc/mass_loc
    exactly (same factored reference tensors)."""
    from . import assembly

    Mref = assembly.ref_mass(V.degree, assembly._dim(V))
    Kref = assembly.ref_stiffness(V.degree, assembly._dim(V))
    detJ = np.asarray(geom.detJ, dtype=np.float64)
    C = np.asarray(geom.C, dtype=np.float64)
    G = np.asarray(geom.G, dtype=np.float64)
    nc = detJ.shape[0]
    d = G.shape[1]
    nl = graph.n_local

    mass_vals = graph.assemble_np(Mref[None, :, :] * detJ[:, None, None])
    visc1_vals = graph.assemble_np(np.einsum("ekl,klij->eij", C, Kref))

    visc2_vals = np.zeros((graph.n * graph.width, d, d))
    chunk = max(1, 50_000_000 // (nl * nl * d * d * 8))
    for s in range(0, nc, chunk):
        e = min(nc, s + chunk)
        el = np.einsum(
            "e,eak,ebl,klji->eijab", detJ[s:e], G[s:e], G[s:e], Kref
        )
        np.add.at(
            visc2_vals, graph.dest_np[s:e].ravel(), el.reshape(-1, d, d)
        )
    return mass_vals, visc1_vals, visc2_vals.reshape(graph.n, graph.width, d, d)


def momentum_bnd_stress_ell_vals(V: FunctionSpace, geom, btab, graph: ELLGraph):
    """Constant ELL values of the boundary stress-term Jacobian: the ds-term
    mu (grad u)^T n in the momentum residual (pressure_correction.
    _rhs_weak_bnd) is LINEAR in u, so its Jacobian

        B[f, i, j, a, b] = int_facet phi_i (d_a phi_j) n_b ds

    assembles once (host numpy) into the cell ELL graph [n, W, d, d]; the
    stepper adds it scaled by the scheme/viscosity factor at runtime. (The
    nonlinear directional do-nothing term is the only ds Jacobian left
    out.)"""
    phi = np.asarray(btab.phi, dtype=np.float64)
    dphi = np.asarray(btab.dphi, dtype=np.float64)
    wl = np.asarray(btab.wl, dtype=np.float64)
    nrm = np.asarray(btab.normals, dtype=np.float64)
    cells = np.asarray(btab.cells)
    Gb = np.asarray(geom.G, dtype=np.float64)[cells]

    gphi = np.einsum("fqjk,fak->fqja", dphi, Gb)
    core = np.einsum("fq,fqi,fqja->fija", wl, phi, gphi)  # [nb,i,j,a]
    el = core[:, :, :, :, None] * nrm[:, None, None, None, :]  # [nb,i,j,a,b]
    d = el.shape[-1]
    vals = np.zeros((graph.n * graph.width, d, d))
    np.add.at(vals, graph.dest_np[cells].ravel(), el.reshape(-1, d, d))
    return vals.reshape(graph.n, graph.width, d, d)
