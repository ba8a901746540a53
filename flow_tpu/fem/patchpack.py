# Lane-packed patch layout — the TPU-tiled twin of fem/patch.py.
#
# MEASURED MOTIVATION (round 4, real v5e): the generic patch layout removed
# the row-gather wall (pressure Poisson 494 -> 213 ms at 1.9M DoF) but its
# cell arrays keep the einsum path's [ncp, nl, m] shape — TPU tiles the two
# minor dims to (8, 128), so (6, 2)-shaped minors pad ~21x and the residual
# assembly stayed at ~0.017 GDoF/s. This module applies the repo's proven
# packed recipe (fem/packed.py: 1-D lane vectors, small axes unrolled in
# Python) to the patch structure:
#
#   * planes are stored [a, b, C] — lattice axes LEADING (windows = plain
#     slices on untiled leading dims), the big patch axis C on the LANES.
#     Tile padding is (a pad to sublanes) x (C pad to 128): ~1.1-1.25x,
#     independent of the lattice size.
#   * every cell-local quantity is a separate [n, n, C] array; the local
#     dof / quadrature / component axes are unrolled in Python, so no
#     array ever has a small minor dimension.
#   * scalar state is one flat 1-D vector (concatenated plane ravels);
#     vector state is component-major flat [2 * n_flat] (packed.py's
#     convention) — Krylov/axpy code sees plain vectors.
#   * the seam exchange is ROW-STRUCTURED: patch-lattice sides are slices,
#     neighbor sides are ONE gather of 3C rows (each a full lattice side),
#     and only the 3C patch corners use element-granular scatter. The
#     generic layout's O(C*n)-element seam gather (its measured residual
#     cost) collapses to O(C) rows.
#
# Replaces (for meshes with refinement structure) the hot operator applies
# of the reference's native stack: DOLFIN assembly + PETSc SpMV
# (/root/reference/flow/navier_stokes/pressure_correction.py:258-465).
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .patch import PatchInfo, PatchGeom

__all__ = ["PackedLayout", "PackedPatch"]


def _parity_blocks(vmap):
    """[C, 2n+1, 2n+1] doubled-lattice map -> the four parity blocks
    (EE, EO, OE, OO), each [C, a, b]."""
    return (
        vmap[:, ::2, ::2],
        vmap[:, ::2, 1::2],
        vmap[:, 1::2, ::2],
        vmap[:, 1::2, 1::2],
    )


class PackedLayout:
    """Index structures of one packed scalar layout.

    planes: list of (a, b); plane p is stored [a, b, C], flattened in
    C-minor order. Window specs win[type][l] = (plane, oa, ob) with extent
    (nct, nct) — identical lattice combinatorics to fem/patch.PatchLayout,
    transposed storage.
    """

    def __init__(self, C, nct, planes, win, Lblocks, n_dofs, coarse_cells,
                 dtype):
        from ..utils.hostsetup import setup_on_cpu

        self.C = C
        self.nct = nct
        self.planes = planes
        self.win = win
        self.n_dofs = n_dofs
        sizes = [a * b * C for a, b in planes]
        self.offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        self.n_flat = int(self.offsets[-1])

        # flat global-dof map in PACKED order ([a, b, C] ravel per plane)
        L = np.concatenate(
            [blk.transpose(1, 2, 0).ravel() for blk in Lblocks]
        ).astype(np.int64)
        self.L = L
        valid = L >= 0
        self.valid = valid
        Lv = L[valid]
        counts = np.bincount(Lv, minlength=n_dofs)
        assert counts.min() >= 1
        w = np.zeros(self.n_flat)
        w[valid] = 1.0 / counts[Lv]
        self.weight = w
        idx = np.where(valid)[0]
        slot = np.empty(n_dofs, dtype=np.int64)
        slot[L[idx[::-1]]] = idx[::-1]
        self.slot_of_dof = slot.astype(np.int32)

        self._build_seam(coarse_cells, Lblocks)

        with setup_on_cpu():
            self.weight_j = jnp.asarray(w, dtype=dtype)
            self.valid_j = jnp.asarray(valid.astype(np.float64), dtype=dtype)
            self.slot_of_dof_j = jnp.asarray(self.slot_of_dof)
            self._nbr_j = jnp.asarray(self._nbr)
            self._flip_j = jnp.asarray(self._flip)
            self._corner_slots_j = jnp.asarray(self._corner_slots)
            self._corner_group_j = jnp.asarray(self._corner_group)

    # -- seam topology -------------------------------------------------------
    def _build_seam(self, cells, Lblocks):
        """Side-neighbor tables. Sides of patch c (lattice n = nct cells):
          side 0: J=0 row,  endpoints a0 -> a1   (t = i)
          side 1: I=0 col,  endpoints a0 -> a2   (t = j)
          side 2: hyp (i, n-i), endpoints a1 -> a2  (t = n - i = j)
        Neighbor = the other coarse cell sharing the coarse edge; flip when
        the two traversals run opposite. Boundary sides point at the zero
        pad row (index 3C)."""
        C = self.C
        a0, a1, a2 = cells[:, 0], cells[:, 1], cells[:, 2]
        side_pairs = np.stack(
            [
                np.stack([a0, a1], 1),
                np.stack([a0, a2], 1),
                np.stack([a1, a2], 1),
            ],
            axis=0,
        )  # [3, C, 2] ordered endpoint pairs
        key = np.sort(side_pairs, axis=2)
        nvert = int(cells.max()) + 1
        kflat = (
            key[:, :, 0].astype(np.int64) * nvert + key[:, :, 1]
        ).reshape(-1)  # [3C] in (side, cell) order
        order = np.argsort(kflat, kind="stable")
        ks = kflat[order]
        nbr = np.full(3 * C, 3 * C, dtype=np.int32)  # default: pad row
        flip = np.zeros(3 * C, dtype=bool)
        i = 0
        sp_flat = side_pairs.reshape(-1, 2)
        while i < len(ks):
            j = i + 1
            while j < len(ks) and ks[j] == ks[i]:
                j += 1
            if j - i == 2:
                x, y = order[i], order[j - 1]
                nbr[x], nbr[y] = y, x
                fl = bool(np.all(sp_flat[x] == sp_flat[y][::-1]))
                flip[x] = flip[y] = fl
            else:
                assert j - i == 1, "coarse edge shared by >2 cells"
            i = j
        # (side, cell) flat order: row index = s * C + c
        self._nbr = nbr
        self._flip = flip

        # corner replicas: EE-plane corners (0,0), (n,0), (0,n) of every
        # patch, grouped by coarse vertex
        n = self.nct
        EE = Lblocks[0]  # [C, n+1, n+1] global ids
        # packed flat index of EE[c, i, j] = off0 + (i*(n+1) + j)*C + c
        off0 = int(self.offsets[0])
        b0 = n + 1

        def ee_slot(i, j):
            return off0 + (i * b0 + j) * C + np.arange(C)

        corner_slots = np.concatenate(
            [ee_slot(0, 0), ee_slot(n, 0), ee_slot(0, n)]
        )
        corner_dofs = np.concatenate(
            [EE[:, 0, 0], EE[:, n, 0], EE[:, 0, n]]
        )
        uniq, grp = np.unique(corner_dofs, return_inverse=True)
        self._corner_slots = corner_slots.astype(np.int32)
        self._corner_group = grp.astype(np.int32)
        self._n_corner_groups = len(uniq)

    # -- plane plumbing ------------------------------------------------------
    def unflatten(self, X):
        t = X.shape[1:]
        out = []
        for p, (a, b) in enumerate(self.planes):
            o0, o1 = self.offsets[p], self.offsets[p + 1]
            out.append(X[o0:o1].reshape((a, b, self.C) + t))
        return out

    def flatten(self, planes):
        t = planes[0].shape[3:]
        return jnp.concatenate([p.reshape((-1,) + t) for p in planes], axis=0)

    def window(self, planes, ttype, l):
        p, oa, ob = self.win[ttype][l]
        n = self.nct
        return planes[p][oa: oa + n, ob: ob + n]

    def acc_window(self, planes, ttype, l, val):
        p, oa, ob = self.win[ttype][l]
        n = self.nct
        planes[p] = planes[p].at[oa: oa + n, ob: ob + n].add(val)
        return planes

    # -- structured seam exchange -------------------------------------------
    def _even_sides(self, EE):
        """[3, n+1, C]: the EE-part of each side (t even)."""
        n = self.nct
        s0 = EE[:, 0]  # [n+1, C]
        s1 = EE[0, :]
        # hyp (i, n-i) with t = j: entry t=j comes from EE[n-j, j]
        s2 = jnp.flip(EE, axis=0).diagonal(axis1=0, axis2=1)  # [C, n+1]?? ->
        s2 = jnp.moveaxis(s2, -1, 0)  # [n+1, C], t index leading
        return jnp.stack([s0, s1, s2], axis=0)

    def _put_even_sides(self, EE, S):
        n = self.nct
        EE = EE.at[:, 0].set(S[0])
        EE = EE.at[0, :].set(S[1])
        # antidiagonal write via one-hot mask: position (n-j, j) <- S[2][j]
        m = n + 1
        oh = jnp.asarray(
            np.eye(m)[::-1], dtype=EE.dtype
        )  # oh[i, j] = 1 iff i = m-1-j
        V = oh[:, :, None] * S[2][None, :, :]
        mask = oh[:, :, None] > 0
        return jnp.where(mask, V.astype(EE.dtype), EE)

    def _odd_sides(self, planes):
        """[3, n, C]: the odd-parity part of each side (P2 only)."""
        n = self.nct
        EE, EO, OE, OO = planes
        s0 = OE[:, 0]  # (2i+1, 0): OE(i, 0) -> [n, C]
        s1 = EO[0, :]  # (0, 2j+1): EO(0, j)
        # hyp odd: (2i+1, 2j+1), i+j = n-1 -> OO(i, n-1-i); t odd ordering
        # along t = j parametrization: odd t=2j+1 sits between even j and
        # j+1 -> entry index j comes from OO(n-1-j, j)
        s2 = jnp.moveaxis(
            jnp.flip(OO, axis=0).diagonal(axis1=0, axis2=1), -1, 0
        )  # [n, C]
        return jnp.stack([s0, s1, s2], axis=0)

    def _put_odd_sides(self, planes, S):
        n = self.nct
        EE, EO, OE, OO = planes
        OE = OE.at[:, 0].set(S[0])
        EO = EO.at[0, :].set(S[1])
        oh = jnp.asarray(np.eye(n)[::-1], dtype=OO.dtype)
        V = oh[:, :, None] * S[2][None, :, :]
        OO = jnp.where(oh[:, :, None] > 0, V.astype(OO.dtype), OO)
        return [EE, EO, OE, OO]

    def _exchange(self, S, interior_only):
        """S [3, m, C] side stack -> S + matched neighbor sides (one
        3C-row gather). interior_only masks the two end entries (corners
        are summed separately)."""
        three, m, C = S.shape
        R = jnp.moveaxis(S, -1, 1).reshape(3 * C, m)  # row (s*C + c)
        Rpad = jnp.concatenate([R, jnp.zeros((1, m), dtype=R.dtype)], axis=0)
        G = Rpad[self._nbr_j]  # [3C, m]
        G = jnp.where(self._flip_j[:, None], jnp.flip(G, axis=1), G)
        if interior_only:
            col = jnp.ones((m,), dtype=R.dtype).at[0].set(0.0).at[m - 1].set(0.0)
            G = G * col[None, :]
        R = R + G
        return jnp.moveaxis(R.reshape(3, C, m), 1, -1)

    def _corner_fix(self, X):
        vals = X[self._corner_slots_j]
        sums = jax.ops.segment_sum(
            vals, self._corner_group_j, num_segments=self._n_corner_groups
        )
        return X.at[self._corner_slots_j].set(sums[self._corner_group_j])

    def seam_sum_planes(self, planes):
        """Restore replica consistency after an overlap-add: structured
        side exchange + corner groups."""
        EE = planes[0]
        S = self._even_sides(EE)
        S = self._exchange(S, interior_only=True)
        EE = self._put_even_sides(EE, S)
        planes = [EE] + list(planes[1:])
        if len(planes) > 1:
            So = self._odd_sides(planes)
            So = self._exchange(So, interior_only=False)
            planes = self._put_odd_sides(planes, So)
        X = self.flatten(planes)
        return self._corner_fix(X)

    def seam_sum(self, X):
        return self.seam_sum_planes(self.unflatten(X))

    # -- conversions (setup / probes only) ------------------------------------
    def to_packed(self, x):
        idx = jnp.asarray(np.clip(self.L, 0, None))
        v = self.valid_j
        out = jnp.asarray(x)[idx]
        return out * v.reshape(v.shape + (1,) * (out.ndim - 1))

    def from_packed(self, X):
        return X[self.slot_of_dof_j]

    def dot(self, x, y):
        w = self.weight_j
        w = w.reshape(w.shape + (1,) * (x.ndim - 1))
        return jnp.sum(w * x * y)


def make_p2_layout(info: PatchInfo, dtype) -> PackedLayout:
    n = info.n
    blocks = list(_parity_blocks(info.p2map))
    planes = [(n + 1, n + 1), (n + 1, n), (n, n + 1), (n, n)]
    up = [(0, 0, 0), (0, 1, 0), (0, 0, 1), (3, 0, 0), (1, 0, 0), (2, 0, 0)]
    dn = [(0, 1, 0), (0, 1, 1), (0, 0, 1), (2, 0, 1), (3, 0, 0), (1, 1, 0)]
    mesh = info.meshes[-1]
    return PackedLayout(
        info.C, n, planes, [up, dn], blocks,
        mesh.n_points + mesh.n_edges, info.meshes[0].cells_np, dtype,
    )


def make_p1_layout(info: PatchInfo, level, dtype) -> PackedLayout:
    v = info.vmaps[level]
    nct = 1 << level
    planes = [(nct + 1, nct + 1)]
    up = [(0, 0, 0), (0, 1, 0), (0, 0, 1)]
    dn = [(0, 1, 0), (0, 1, 1), (0, 0, 1)]
    return PackedLayout(
        info.C, nct, planes, [up, dn], [v],
        info.meshes[level].n_points, info.meshes[0].cells_np, dtype,
    )


# ---------------------------------------------------------------------------
# the packed-patch kernel context
# ---------------------------------------------------------------------------
class PackedPatch:
    """Geometry blocks + hot operator kernels over the packed layout.

    All cell-local data are [n, n, C] arrays per (type, small-index); all
    small axes (local dofs, quadrature points, components) are unrolled in
    Python. Every kernel is jit-traceable and gather-free in the volume
    (seams are the structured O(C)-row exchange; boundary terms are
    O(surface) representative-slot gathers)."""

    def __init__(self, info: PatchInfo, dtype=None):
        from ..utils.hostsetup import setup_on_cpu

        self.info = info
        mesh = info.meshes[-1]
        if dtype is None:
            dtype = mesh.dtype
        self.dtype = dtype
        self.mesh = mesh
        self.lay2 = make_p2_layout(info, dtype)
        self.lay1 = make_p1_layout(info, info.k, dtype)
        self.n2 = self.lay2.n_flat
        self.n1 = self.lay1.n_flat
        with setup_on_cpu():
            self._build_geometry(dtype)
            self._build_tabs(dtype)

    def _blocks_from_cellorder(self, arr):
        """PatchGeom flat cell order [ncp(,...)] -> (up, dn) packed blocks
        [n, n, C(,...)]."""
        C, n = self.info.C, self.info.n
        half = C * n * n
        t = arr.shape[1:]

        def tr(x):
            x = x.reshape((C, n, n) + t)
            return np.moveaxis(x, 0, 2)

        return tr(arr[:half]), tr(arr[half:])

    def _build_geometry(self, dtype):
        geom = PatchGeom(self.info, dtype=np.float64)
        detJ = np.asarray(geom.detJ)
        G = np.asarray(geom.G)      # [ncp, 2, 2]
        Cg = np.asarray(geom.C)     # [ncp, 2, 2]
        dJu, dJd = self._blocks_from_cellorder(detJ)
        Gu, Gd = self._blocks_from_cellorder(G)
        Cu, Cd = self._blocks_from_cellorder(Cg)
        j = jnp.asarray
        self.detJ = [j(dJu, dtype=dtype), j(dJd, dtype=dtype)]
        # G[t][d][k]: [n, n, C] each
        self.G = [
            [[j(Gt[..., d, k], dtype=dtype) for k in range(2)]
             for d in range(2)]
            for Gt in (Gu, Gd)
        ]
        # C symmetric: (c00, c01, c11)
        self.Cs = [
            (j(Ct[..., 0, 0], dtype=dtype), j(Ct[..., 0, 1], dtype=dtype),
             j(Ct[..., 1, 1], dtype=dtype))
            for Ct in (Cu, Cd)
        ]

    def _build_tabs(self, dtype):
        from . import quadrature, elements, assembly

        # P2 tabulation at the convection rule (matches the einsum path)
        pts, w = quadrature.simplex_rule(assembly.CONV_RULE, 2)
        phi, dphi = elements.tabulate(2, pts, dim=2)
        self.qw = np.asarray(w)          # [nq]
        self.phi = np.asarray(phi)       # [nq, 6]
        self.dphi = np.asarray(dphi)     # [nq, 6, 2]
        self.nq = len(w)
        self.Mref2 = np.asarray(assembly.ref_mass(2, 2))        # [6, 6]
        self.Kref2 = np.asarray(assembly.ref_stiffness(2, 2))   # [2,2,6,6]
        self.Bref21 = np.asarray(assembly.ref_mixed(1, 2, 2))   # [2, 3, 6]
        self.Href2 = np.asarray(elements.hessian_ref(2, 2))     # [6, 2, 2]
        # P1 ref gradients (constant) and P2 reference integrals
        _, dphi1 = elements.tabulate(1, np.zeros((1, 2)), dim=2)
        self.dref1 = np.asarray(dphi1[0])                        # [3, 2]
        from .forms import ref_p1_integrals

        self.refint2 = np.asarray(ref_p1_integrals(2, 2))        # [6]
        # P2 element stiffness scalar through C: Kscal_ij = C_kl Kref[klij]
        # -> per-cell arrays built lazily per (i, j) when first needed
        self._kscal = None

    # -- small helpers --------------------------------------------------------
    def comps(self, Xf):
        n = self.n2
        return Xf[:n], Xf[n:]

    def join(self, a, b):
        return jnp.concatenate([a, b])

    def windows2(self, Xs, ttype):
        """Scalar P2 flat -> 6 window arrays [n, n, C] for cell type."""
        planes = self.lay2.unflatten(Xs)
        return [self.lay2.window(planes, ttype, l) for l in range(6)]

    def windows1(self, Xs, ttype):
        planes = self.lay1.unflatten(Xs)
        return [self.lay1.window(planes, ttype, l) for l in range(3)]

    def zero_planes2(self, like):
        C = self.lay2.C
        return [
            jnp.zeros((a, b, C), dtype=like.dtype) for a, b in self.lay2.planes
        ]

    def zero_planes1(self, like):
        C = self.lay1.C
        return [
            jnp.zeros((a, b, C), dtype=like.dtype) for a, b in self.lay1.planes
        ]

    def kscal(self):
        """Constant grad:grad scalar pairs Kscal[t][i][j] = C_kl Kref[klij]
        (upper triangle; symmetric), [n, n, C] each."""
        if self._kscal is None:
            K = self.Kref2
            out = []
            for t in range(2):
                c00, c01, c11 = self.Cs[t]
                tab = {}
                for i in range(6):
                    for jj in range(i, 6):
                        tab[(i, jj)] = (
                            c00 * K[0, 0, i, jj]
                            + c01 * (K[0, 1, i, jj] + K[1, 0, i, jj])
                            + c11 * K[1, 1, i, jj]
                        )
                out.append(tab)
            self._kscal = out
        return self._kscal

    # -- P1 stiffness (pressure Poisson / MG smoothing) -----------------------
    def p1_stiffness_apply(self, p):
        """y = K p on the P1 packed layout: 2 cell types x 9 unrolled
        scalar-FMA terms, K_ij = 0.5 d_i^T C d_j with d0=(-1,-1), d1=(1,0),
        d2=(0,1)."""
        acc = self.zero_planes1(p)
        d = ((-1.0, -1.0), (1.0, 0.0), (0.0, 1.0))
        for t in range(2):
            c00, c01, c11 = self.Cs[t]
            xw = self.windows1(p, t)
            ys = []
            for i in range(3):
                di = d[i]
                y = None
                for jj in range(3):
                    dj = d[jj]
                    kc = 0.5 * (
                        di[0] * dj[0] * c00
                        + (di[0] * dj[1] + di[1] * dj[0]) * c01
                        + di[1] * dj[1] * c11
                    )
                    term = kc * xw[jj]
                    y = term if y is None else y + term
                ys.append(y)
            for i in range(3):
                acc = self.lay1.acc_window(acc, t, i, ys[i])
        return self.lay1.seam_sum_planes(acc)

    # -- P2 vector mass apply (velocity correction) ---------------------------
    def mass_apply_vec(self, Xf):
        out = []
        for xc in self.comps(Xf):
            acc = self.zero_planes2(xc)
            for t in range(2):
                xw = self.windows2(xc, t)
                dJ = self.detJ[t]
                for i in range(6):
                    y = None
                    for jj in range(6):
                        term = self.Mref2[i, jj] * xw[jj]
                        y = term if y is None else y + term
                    acc = self.lay2.acc_window(acc, t, i, dJ * y)
            out.append(self.lay2.seam_sum_planes(acc))
        return self.join(out[0], out[1])
