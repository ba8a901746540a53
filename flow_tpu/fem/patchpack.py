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
            self.kscal()  # build the lazy constant cache EAGERLY: a first
            # call inside a jit trace would cache tracers (the repo's known
            # lru-cache leak class — see verify skill notes)

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

    # -- mixed/coupling kernels (unrolled factored reference tensors) ---------
    def div_rhs(self, Xf):
        """b[m] = int div(u) q_m -> P1 packed flat (exact).
        out_m = detJ * sum_{k,j} Bref[k,m,j] g_kj,  g_kj = sum_b G[b][k] x_j^b."""
        x0, x1 = self.comps(Xf)
        B = self.Bref21
        acc = self.zero_planes1(x0)
        for t in range(2):
            xw = [self.windows2(x0, t), self.windows2(x1, t)]
            G = self.G[t]
            dJ = self.detJ[t]
            g = [
                [G[0][k] * xw[0][j] + G[1][k] * xw[1][j] for j in range(6)]
                for k in range(2)
            ]
            for m in range(3):
                y = None
                for k in range(2):
                    for j in range(6):
                        c = B[k, m, j]
                        if c == 0.0:
                            continue
                        term = c * g[k][j]
                        y = term if y is None else y + term
                acc = self.lay1.acc_window(acc, t, m, dJ * y)
        return self.lay1.seam_sum_planes(acc)

    def pressure_grad_rhs(self, Pf):
        """b[(i,a)] = int p d_a v_i -> P2 packed vector flat (exact).
        out_i^a = detJ * sum_k G[a][k] h_ki,  h_ki = sum_m Bref[k,m,i] p_m."""
        B = self.Bref21
        out = []
        for a in range(2):
            acc = self.zero_planes2(Pf)
            for t in range(2):
                pw = self.windows1(Pf, t)
                G = self.G[t]
                dJ = self.detJ[t]
                for i in range(6):
                    y = None
                    for k in range(2):
                        h = None
                        for m in range(3):
                            c = B[k, m, i]
                            if c == 0.0:
                                continue
                            term = c * pw[m]
                            h = term if h is None else h + term
                        if h is None:
                            continue
                        term = G[a][k] * h
                        y = term if y is None else y + term
                    acc = self.lay2.acc_window(acc, t, i, dJ * y)
            out.append(self.lay2.seam_sum_planes(acc))
        return self.join(out[0], out[1])

    def grad_div_cell(self, Xf):
        """Per-cell constant grad(div u) for P2 u: [2][type] -> [n,n,C].
        v_d = sum_k G[d][k] * sum_{l,j} Href[j,k,l] w_lj,
        w_lj = sum_b G[b][l] x_j^b   (also the transpose-term intermediate)."""
        x0, x1 = self.comps(Xf)
        H = self.Href2
        out = [[None, None], [None, None]]  # [d][t]
        for t in range(2):
            xw = [self.windows2(x0, t), self.windows2(x1, t)]
            G = self.G[t]
            w = [
                [G[0][l] * xw[0][j] + G[1][l] * xw[1][j] for j in range(6)]
                for l in range(2)
            ]
            for d in range(2):
                v = None
                for k in range(2):
                    u = None
                    for l in range(2):
                        for j in range(6):
                            c = H[j, k, l]
                            if c == 0.0:
                                continue
                            term = c * w[l][j]
                            u = term if u is None else u + term
                    if u is None:
                        continue
                    term = G[d][k] * u
                    v = term if v is None else v + term
                out[d][t] = v
        return out

    def grad_div_rhs(self, Xf):
        """b[m] = int grad(div u).grad(q_m) -> P1 packed flat (exact;
        rotational pressure term). loc_m = 0.5 detJ sum_{d,k} v_d G[d][k]
        dref1[m,k]."""
        v = self.grad_div_cell(Xf)
        dref = self.dref1
        acc = self.zero_planes1(Xf)
        for t in range(2):
            G = self.G[t]
            dJ = self.detJ[t]
            gv = [
                v[0][t] * G[0][k] + v[1][t] * G[1][k] for k in range(2)
            ]
            for m in range(3):
                y = dref[m, 0] * gv[0] + dref[m, 1] * gv[1]
                acc = self.lay1.acc_window(acc, t, m, (0.5 * dJ) * y)
        return self.lay1.seam_sum_planes(acc)

    def grad_phi_rhs(self, Pf, div_part=None, mu=0.0):
        """b[(i,a)] = int (grad(phi)_a [+ mu grad(div u*)_a]) v_i -> packed
        vector flat (exact: grad(phi) is per-cell constant for P1 phi, and
        int_cell v_i = detJ * refint_i)."""
        dref = self.dref1
        out = []
        for a in range(2):
            acc = self.zero_planes2(Pf)
            for t in range(2):
                pw = self.windows1(Pf, t)
                G = self.G[t]
                dJ = self.detJ[t]
                pk = [
                    dref[0, k] * pw[0] + dref[1, k] * pw[1] + dref[2, k] * pw[2]
                    for k in range(2)
                ]
                ga = G[a][0] * pk[0] + G[a][1] * pk[1]
                if div_part is not None:
                    ga = ga + mu * div_part[a][t]
                for i in range(6):
                    c = self.refint2[i]
                    if c == 0.0:
                        continue
                    acc = self.lay2.acc_window(acc, t, i, (c * dJ) * ga)
            out.append(self.lay2.seam_sum_planes(acc))
        return self.join(out[0], out[1])

    # -- lagged momentum operator (EMA twin) ----------------------------------
    def ema_S(self, Tf, s_mu, s_rho):
        """Scalar element tensor of the lagged momentum operator:
        S[t][i][j] = detJ*Mref_ij + s_mu*Kscal_ij + s_rho*conv_ij(T),
        conv_ij = 0.5 detJ sum_q qw_q (phi_qi A_qj - phi_qj A_qi),
        A_qm = sum_k TG_qk dphi[q,m,k], TG_qk = sum_d T_d(q) G[d][k]."""
        T0, T1 = self.comps(Tf)
        ks = self.kscal()
        S = []
        for t in range(2):
            Tw = [self.windows2(T0, t), self.windows2(T1, t)]
            G = self.G[t]
            dJ = self.detJ[t]
            A = []  # A[q][m]
            for q in range(self.nq):
                Td = [None, None]
                for d in range(2):
                    y = None
                    for l in range(6):
                        c = self.phi[q, l]
                        term = c * Tw[d][l]
                        y = term if y is None else y + term
                    Td[d] = y
                TG = [
                    Td[0] * G[0][k] + Td[1] * G[1][k] for k in range(2)
                ]
                A.append([
                    self.dphi[q, m, 0] * TG[0] + self.dphi[q, m, 1] * TG[1]
                    for m in range(6)
                ])
            St = [[None] * 6 for _ in range(6)]
            for i in range(6):
                for jj in range(6):
                    conv = None
                    for q in range(self.nq):
                        c1 = self.qw[q] * self.phi[q, i]
                        c2 = self.qw[q] * self.phi[q, jj]
                        term = c1 * A[q][jj] - c2 * A[q][i]
                        conv = term if conv is None else conv + term
                    kij = ks[t][(i, jj)] if jj >= i else ks[t][(jj, i)]
                    St[i][jj] = (
                        dJ * (self.Mref2[i, jj] + (0.5 * s_rho) * conv)
                        + s_mu * kij
                    )
            S.append(St)
        return S

    def ema_volume_apply(self, S, Xf, s_mu):
        """Volume part of the lagged tangent: component-diagonal scalar
        contraction with S plus the factored grad-transpose stress coupling
        (s_mu * detJ G[a][k] G[b][l] Kref[k,l,j,i] x_j^b)."""
        x = list(self.comps(Xf))
        K = self.Kref2
        out = []
        accs = [self.zero_planes2(x[0]) for _ in range(2)]
        for t in range(2):
            xw = [self.windows2(x[0], t), self.windows2(x[1], t)]
            G = self.G[t]
            dJ = self.detJ[t]
            # scalar part per component
            for a in range(2):
                for i in range(6):
                    y = None
                    for jj in range(6):
                        term = S[t][i][jj] * xw[a][jj]
                        y = term if y is None else y + term
                    accs[a] = self.lay2.acc_window(accs[a], t, i, y)
            # transpose coupling: w_lj = sum_b G[b][l] x_j^b;
            # u_ki = sum_{l,j} Kref[k,l,j,i] w_lj;
            # out_i^a += s_mu detJ sum_k G[a][k] u_ki
            w = [
                [G[0][l] * xw[0][j] + G[1][l] * xw[1][j] for j in range(6)]
                for l in range(2)
            ]
            for i in range(6):
                u = [None, None]
                for k in range(2):
                    y = None
                    for l in range(2):
                        for j in range(6):
                            c = K[k, l, j, i]
                            if c == 0.0:
                                continue
                            term = c * w[l][j]
                            y = term if y is None else y + term
                    u[k] = y
                for a in range(2):
                    val = G[a][0] * u[0] + G[a][1] * u[1]
                    accs[a] = self.lay2.acc_window(
                        accs[a], t, i, (s_mu * dJ) * val
                    )
        out = [self.lay2.seam_sum_planes(accs[a]) for a in range(2)]
        return self.join(out[0], out[1])


class PackedBoundary:
    """Boundary-facet tabulation re-addressed for the packed layout:
    O(surface) representative-slot gathers + seam-broadcast scatters.
    Carries the ds-terms of the momentum residual (reference
    /root/reference/flow/navier_stokes/pressure_correction.py:134-144)."""

    def __init__(self, btab, lay: PackedLayout, fine_geom):
        from ..utils.hostsetup import setup_on_cpu

        self.phi = btab.phi      # [nb, q, nl]
        self.dphi = btab.dphi    # [nb, q, nl, 2]
        self.wl = btab.wl        # [nb, q]
        self.normals = btab.normals
        self.nq1 = btab.nq1
        self.lay = lay
        with setup_on_cpu():
            self.cell_dofs = lay.slot_of_dof_j[btab.cell_dofs]  # [nb, nl]
            self.Gb = fine_geom.G[btab.cells]  # [nb, 2, 2] fine local order

    def values_vec(self, Xf):
        """Packed vector flat -> boundary values [nb, q, 2]."""
        n = self.lay.n_flat
        cols = []
        for c in range(2):
            loc = Xf[c * n:(c + 1) * n][self.cell_dofs]  # [nb, nl]
            cols.append(jnp.einsum("bql,bl->bq", self.phi, loc))
        return jnp.stack(cols, axis=-1)

    def values_scalar(self, Pf):
        """For a PackedBoundary built on a SCALAR layout (e.g. the P1
        pressure): boundary values [nb, q]."""
        loc = Pf[self.cell_dofs]
        return jnp.einsum("bql,bl->bq", self.phi, loc)

    def grads_vec(self, Xf):
        """[nb, q, a, d] = d u_a / d x_d at boundary qps."""
        n = self.lay.n_flat
        cols = []
        for c in range(2):
            loc = Xf[c * n:(c + 1) * n][self.cell_dofs]
            cols.append(
                jnp.einsum("bqlk,bdk,bl->bqd", self.dphi, self.Gb, loc)
            )
        return jnp.stack(cols, axis=-2)

    def integrate_rhs_vec(self, val):
        """val [nb, q, 2] -> packed vector flat (seam-consistent)."""
        loc = jnp.einsum("bqm,bq,bqi->bim", val, self.wl, self.phi)
        flat_dofs = self.cell_dofs.reshape(-1)
        outs = []
        for c in range(2):
            o = jnp.zeros((self.lay.n_flat,), dtype=val.dtype)
            o = o.at[flat_dofs].add(loc[:, :, c].reshape(-1))
            outs.append(self.lay.seam_sum(o))
        return jnp.concatenate(outs)


class P1LevelKernels:
    """P1 packed kernels of one hierarchy level (stiffness apply/diag)."""

    def __init__(self, info: PatchInfo, level, dtype):
        self.lay = make_p1_layout(info, level, dtype)
        geom = PatchGeom(info, level=level, dtype=np.float64)
        C, n = info.C, 1 << level
        half = C * n * n
        Cg = np.asarray(geom.C)

        def tr(x):
            return np.moveaxis(x.reshape((C, n, n) + x.shape[1:]), 0, 2)

        j = jnp.asarray
        self.Cs = [
            (
                j(tr(Cg[o: o + half])[..., 0, 0], dtype=dtype),
                j(tr(Cg[o: o + half])[..., 0, 1], dtype=dtype),
                j(tr(Cg[o: o + half])[..., 1, 1], dtype=dtype),
            )
            for o in (0, half)
        ]

    def windows(self, Xs, ttype):
        planes = self.lay.unflatten(Xs)
        return [self.lay.window(planes, ttype, l) for l in range(3)]

    def stiffness_apply(self, p):
        lay = self.lay
        acc = [
            jnp.zeros((a, b, lay.C), dtype=p.dtype) for a, b in lay.planes
        ]
        d = ((-1.0, -1.0), (1.0, 0.0), (0.0, 1.0))
        for t in range(2):
            c00, c01, c11 = self.Cs[t]
            xw = self.windows(p, t)
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
                acc = lay.acc_window(acc, t, i, y)
        return lay.seam_sum_planes(acc)


class PackedPatchP1Hierarchy:
    """Packed-layout geometric multigrid for the pressure Poisson operator:
    the lane-packed twin of solvers/patch_mg.PatchP1Hierarchy (same cycle
    structure, every transfer/smooth a windowed dense op)."""

    def __init__(self, info: PatchInfo, bc_mask=None, smoother_degree=3,
                 coarse_dense_max=3000, lmin_ratio=0.30, dtype=None):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(
                info, bc_mask, smoother_degree, coarse_dense_max, lmin_ratio,
                dtype,
            )

    def _build(self, info, bc_mask, smoother_degree, coarse_dense_max,
               lmin_ratio, dtype):
        from ..solvers.chebyshev import power_iteration_lmax
        from ..fem import dense, assembly
        from ..fem.spaces import FunctionSpace

        if dtype is None:
            dtype = info.meshes[-1].dtype
        self.info = info
        self.nlevels = info.k + 1
        self.neumann = bc_mask is None
        self.smoother_degree = smoother_degree

        self.levels = []
        for l in range(self.nlevels):
            L = type("L", (), {})()
            L.kern = P1LevelKernels(info, l, dtype)
            L.lay = L.kern.lay
            self.levels.append(L)

        masks = [None] * self.nlevels
        if bc_mask is not None:
            masks[-1] = jnp.asarray(bc_mask, dtype=dtype)
            for l in range(self.nlevels - 2, -1, -1):
                fl = self.levels[l + 1].lay.unflatten(masks[l + 1])[0]
                masks[l] = self.levels[l].lay.flatten([fl[::2, ::2]])

        for l, L in enumerate(self.levels):
            L.mask = masks[l]
            free = None if L.mask is None else (1.0 - L.mask)
            L.free = free
            base = L.kern.stiffness_apply
            if L.mask is None:
                K = base
            else:

                def K(x, base=base, free=free, mask=L.mask):
                    return free * base(free * x) + mask * x

            L.K = K
            # diagonal: global stiffness diag -> packed (one-time, exact)
            sp = FunctionSpace(info.meshes[l], 1)
            dg = assembly.stiffness_diag(sp, assembly.geometry(info.meshes[l]))
            diag = L.lay.to_packed(jnp.asarray(dg, dtype=dtype))
            diag = jnp.where(diag > 0, diag, 1.0)
            if L.mask is not None:
                diag = free * diag + L.mask
            L.diag = diag
            L.lmax = power_iteration_lmax(K, diag, L.lay.n_flat, dtype=dtype)
            lmax_s, lmin_s = 1.05 * L.lmax, lmin_ratio * L.lmax
            L.theta = 0.5 * (lmax_s + lmin_s)
            L.delta = 0.5 * (lmax_s - lmin_s)

        mesh0 = info.meshes[0]
        S0 = FunctionSpace(mesh0, 1)
        geom0 = assembly.geometry(mesh0)
        n0 = mesh0.n_points
        assert n0 <= coarse_dense_max, f"coarse level too big: {n0}"
        K0 = dense.scalar_dense(
            S0, np.asarray(assembly.stiffness_local(S0, geom0))
        )
        L0 = self.levels[0]
        if self.neumann:
            v = np.full(n0, 1.0 / np.sqrt(n0))
            K0 = K0 + np.outer(v, v)
        else:
            m0 = np.asarray(L0.lay.from_packed(L0.mask)) == 1.0
            K0[m0, :] = 0.0
            K0[:, m0] = 0.0
            K0[m0, m0] = 1.0
        self.K0_inv = jnp.asarray(np.linalg.inv(K0), dtype=dtype)

    # -- transfers ------------------------------------------------------------
    def prolong(self, l, xc):
        """P1 lattice interpolation, [mc, mc, C] -> [mf, mf, C] (leading
        lattice axes; consistent -> consistent)."""
        Xc = self.levels[l].lay.unflatten(xc)[0]
        mc = Xc.shape[0]
        mf = 2 * mc - 1
        C = Xc.shape[2]
        mid = 0.5 * (Xc[:, :-1] + Xc[:, 1:])
        Y = jnp.concatenate(
            [
                jnp.stack([Xc[:, :-1], mid], axis=2).reshape(
                    mc, 2 * (mc - 1), C
                ),
                Xc[:, -1:],
            ],
            axis=1,
        )  # even rows [mc, mf, C]
        colmid_e = 0.5 * (Xc[:-1, :] + Xc[1:, :])      # [mc-1, mc, C]
        colmid_o = 0.5 * (Xc[1:, :-1] + Xc[:-1, 1:])   # diagonal mids
        R = jnp.concatenate(
            [
                jnp.stack([colmid_e[:, :-1], colmid_o], axis=2).reshape(
                    mc - 1, 2 * (mc - 1), C
                ),
                colmid_e[:, -1:],
            ],
            axis=1,
        )  # odd rows [mc-1, mf, C]
        out = jnp.concatenate(
            [
                jnp.stack([Y[:-1], R], axis=1).reshape(2 * (mc - 1), mf, C),
                Y[-1:],
            ],
            axis=0,
        )
        return self.levels[l + 1].lay.flatten([out])

    def restrict(self, l, rf):
        """Exact adjoint of prolong on the replicated layout (weight split,
        local transpose-interleave, coarse seam exchange)."""
        layf = self.levels[l + 1].lay
        Rf = layf.unflatten(layf.weight_j * rf)[0]
        E = Rf[::2, ::2]
        H = Rf[1::2, ::2]
        V = Rf[::2, 1::2]
        D = Rf[1::2, 1::2]
        out = E
        out = out.at[:-1, :].add(0.5 * H)
        out = out.at[1:, :].add(0.5 * H)
        out = out.at[:, :-1].add(0.5 * V)
        out = out.at[:, 1:].add(0.5 * V)
        out = out.at[1:, :-1].add(0.5 * D)
        out = out.at[:-1, 1:].add(0.5 * D)
        layc = self.levels[l].lay
        return layc.seam_sum_planes([out])

    def _smooth(self, L, b, x):
        sigma = L.theta / L.delta
        rho = 1.0 / sigma
        r = b - L.K(x)
        d = (r / L.diag) / L.theta
        x = x + d
        for _ in range(self.smoother_degree - 1):
            r = r - L.K(d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / L.delta) * (r / L.diag)
            x = x + d
            rho = rho_new
        return x

    def _project(self, l, x):
        lay = self.levels[l].lay
        w = lay.weight_j
        return (x - jnp.sum(w * x) / jnp.sum(w)) * lay.valid_j

    def v_cycle(self, b):
        if self.neumann:
            b = self._project(self.nlevels - 1, b)
        bs = [None] * self.nlevels
        xs = [None] * self.nlevels
        bs[-1] = b
        for l in range(self.nlevels - 1, 0, -1):
            L = self.levels[l]
            x = self._smooth(L, bs[l], jnp.zeros_like(bs[l]))
            r = bs[l] - L.K(x)
            if self.neumann:
                r = self._project(l, r)
            xs[l] = x
            rc = self.restrict(l - 1, r)
            if self.levels[l - 1].mask is not None:
                rc = (1.0 - self.levels[l - 1].mask) * rc
            bs[l] = bs[l]
            bs[l - 1] = rc
        L0 = self.levels[0]
        b0 = L0.lay.from_packed(bs[0])
        x0 = L0.lay.to_packed(self.K0_inv @ b0)
        if self.neumann:
            x0 = self._project(0, x0)
        xs[0] = x0
        for l in range(1, self.nlevels):
            corr = self.prolong(l - 1, xs[l - 1])
            if self.levels[l].mask is not None:
                corr = (1.0 - self.levels[l].mask) * corr
            x = xs[l] + corr
            xs[l] = self._smooth(self.levels[l], bs[l], x)
        out = xs[-1]
        if self.neumann:
            out = self._project(self.nlevels - 1, out)
        return out * self.levels[-1].lay.valid_j
