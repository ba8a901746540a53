# Patch-contiguous ("gather-free") layout over uniformly refined meshes —
# the round-4 structural answer to the measured TPU row-gather wall.
#
# THE PROBLEM (BENCH_NOTES rounds 2-3, measured to exhaustion): every hot
# operator in the projection step is built from two index-space movements,
#   gather   x[cell_dofs]            [n -> nc*nl rows]
#   dof_sum  segment-sum by dof      [nc*nl -> n rows]
# and XLA's TPU gather engine is ROW-COUNT-bound (~1e7-2e7 rows/s for these
# access patterns): one momentum matvec at 10M DoF costs 8.5 s for ~1 GB of
# logical traffic, ~1000x its HBM speed-of-light. No knob fixed this; the
# indexed-addressing ARCHITECTURE is the bound.
#
# THE STRUCTURE THE MESHES ALREADY HAVE: every benchmark mesh is built as
# coarse + refine_uniform^k (the multigrid mandate, SURVEY.md §7 hard part
# #2). After k red refinements each coarse cell owns a FIXED barycentric
# lattice of 4^k children: lattice point (i, j), i+j <= n (n = 2^k), sits at
# barycentric (1-(i+j)/n, i/n, j/n); up-children at (i,j) have corners
# {(i,j),(i+1,j),(i,j+1)}, down-children {(i+1,j),(i+1,j+1),(i,j+1)}. The
# cell->dof map inside a patch is therefore STATIC INDEX ARITHMETIC:
#
#   gather  == a handful of shifted dense WINDOWS (XLA slices)
#   dof_sum == overlap-add of those windows (dynamic-update-slice adds)
#
# with genuine indexed addressing left only on the patch SEAMS (lattice
# boundary points shared between patches): O(C * n) rows instead of
# O(C * n^2) — a ~n/3 reduction in gathered rows, turning the matvec into a
# streaming (HBM-bound) computation.
#
# LAYOUT. A scalar field lives as per-patch lattice PLANES, flattened into
# one 1-D array (so Krylov/axpy code sees a plain vector):
#   P1 on refine-k:  one plane  [C, n+1, n+1]        (lattice (i,j), i+j<=n)
#   P2 on refine-k:  the doubled lattice (2n+1)^2 split by PARITY into four
#     planes EE [C,n+1,n+1], EO [C,n+1,n], OE [C,n,n+1], OO [C,n,n] — every
#     P2 cell window then has stride 1 in its plane (strided updates would
#     lower to scatters; parity planes keep every window a plain slice).
# Seam lattice points are REPLICATED (each patch owns a copy); consistency
# is restored after each overlap-add by a sum-broadcast over the replica
# groups (one small gather + segment-sum + one small scatter). Inner
# products weight replicas by 1/multiplicity so Krylov iterations are
# EXACTLY the un-replicated algorithm (same iterates, same stopping).
#
# Cells are ordered [up-block; down-block], each [C, n, n] row-major, with
# out-of-triangle slots masked by ZERO GEOMETRY (detJ = G = C = 0): every
# volume form's contribution from a masked slot vanishes identically, so
# the whole layout is transparent to the (layout-agnostic) forms layer —
# fem/forms.py and fem/assembly.py run UNCHANGED on a PatchSpace.
#
# Replaces: the per-row-gather operator path of FunctionSpace.gather/dof_sum
# for meshes with refinement structure (reference-side analog: the DOLFIN
# C++ assembly loop + PETSc SpMV, /root/reference/flow/navier_stokes/
# pressure_correction.py:258-433 — there the native backend hides the same
# irregular addressing behind CSR).
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "PatchInfo",
    "build_patch_info",
    "PatchLayout",
    "PatchSpace",
    "PatchGeom",
    "PatchBoundaryTab",
]


# ---------------------------------------------------------------------------
# host-side lattice-map construction (numpy, once per hierarchy)
# ---------------------------------------------------------------------------
def _edge_lookup(mesh):
    """Sorted-key lookup table for (v0, v1) -> edge id (rows of edges_np are
    sorted, keys are v0 * n_points + v1)."""
    e = mesh.edges_np.astype(np.int64)
    keys = e[:, 0] * np.int64(mesh.n_points) + e[:, 1]
    order = np.argsort(keys).astype(np.int64)
    return keys[order], order


def _refine_vmap(v, mesh):
    """Lattice vertex-id map of the NEXT refinement level.

    v: [C, nn+1, nn+1] global vertex ids on mesh's lattice (level l), -1 at
    invalid (i+j > nn) slots. Returns [C, 2nn+1, 2nn+1] ids valid on
    refine_uniform(mesh), exploiting refine_uniform's deterministic
    numbering: midpoint of edge e gets id n_points + e (mesh.py:246-252)."""
    nn = v.shape[1] - 1
    npts = np.int64(mesh.n_points)
    keys_sorted, order = _edge_lookup(mesh)

    def mid_ids(a, b):
        valid = (a >= 0) & (b >= 0)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        q = np.where(valid, lo * npts + hi, keys_sorted[0])
        pos = np.searchsorted(keys_sorted, q.ravel()).reshape(q.shape)
        pos = np.clip(pos, 0, len(keys_sorted) - 1)
        found = keys_sorted[pos] == q
        assert bool(np.all(found[valid])), "lattice edge missing from mesh"
        eid = order[pos]
        return np.where(valid, npts + eid, np.int64(-1))

    m2 = 2 * nn + 1
    out = np.full((v.shape[0], m2, m2), -1, dtype=np.int64)
    out[:, ::2, ::2] = v
    # horizontal edges (i,j)-(i+1,j) -> fine (2i+1, 2j)
    out[:, 1::2, ::2] = mid_ids(v[:, :-1, :], v[:, 1:, :])
    # vertical edges (i,j)-(i,j+1) -> fine (2i, 2j+1)
    out[:, ::2, 1::2] = mid_ids(v[:, :, :-1], v[:, :, 1:])
    # diagonal edges (i+1,j)-(i,j+1) -> fine (2i+1, 2j+1)
    out[:, 1::2, 1::2] = mid_ids(v[:, 1:, :-1], v[:, :-1, 1:])
    return out


def _match_rows(A, B):
    """For each row of B (int64 [m, 3]), its index in A ([n, 3]; unique
    rows), or -1. Big-endian byte view makes void-compare lexicographic."""

    def keyed(X):
        Xc = np.ascontiguousarray(X.astype(">i8"))
        return Xc.view([("", Xc.dtype)] * X.shape[1]).ravel()

    ka, kb = keyed(A), keyed(B)
    order = np.argsort(ka)
    pos = np.searchsorted(ka[order], kb)
    pos = np.clip(pos, 0, len(ka) - 1)
    idx = order[pos]
    idx[ka[idx] != kb] = -1
    return idx


class PatchInfo:
    """Host-side lattice maps for one refinement hierarchy.

    vmaps[l]: [C, 2^l+1, 2^l+1] global vertex ids of mesh l's patch lattice
    p2map:    [C, 2n+1, 2n+1]   P2 dof ids on the finest mesh (vertex dofs
              at even-even coords, edge dofs n_points + e elsewhere — the
              doubled lattice IS one more _refine_vmap step, since P2 dof
              numbering matches refine_uniform's midpoint numbering,
              fem/spaces.py:43-55)
    """

    def __init__(self, mesh_hierarchy):
        meshes = list(mesh_hierarchy)
        assert len(meshes) >= 2, "patch layout needs >= 1 refinement"
        coarse = meshes[0]
        C = coarse.n_cells
        c0 = coarse.cells_np.astype(np.int64)
        v = np.full((C, 2, 2), -1, dtype=np.int64)
        v[:, 0, 0] = c0[:, 0]
        v[:, 1, 0] = c0[:, 1]
        v[:, 0, 1] = c0[:, 2]
        vmaps = [v]
        for mesh in meshes[:-1]:
            v = _refine_vmap(v, mesh)
            vmaps.append(v)
        self.meshes = meshes
        self.vmaps = vmaps
        self.C = C
        self.k = len(meshes) - 1
        self.n = 1 << self.k  # fine cells per patch axis
        self.p2map = _refine_vmap(vmaps[-1], meshes[-1])
        self._layouts = {}
        self._fine_cell_slot = None

    def layout(self, degree, level=None):
        """PatchLayout for P`degree` on hierarchy level `level` (default
        finest). P2 only on the finest level."""
        level = self.k if level is None else level
        key = (degree, level)
        lay = self._layouts.get(key)
        if lay is None:
            if degree == 1:
                lay = PatchLayout._p1(self, level)
            else:
                assert degree == 2 and level == self.k
                lay = PatchLayout._p2(self)
            self._layouts[key] = lay
        return lay

    def fine_cell_slot(self):
        """[nc_fine] flat patch-cell slot of each fine-mesh cell (for
        remapping boundary-facet tables into patch cell order)."""
        if self._fine_cell_slot is None:
            v = self.vmaps[-1]
            up = np.stack(
                [v[:, :-1, :-1], v[:, 1:, :-1], v[:, :-1, 1:]], axis=-1
            ).reshape(-1, 3)
            dn = np.stack(
                [v[:, 1:, :-1], v[:, 1:, 1:], v[:, :-1, 1:]], axis=-1
            ).reshape(-1, 3)
            allc = np.sort(np.concatenate([up, dn], axis=0), axis=1)
            mesh = self.meshes[-1]
            cells = np.sort(mesh.cells_np.astype(np.int64), axis=1)
            idx = _match_rows(allc, cells)
            assert int((idx < 0).sum()) == 0, "fine cell not found in patches"
            self._fine_cell_slot = idx.astype(np.int32)
        return self._fine_cell_slot


def build_patch_info(mesh_hierarchy) -> PatchInfo:
    return PatchInfo(mesh_hierarchy)


# ---------------------------------------------------------------------------
# layout: planes, windows, seam groups
# ---------------------------------------------------------------------------
class PatchLayout:
    """Index structures of one scalar patch layout (host numpy).

    planes:    list of (a, b) plane shapes (each plane is [C, a, b])
    win:       win[cell_type][local_dof] = (plane, oa, ob) window offsets;
               window extent is always (nct, nct) (cells per patch axis)
    L:         [n_flat] global dof id per flat slot (-1 on padding)
    weight:    [n_flat] 1/replica-multiplicity (0 on padding) — the exact
               inner-product weight making replicated Krylov = global Krylov
    rep_slots/rep_group: replica slots and their shared-dof group ids
    slot_of_dof: [n_dofs] a representative flat slot per global dof
    """

    def __init__(self, C, nct, planes, win, L, n_dofs):
        self.C = C
        self.nct = nct
        self.planes = planes
        self.win = win
        self.L = L
        self.n_dofs = n_dofs
        self.n_flat = L.shape[0]
        sizes = [C * a * b for a, b in planes]
        self.offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)

        valid = L >= 0
        self.valid = valid
        Lv = L[valid]
        counts = np.bincount(Lv, minlength=n_dofs)
        assert counts.min() >= 1, "unmapped global dof"
        w = np.zeros(self.n_flat)
        w[valid] = 1.0 / counts[Lv]
        self.weight = w

        idx = np.where(valid)[0]
        slot = np.empty(n_dofs, dtype=np.int64)
        slot[L[idx[::-1]]] = idx[::-1]  # first occurrence wins
        self.slot_of_dof = slot.astype(np.int32)

        shared = counts > 1
        rep_mask = valid & shared[np.where(valid, L, 0)]
        rep_slots = np.where(rep_mask)[0]
        # compact group ids over the shared dofs, ordered by global dof
        shared_ids = np.where(shared)[0]
        gid = np.full(n_dofs, -1, dtype=np.int64)
        gid[shared_ids] = np.arange(len(shared_ids))
        self.rep_slots = rep_slots.astype(np.int32)
        self.rep_group = gid[L[rep_slots]].astype(np.int32)
        self.n_groups = len(shared_ids)

    @staticmethod
    def _p1(info: PatchInfo, level: int):
        v = info.vmaps[level]
        nct = 1 << level
        m = nct + 1
        L = v.reshape(-1).copy()
        win = [
            [(0, 0, 0), (0, 1, 0), (0, 0, 1)],  # up:  v0,v1,v2 (CCW)
            [(0, 1, 0), (0, 1, 1), (0, 0, 1)],  # down (CCW)
        ]
        mesh = info.meshes[level]
        return PatchLayout(
            info.C, nct, [(m, m)], win, L.astype(np.int64), mesh.n_points
        )

    @staticmethod
    def _p2(info: PatchInfo):
        d = info.p2map  # [C, 2n+1, 2n+1]
        n = info.n
        # parity planes: EE [n+1,n+1], EO [n+1,n], OE [n,n+1], OO [n,n]
        EE = d[:, ::2, ::2]
        EO = d[:, ::2, 1::2]
        OE = d[:, 1::2, ::2]
        OO = d[:, 1::2, 1::2]
        L = np.concatenate(
            [x.reshape(-1) for x in (EE, EO, OE, OO)]
        ).astype(np.int64)
        planes = [
            (n + 1, n + 1),  # 0: EE
            (n + 1, n),      # 1: EO
            (n, n + 1),      # 2: OE
            (n, n),          # 3: OO
        ]
        # local dof order [v0, v1, v2, mid(v1,v2), mid(v0,v2), mid(v0,v1)]
        # (fem/elements.py P2): up cell (i,j) doubled coords
        #   v0=(2i,2j) v1=(2i+2,2j) v2=(2i,2j+2)
        #   m12=(2i+1,2j+1)=OO(i,j) m02=(2i,2j+1)=EO(i,j) m01=(2i+1,2j)=OE(i,j)
        up = [(0, 0, 0), (0, 1, 0), (0, 0, 1), (3, 0, 0), (1, 0, 0), (2, 0, 0)]
        # down cell (i,j): v0=(2i+2,2j) v1=(2i+2,2j+2) v2=(2i,2j+2)
        #   m12=(2i+1,2j+2)=OE(i,j+1) m02=(2i+1,2j+1)=OO(i,j)
        #   m01=(2i+2,2j+1)=EO(i+1,j)
        dn = [(0, 1, 0), (0, 1, 1), (0, 0, 1), (2, 0, 1), (3, 0, 0), (1, 1, 0)]
        mesh = info.meshes[-1]
        return PatchLayout(
            info.C, n, planes, [up, dn], L, mesh.n_points + mesh.n_edges
        )


# ---------------------------------------------------------------------------
# geometry in patch cell order
# ---------------------------------------------------------------------------
class PatchGeom:
    """Per-cell affine geometry in flat patch cell order [ncp = 2*C*n*n],
    with ZERO geometry (detJ = G = C = 0) on out-of-triangle slots — masked
    cells contribute exactly nothing through every volume form. Same field
    surface as fem.assembly.Geometry."""

    def __init__(self, info: PatchInfo, level=None, dtype=None):
        level = info.k if level is None else level
        mesh = info.meshes[level]
        v = info.vmaps[level]
        nct = 1 << level
        pts = mesh.points_np  # [n_pts, 2] f64
        # corner coords per lattice node (invalid -> 0; masked out below)
        coords = pts[np.clip(v, 0, None)]  # [C, m, m, 2]
        coords[v < 0] = 0.0

        # windows (numpy): up corners (i,j),(i+1,j),(i,j+1); down CCW order
        c = coords

        def w(oa, ob):
            return c[:, oa: oa + nct, ob: ob + nct]

        x0u, x1u, x2u = w(0, 0), w(1, 0), w(0, 1)
        x0d, x1d, x2d = w(1, 0), w(1, 1), w(0, 1)
        ii, jj = np.meshgrid(np.arange(nct), np.arange(nct), indexing="ij")
        valid_up = (ii + jj) <= nct - 1
        valid_dn = (ii + jj) <= nct - 2

        def pack(x):
            return x.reshape(-1, 2)

        X0 = np.concatenate([pack(x0u), pack(x0d)], axis=0)
        X1 = np.concatenate([pack(x1u), pack(x1d)], axis=0)
        X2 = np.concatenate([pack(x2u), pack(x2d)], axis=0)
        cellvalid = np.concatenate(
            [
                np.broadcast_to(valid_up, (info.C,) + valid_up.shape).reshape(-1),
                np.broadcast_to(valid_dn, (info.C,) + valid_dn.shape).reshape(-1),
            ]
        )
        d0 = X1 - X0
        d1 = X2 - X0
        detJ = d0[:, 0] * d1[:, 1] - d0[:, 1] * d1[:, 0]
        assert bool(np.all(detJ[cellvalid] > 0.0)), (
            "patch lattice cell with non-positive area (inverted geometry?)"
        )
        detJ_s = np.where(cellvalid, detJ, 1.0)
        inv = np.stack(
            [
                np.stack([d1[:, 1], -d0[:, 1]], axis=-1),
                np.stack([-d1[:, 0], d0[:, 0]], axis=-1),
            ],
            axis=-2,
        ) / detJ_s[:, None, None]
        detJ = np.where(cellvalid, detJ, 0.0)
        inv[~cellvalid] = 0.0
        Cg = np.einsum("edk,edl->ekl", inv, inv) * detJ[:, None, None]
        X0 = np.where(cellvalid[:, None], X0, 0.0)
        dvecs = np.stack([d0, d1], axis=-1)
        dvecs[~cellvalid] = 0.0

        if dtype is None:
            dtype = mesh.dtype
        from ..utils.hostsetup import setup_on_cpu

        self.dim = 2
        self.cellvalid_np = cellvalid
        with setup_on_cpu():
            self.detJ = jnp.asarray(detJ, dtype=dtype)
            self.G = jnp.asarray(inv, dtype=dtype)
            self.C = jnp.asarray(Cg, dtype=dtype)
            self.cell_x0 = jnp.asarray(X0, dtype=dtype)
            self.dvecs = jnp.asarray(dvecs, dtype=dtype)
            self.cell_d0 = self.dvecs[:, :, 0]
            self.cell_d1 = self.dvecs[:, :, 1]

    def physical_points(self, ref_pts):
        r = jnp.asarray(ref_pts, dtype=self.cell_x0.dtype)
        return self.cell_x0[:, None, :] + jnp.einsum(
            "qk,edk->eqd", r, self.dvecs
        )


# ---------------------------------------------------------------------------
# the space: sliced gather / overlap-add dof_sum / seam exchange
# ---------------------------------------------------------------------------
class PatchSpace:
    """FunctionSpace work-alike over a PatchLayout: same `gather`/`dof_sum`
    surface consumed by fem/forms.py and fem/assembly.py, but with slices
    and dynamic-update-slice adds instead of row gathers/segment sums.
    State vectors are flat [n_flat(,m)] (replica-consistent)."""

    def __init__(self, layout: PatchLayout, mesh, degree, n_components=1):
        from ..utils.hostsetup import setup_on_cpu

        self.layout = layout
        self.mesh = mesh  # the real fine/level mesh: dtype, dim, hmax
        self.degree = degree
        self.n_components = n_components
        self.n_local = 3 if degree == 1 else 6
        self.n_dofs = layout.n_flat  # sized like the flat patch vector
        self.n_true_dofs = layout.n_dofs
        self.dim = 2
        C, nct = layout.C, layout.nct
        self._cshape = (C, nct, nct)
        self._ncp = 2 * C * nct * nct
        with setup_on_cpu():
            self._rep_slots = jnp.asarray(layout.rep_slots)
            self._rep_group = jnp.asarray(layout.rep_group)
            self._weight = jnp.asarray(layout.weight, dtype=mesh.dtype)
            self._slot_of_dof = jnp.asarray(layout.slot_of_dof)
            self._validf = jnp.asarray(
                layout.valid.astype(np.float64), dtype=mesh.dtype
            )

    # -- plane plumbing ------------------------------------------------------
    def _unflatten(self, X):
        lay = self.layout
        t = X.shape[1:]
        out = []
        for p, (a, b) in enumerate(lay.planes):
            o0, o1 = lay.offsets[p], lay.offsets[p + 1]
            out.append(X[o0:o1].reshape((lay.C, a, b) + t))
        return out

    def _flatten(self, planes):
        t = planes[0].shape[3:]
        return jnp.concatenate(
            [p.reshape((-1,) + t) for p in planes], axis=0
        )

    # -- the two hot movements ----------------------------------------------
    def gather(self, X):
        """[n_flat(,m)] -> [ncp, nl(,m)] by plane window slices."""
        lay = self.layout
        nct = lay.nct
        planes = self._unflatten(X)
        blocks = []
        for wspec in lay.win:
            per_dof = []
            for (p, oa, ob) in wspec:
                per_dof.append(planes[p][:, oa: oa + nct, ob: ob + nct])
            blk = jnp.stack(per_dof, axis=3)  # [C, n, n, nl(,m)]
            t = blk.shape[4:]
            blocks.append(blk.reshape((-1, len(wspec)) + t))
        return jnp.concatenate(blocks, axis=0)

    def dof_sum(self, loc):
        """[ncp, nl(,...)] -> [n_flat(,...)]: overlap-add + seam exchange.
        Masked cell slots carry zero contributions (zero geometry), so the
        window adds are unconditional."""
        lay = self.layout
        C, nct = lay.C, lay.nct
        nl = loc.shape[1]
        t = loc.shape[2:]
        half = C * nct * nct
        blocks = [
            loc[:half].reshape((C, nct, nct, nl) + t),
            loc[half:].reshape((C, nct, nct, nl) + t),
        ]
        planes = [
            jnp.zeros((C, a, b) + t, dtype=loc.dtype) for a, b in lay.planes
        ]
        for wspec, blk in zip(lay.win, blocks):
            for l, (p, oa, ob) in enumerate(wspec):
                planes[p] = planes[p].at[
                    :, oa: oa + nct, ob: ob + nct
                ].add(blk[:, :, :, l])
        return self.seam_sum(self._flatten(planes))

    def seam_sum(self, X):
        """Sum replica contributions of each shared dof and broadcast the
        total back to every replica (the only indexed addressing left:
        O(C * n) rows)."""
        vals = X[self._rep_slots]
        sums = jax.ops.segment_sum(
            vals, self._rep_group, num_segments=self.layout.n_groups
        )
        return X.at[self._rep_slots].set(sums[self._rep_group])

    # -- vector-space surface -----------------------------------------------
    def zeros(self):
        shape = (
            (self.n_dofs,)
            if self.n_components == 1
            else (self.n_dofs, self.n_components)
        )
        return jnp.zeros(shape, dtype=self.mesh.dtype)

    def dot(self, x, y):
        """Replica-weighted inner product == the global-layout dot."""
        w = self._weight
        w = w.reshape(w.shape + (1,) * (x.ndim - 1))
        return jnp.sum(w * x * y)

    # -- layout conversions (setup / probes only — these DO gather) ----------
    def to_patch(self, x):
        lay = self.layout
        idx = jnp.asarray(np.clip(lay.L, 0, None))
        v = self._validf
        out = jnp.asarray(x)[idx]
        return out * v.reshape(v.shape + (1,) * (out.ndim - 1))

    def from_patch(self, X):
        return X[self._slot_of_dof]


# ---------------------------------------------------------------------------
# boundary facet tabulation remapped into patch coordinates
# ---------------------------------------------------------------------------
class PatchBoundaryTab:
    """A fine-mesh BoundaryTab re-addressed for patch-flat states: facet dof
    gathers hit representative replica slots, facet geometry (G) is
    pre-gathered per facet (the fine geometry in the facet cell's OWN local
    order, matching the tabulated dphi), and integrate_rhs lands on single
    replicas then seam-broadcasts. O(surface) — plain gathers are fine here.

    Mirrors the ds-terms of /root/reference/flow/navier_stokes/
    pressure_correction.py:134-144 through the patch layout."""

    def __init__(self, btab, space: PatchSpace, fine_geom):
        self.phi = btab.phi
        self.dphi = btab.dphi
        self.wl = btab.wl
        self.normals = btab.normals
        self.x = btab.x
        self.x_np = btab.x_np
        self.nq1 = btab.nq1
        self.space = space
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self.cell_dofs = space._slot_of_dof[btab.cell_dofs]
            self.Gb = fine_geom.G[btab.cells]  # [nb, 2, 2] fine local order

    def gather(self, U):
        return U[self.cell_dofs]

    def values(self, U):
        Uloc = self.gather(U)
        if Uloc.ndim == 2:
            return jnp.einsum("bql,bl->bq", self.phi, Uloc)
        return jnp.einsum("bql,blm->bqm", self.phi, Uloc)

    def grads(self, U, geom=None):
        # geom ignored: the facet-cell G is pre-gathered in the matching
        # (fine-mesh) local dof order
        Uloc = self.gather(U)
        if Uloc.ndim == 2:
            return jnp.einsum("bqlk,bdk,bl->bqd", self.dphi, self.Gb, Uloc)
        return jnp.einsum("bqlk,bdk,blm->bqmd", self.dphi, self.Gb, Uloc)

    def integrate_rhs(self, val):
        if val.ndim == 2:
            loc = jnp.einsum("bq,bq,bqi->bi", val, self.wl, self.phi)
        else:
            loc = jnp.einsum("bqm,bq,bqi->bim", val, self.wl, self.phi)
        flat_dofs = self.cell_dofs.reshape(-1)
        flat = loc.reshape((-1,) + loc.shape[2:])
        out = jnp.zeros(
            (self.space.n_dofs,) + flat.shape[1:], dtype=flat.dtype
        )
        out = out.at[flat_dofs].add(flat)
        # contributions landed on single replicas; make them consistent
        return self.space.seam_sum(out)

    def integrate_scalar(self, val):
        return jnp.einsum("bq,bq->", val, self.wl)
