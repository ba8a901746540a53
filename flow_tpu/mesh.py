# Triangle meshes as flat, static-shape arrays — the TPU-native replacement for
# the DOLFIN C++ mesh runtime the reference delegates to (every
# `from dolfin import Mesh, UnitSquareMesh, RectangleMesh` in
# /root/reference/tests/*.py).
#
# Design: all topology is built host-side with numpy (setup cost, once), then
# frozen into jnp arrays with static shapes so every downstream computation
# (assembly, solves, time loops) jit-compiles cleanly.
#
# Local conventions (used consistently across fem/):
#   * cells are counterclockwise (det of the affine Jacobian > 0),
#   * local edge k of a cell is the edge *opposite* local vertex k, i.e. it
#     connects local vertices (k+1)%3 and (k+2)%3 — this matches the P2 dof
#     numbering in fem/elements.py (dof 3+k = midpoint of edge k).
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "Mesh",
    "unit_square_mesh",
    "rectangle_mesh",
    "refine_uniform",
    "rectangle_with_hole_mesh",
    "save_mesh",
    "load_mesh",
]

# 2-D Mesh also carries dim for dimension-generic consumers



class Mesh:
    dim = 2

    """An immutable 2-D triangle mesh.

    Attributes (all jnp arrays unless noted):
      points            [n_points, 2] float
      cells             [n_cells, 3] int32, CCW
      edges             [n_edges, 2] int32, each row sorted, unique
      cell_edges        [n_cells, 3] int32 — global edge index of local edge k
      boundary_edges    [n_bnd] int32 — indices into `edges`
      boundary_cells    [n_bnd] int32 — the (unique) cell adjacent to each
                        boundary edge
      boundary_local    [n_bnd] int32 — local edge index within that cell
      boundary_normals  [n_bnd, 2] float — unit outward normals
      boundary_lengths  [n_bnd] float
      hmax, hmin        python floats — max/min cell diameter (longest edge),
                        mirroring dolfin's mesh.hmax()/hmin()
    """

    def __init__(self, points, cells, dtype=None):
        points = np.asarray(points, dtype=np.float64)[:, :2]
        cells = np.asarray(cells, dtype=np.int32)
        # Orient all cells counterclockwise.
        p = points
        d0 = p[cells[:, 1]] - p[cells[:, 0]]
        d1 = p[cells[:, 2]] - p[cells[:, 0]]
        det = d0[:, 0] * d1[:, 1] - d0[:, 1] * d1[:, 0]
        flip = det < 0
        cells = cells.copy()
        cells[flip] = cells[flip][:, [0, 2, 1]]

        # --- edge topology -------------------------------------------------
        # local edge k is opposite local vertex k: (k+1)%3, (k+2)%3.
        # Built by the native meshkit engine when available (C++, ctypes —
        # the DOLFIN-mesh-runtime replacement, native/meshkit.cpp), with a
        # bit-identical numpy fallback.
        from . import native

        nc = len(cells)
        edges, cell_edges, bnd_edge_ids = native.build_edges(cells)

        # find (cell, local) for each boundary edge (exactly one occurrence)
        flat = cell_edges.ravel()
        order = np.argsort(flat, kind="stable")
        occurrence = order[np.searchsorted(flat[order], bnd_edge_ids)]
        boundary_cells = (occurrence // 3).astype(np.int32)
        boundary_local = (occurrence % 3).astype(np.int32)
        e_all = np.concatenate(
            [cells[:, [1, 2]], cells[:, [2, 0]], cells[:, [0, 1]]], axis=0
        )

        # outward normals: edge k (opposite vertex k) of a CCW triangle has
        # outward normal = rotate (v_{k+2} - v_{k+1}) by -90deg
        a = cells[boundary_cells, (boundary_local + 1) % 3]
        b = cells[boundary_cells, (boundary_local + 2) % 3]
        t = p[b] - p[a]
        lengths = np.linalg.norm(t, axis=1)
        normals = np.stack([t[:, 1], -t[:, 0]], axis=1) / lengths[:, None]

        # cell sizes
        el = p[e_all[:, 1]] - p[e_all[:, 0]]
        elen = np.linalg.norm(el, axis=1).reshape(3, nc)
        h_cell = elen.max(axis=0)
        self.hmax = float(h_cell.max())
        self.hmin = float(h_cell.min())

        if dtype is None:
            dtype = jnp.zeros(0).dtype  # respects jax_enable_x64
        self.dtype = dtype
        # host copies (numpy) for setup-time consumers
        self.points_np = points
        self.cells_np = cells
        self.edges_np = edges.astype(np.int32)
        self.cell_edges_np = cell_edges
        self.boundary_edges_np = bnd_edge_ids
        self.boundary_cells_np = boundary_cells
        self.boundary_local_np = boundary_local
        self.boundary_normals_np = normals
        self.boundary_lengths_np = lengths

        # device arrays — created on the host CPU backend: setup-time eager
        # consumers (geometry, tabulations, adjacency) then stay off the TPU
        # tunnel (whose per-op dispatch/transfer cost is enormous); jitted
        # hot-path programs move them to the accelerator once as constants
        from .utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self.points = jnp.asarray(points, dtype=dtype)
            self.cells = jnp.asarray(cells)
            self.edges = jnp.asarray(self.edges_np)
            self.cell_edges = jnp.asarray(cell_edges)
            self.boundary_edges = jnp.asarray(bnd_edge_ids)
            self.boundary_cells = jnp.asarray(boundary_cells)
            self.boundary_local = jnp.asarray(boundary_local)
            self.boundary_normals = jnp.asarray(normals, dtype=dtype)
            self.boundary_lengths = jnp.asarray(lengths, dtype=dtype)

    @property
    def n_points(self):
        return self.points_np.shape[0]

    @property
    def n_cells(self):
        return self.cells_np.shape[0]

    @property
    def n_edges(self):
        return self.edges_np.shape[0]

    def cell_volumes(self):
        p = self.points_np
        c = self.cells_np
        d0 = p[c[:, 1]] - p[c[:, 0]]
        d1 = p[c[:, 2]] - p[c[:, 0]]
        return 0.5 * (d0[:, 0] * d1[:, 1] - d0[:, 1] * d1[:, 0])

    def __repr__(self):
        return (
            f"Mesh(n_points={self.n_points}, n_cells={self.n_cells}, "
            f"hmax={self.hmax:.3e})"
        )


def _grid_points(x0, y0, x1, y1, nx, ny):
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    return np.stack([X.ravel(), Y.ravel()], axis=1), xs, ys


def rectangle_mesh(p0, p1, nx, ny, diagonal="right", dtype=None):
    """Structured triangulation of the rectangle [p0, p1].

    ``diagonal`` in {'left', 'right', 'left/right', 'right/left', 'crossed'},
    matching dolfin's RectangleMesh options used by the reference's order
    tests (/root/reference/tests/test_navier_stokes.py:82,144,176,202).
    """
    x0, y0 = p0
    x1, y1 = p1
    pts, _, _ = _grid_points(x0, y0, x1, y1, nx, ny)

    def vid(i, j):
        return i * (ny + 1) + j

    cells = []
    if diagonal == "crossed":
        # one center point per quad, 4 triangles
        centers = []
        cidx0 = (nx + 1) * (ny + 1)
        for i in range(nx):
            for j in range(ny):
                v00, v10 = vid(i, j), vid(i + 1, j)
                v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
                cc = cidx0 + i * ny + j
                centers.append(0.25 * (pts[v00] + pts[v10] + pts[v01] + pts[v11]))
                cells += [
                    [v00, v10, cc],
                    [v10, v11, cc],
                    [v11, v01, cc],
                    [v01, v00, cc],
                ]
        pts = np.concatenate([pts, np.array(centers)], axis=0)
    else:
        for i in range(nx):
            for j in range(ny):
                v00, v10 = vid(i, j), vid(i + 1, j)
                v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
                if diagonal == "left":
                    left = True
                elif diagonal == "right":
                    left = False
                elif diagonal == "left/right":
                    left = (i + j) % 2 == 0
                elif diagonal == "right/left":
                    left = (i + j) % 2 == 1
                else:
                    raise ValueError(f"unknown diagonal {diagonal!r}")
                if left:
                    # diagonal from (i, j+1) to (i+1, j)
                    cells += [[v00, v10, v01], [v10, v11, v01]]
                else:
                    # diagonal from (i, j) to (i+1, j+1)
                    cells += [[v00, v10, v11], [v00, v11, v01]]
    mesh = Mesh(pts, np.array(cells, dtype=np.int32), dtype=dtype)
    if diagonal in ("left", "right"):
        # uniform-diagonal grids have a translation-invariant interior
        # stencil — the structured fast path (ops/structured.py) applies
        mesh.grid_shape = (nx + 1, ny + 1)
        mesh.grid_spacing = ((x1 - x0) / nx, (y1 - y0) / ny)
    return mesh


def unit_square_mesh(n, diagonal="right", dtype=None):
    """dolfin UnitSquareMesh(n, n, diagonal) equivalent."""
    return rectangle_mesh((0.0, 0.0), (1.0, 1.0), n, n, diagonal=diagonal, dtype=dtype)


def refine_uniform(mesh: Mesh, snap_boundary=None):
    """Uniform red refinement: each triangle into 4. Returns the fine mesh.

    This is what makes geometric multigrid hierarchies free: generate coarse
    meshes and refine (SURVEY.md §7 hard part #2 — the BoomerAMG replacement
    strategy). ``snap_boundary`` optionally maps new boundary midpoints onto a
    curved boundary (e.g. the cylinder of the Kármán geometry).
    """
    p = mesh.points_np
    c = mesh.cells_np
    e = mesh.edges_np
    ce = mesh.cell_edges_np
    n_old = len(p)

    mid = 0.5 * (p[e[:, 0]] + p[e[:, 1]])
    if snap_boundary is not None:
        bnd = mesh.boundary_edges_np
        mid[bnd] = snap_boundary(mid[bnd])
    new_pts = np.concatenate([p, mid], axis=0)

    m = n_old + ce  # [nc, 3] midpoint vertex index of local edge k
    v0, v1, v2 = c[:, 0], c[:, 1], c[:, 2]
    m0, m1, m2 = m[:, 0], m[:, 1], m[:, 2]
    new_cells = np.concatenate(
        [
            np.stack([v0, m2, m1], axis=1),
            np.stack([v1, m0, m2], axis=1),
            np.stack([v2, m1, m0], axis=1),
            np.stack([m0, m1, m2], axis=1),
        ],
        axis=0,
    )
    out = Mesh(new_pts, new_cells, dtype=mesh.dtype)
    # record the refinement parentage: lets consumers (multigrid, the
    # packed-patch backend of the public schemes) rediscover the hierarchy
    # from the fine mesh alone (navier_stokes/packedapi.py)
    out._coarse = mesh
    return out


def reorder_rcm(points, cells, only_if_better=True, return_perm=False):
    """Bandwidth-reducing host-side reorder: vertices by reverse
    Cuthill-McKee on the edge graph (native.rcm_order), cells sorted by
    their minimum new vertex id. Gathers over `cells`/dof tables then sweep
    memory near-monotonically — the locality lever for the TPU gather-bound
    assembly hot path. Pure renumbering: the discrete operators are
    permutation-equivalent.

    With only_if_better (default), the RCM vertex permutation is kept only
    when it reduces the mean edge bandwidth — grid-generated meshes are
    already near-optimally banded and RCM can be slightly worse there; the
    cell sort is always applied (Delaunay emits cells in quasi-random
    order)."""
    from . import native

    points = np.asarray(points)
    cells = np.asarray(cells, dtype=np.int32)
    edges, _, _ = native.build_edges(cells)

    def mean_bw(e):
        return float(np.mean(np.abs(e[:, 0].astype(np.int64) - e[:, 1])))

    perm = np.asarray(native.rcm_order(len(points), edges))  # new -> old
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    if only_if_better and mean_bw(inv[edges]) >= mean_bw(edges):
        points2, cells2 = points, cells  # keep the existing banded order
        inv = np.arange(len(points), dtype=perm.dtype)
    else:
        points2, cells2 = points[perm], inv[cells].astype(np.int32)
    order = np.argsort(cells2.min(axis=1), kind="stable")
    if return_perm:
        # inv: old -> new vertex id; order: new cell k was cells row order[k]
        return points2, cells2[order], inv, order
    return points2, cells2[order]


def rectangle_with_hole_mesh(
    x0, x1, y0, y1, cx, cy, r, lcar, dtype=None, smooth_iters=30, rcm=True
):
    """Unstructured-quality triangle mesh of a rectangle with a circular hole.

    Replaces the reference's pygmsh/gmsh meshes
    (/root/reference/tests/test_karman_vortex_street.py:26-53,
    test_boussinesq.py:25-79, test_sealed_box.py:32-53): structured background
    grid, cells inside the circle removed, near-circle vertices snapped onto
    the circle, Laplacian-smoothed for quality.
    """
    nx = max(4, int(round((x1 - x0) / lcar)))
    ny = max(4, int(round((y1 - y0) / lcar)))
    hx = (x1 - x0) / nx
    hy = (y1 - y0) / ny
    h = min(hx, hy)

    pts, _, _ = _grid_points(x0, y0, x1, y1, nx, ny)

    # Snap grid points near the circle onto it; drop points well inside.
    d = np.linalg.norm(pts - [cx, cy], axis=1) - r
    snap = np.abs(d) < 0.5 * h
    theta = np.arctan2(pts[:, 1] - cy, pts[:, 0] - cx)
    pts[snap] = np.stack([cx + r * np.cos(theta[snap]), cy + r * np.sin(theta[snap])], 1)
    d = np.linalg.norm(pts - [cx, cy], axis=1) - r

    keep = d > -1e-12
    # never move/drop the outer rectangle boundary points
    on_rect = (
        (np.abs(pts[:, 0] - x0) < 1e-12)
        | (np.abs(pts[:, 0] - x1) < 1e-12)
        | (np.abs(pts[:, 1] - y0) < 1e-12)
        | (np.abs(pts[:, 1] - y1) < 1e-12)
    )
    keep |= on_rect

    import scipy.spatial  # host-side only; setup cost

    kept = np.where(keep)[0]
    pk = pts[kept]
    tri = scipy.spatial.Delaunay(pk)
    cells = tri.simplices.astype(np.int32)
    # remove cells whose centroid is inside the circle
    cent = pk[cells].mean(axis=1)
    inside = np.linalg.norm(cent - [cx, cy], axis=1) < r * (1.0 - 1e-9)
    # remove degenerate slivers on the circle
    d0 = pk[cells[:, 1]] - pk[cells[:, 0]]
    d1 = pk[cells[:, 2]] - pk[cells[:, 0]]
    area = 0.5 * np.abs(d0[:, 0] * d1[:, 1] - d0[:, 1] * d1[:, 0])
    degenerate = area < 1e-6 * h * h
    cells = cells[~inside & ~degenerate]

    # drop unused points, Laplacian smoothing on interior points
    used = np.unique(cells)
    remap = -np.ones(len(pk), dtype=np.int64)
    remap[used] = np.arange(len(used))
    pk = pk[used]
    cells = remap[cells].astype(np.int32)

    on_circle = np.abs(np.linalg.norm(pk - [cx, cy], axis=1) - r) < 1e-9
    on_rect = (
        (np.abs(pk[:, 0] - x0) < 1e-12)
        | (np.abs(pk[:, 0] - x1) < 1e-12)
        | (np.abs(pk[:, 1] - y0) < 1e-12)
        | (np.abs(pk[:, 1] - y1) < 1e-12)
    )
    fixed = on_circle | on_rect

    # adjacency via edges
    e_all = np.concatenate([cells[:, [1, 2]], cells[:, [2, 0]], cells[:, [0, 1]]], 0)
    e_all = np.unique(np.sort(e_all, axis=1), axis=0)
    for _ in range(smooth_iters):
        acc = np.zeros_like(pk)
        cnt = np.zeros(len(pk))
        np.add.at(acc, e_all[:, 0], pk[e_all[:, 1]])
        np.add.at(acc, e_all[:, 1], pk[e_all[:, 0]])
        np.add.at(cnt, e_all[:, 0], 1)
        np.add.at(cnt, e_all[:, 1], 1)
        new = acc / np.maximum(cnt, 1)[:, None]
        pk = np.where(fixed[:, None], pk, new)
    if rcm:
        pk, cells = reorder_rcm(pk, cells)
    return Mesh(pk, cells, dtype=dtype)


def save_mesh(path, mesh):
    """Cache a mesh to .npz (the role of the reference's .msh cache files,
    /root/reference/tests/test_boussinesq.py:55-58)."""
    np.savez(
        path,
        points=mesh.points_np,
        cells=mesh.cells_np,
        dim=np.asarray(getattr(mesh, "dim", 2)),
    )


def load_mesh(path, dtype=None):
    """Load a mesh cached by save_mesh (2-D triangles or 3-D tets)."""
    data = np.load(path)
    if int(data["dim"]) == 3:
        from .mesh3d import TetMesh

        return TetMesh(data["points"], data["cells"], dtype=dtype)
    return Mesh(data["points"], data["cells"], dtype=dtype)
