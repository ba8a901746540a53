# Tetrahedral meshes — 3-D capability beyond the 2-D-only reference
# (SURVEY.md §7 stage 9: the 50M-DoF 3-D Boussinesq target of
# BASELINE.json config 5 needs tets; the reference's SUPG C++ is hardcoded
# to triangles, /root/reference/flow/stabilization.py:84).
#
# Same design as mesh.py: host-built flat static arrays, frozen to jnp.
# Interface-compatible with fem/spaces.py (cells, edges, cell_edges,
# boundary_edges, dim, dtype, n_points/n_cells/n_edges, hmax/hmin).
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["TetMesh", "box_mesh", "refine_uniform_tet"]

# Kuhn decomposition of the unit cube into 6 tets sharing the main diagonal
# (0,0,0)-(1,1,1): consistent across neighboring cubes (no orientation
# conflicts on shared faces).
_KUHN = [
    (0, 1, 3, 7),
    (0, 1, 5, 7),
    (0, 2, 3, 7),
    (0, 2, 6, 7),
    (0, 4, 5, 7),
    (0, 4, 6, 7),
]

_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
_TET_FACES = [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)]


class TetMesh:
    dim = 3

    def __init__(self, points, cells, dtype=None):
        points = np.asarray(points, dtype=np.float64)[:, :3]
        cells = np.asarray(cells, dtype=np.int32)

        # orient cells positively (detJ > 0)
        p = points
        d = p[cells[:, 1:]] - p[cells[:, 0]][:, None, :]  # [nt, 3, 3]
        det = np.linalg.det(d)
        flip = det < 0
        cells = cells.copy()
        cells[flip] = cells[flip][:, [0, 2, 1, 3]]

        nc = len(cells)
        # edges (for P2 dofs): canonical pair order per cell
        e_all = np.concatenate(
            [cells[:, [a, b]] for a, b in _TET_EDGES], axis=0
        )  # [6*nc, 2], k-major
        e_sorted = np.sort(e_all, axis=1)
        edges, inverse = np.unique(e_sorted, axis=0, return_inverse=True)
        cell_edges = inverse.reshape(6, nc).T.astype(np.int32)

        # boundary faces: triples appearing once
        f_all = np.concatenate(
            [cells[:, list(f)] for f in _TET_FACES], axis=0
        )  # [4*nc, 3]
        f_sorted = np.sort(f_all, axis=1)
        faces, finv, fcounts = np.unique(
            f_sorted, axis=0, return_inverse=True, return_counts=True
        )
        bnd_face_ids = np.where(fcounts == 1)[0]
        order = np.argsort(finv, kind="stable")
        first = order[np.searchsorted(finv[order], bnd_face_ids)]
        self.boundary_cells_np = (first % nc).astype(np.int32)
        self.boundary_local_np = (first // nc).astype(np.int32)
        self.boundary_faces_np = faces[bnd_face_ids].astype(np.int32)

        # boundary vertices and edges
        bnd_vertex = np.zeros(len(points), dtype=bool)
        bnd_vertex[self.boundary_faces_np.ravel()] = True
        # an edge is on the boundary iff both endpoints lie on a common
        # boundary face; mark edges contained in any boundary face
        face_edge = np.concatenate(
            [
                np.sort(self.boundary_faces_np[:, [i, j]], axis=1)
                for i, j in [(0, 1), (0, 2), (1, 2)]
            ],
            axis=0,
        )
        edge_id = {}
        for i, (a, b) in enumerate(edges):
            edge_id[(int(a), int(b))] = i
        bnd_edge = np.zeros(len(edges), dtype=bool)
        for a, b in face_edge:
            bnd_edge[edge_id[(int(a), int(b))]] = True
        self.boundary_edges_np = np.where(bnd_edge)[0].astype(np.int32)

        elen = np.linalg.norm(
            p[e_all[:, 1]] - p[e_all[:, 0]], axis=1
        ).reshape(6, nc)
        h_cell = elen.max(axis=0)
        self.hmax = float(h_cell.max())
        self.hmin = float(h_cell.min())

        if dtype is None:
            dtype = jnp.zeros(0).dtype
        self.dtype = dtype
        self.points_np = points
        self.cells_np = cells
        self.edges_np = edges.astype(np.int32)
        self.cell_edges_np = cell_edges

        # device mirrors on the CPU backend (see mesh.py / utils/hostsetup.py)
        from .utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self.points = jnp.asarray(points, dtype=dtype)
            self.cells = jnp.asarray(cells)
            self.edges = jnp.asarray(self.edges_np)
            self.cell_edges = jnp.asarray(cell_edges)

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
        d = p[c[:, 1:]] - p[c[:, 0]][:, None, :]
        return np.linalg.det(d) / 6.0

    def __repr__(self):
        return (
            f"TetMesh(n_points={self.n_points}, n_cells={self.n_cells}, "
            f"hmax={self.hmax:.3e})"
        )


def box_mesh(p0, p1, nx, ny, nz, dtype=None):
    """Structured Kuhn tetrahedralization of the box [p0, p1]."""
    x0, y0, z0 = p0
    x1, y1, z1 = p1
    xs = np.linspace(x0, x1, nx + 1)
    ys = np.linspace(y0, y1, ny + 1)
    zs = np.linspace(z0, z1, nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    I, J, K = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    I, J, K = I.ravel(), J.ravel(), K.ravel()
    # cube corner ids: bit 0 -> x, bit 1 -> y, bit 2 -> z
    corners = np.stack(
        [vid(I + (c & 1), J + ((c >> 1) & 1), K + ((c >> 2) & 1)) for c in range(8)],
        axis=1,
    )  # [ncube, 8]
    cells = np.concatenate([corners[:, list(t)] for t in _KUHN], axis=0)
    mesh = TetMesh(pts, cells, dtype=dtype)
    # structured-grid metadata: lexicographic (i, j, k) vertex layout —
    # unlocks the stencil/convolution fast path (ops/structured.py)
    mesh.grid_shape = (nx + 1, ny + 1, nz + 1)
    mesh.grid_spacing = (
        (x1 - x0) / nx,
        (y1 - y0) / ny,
        (z1 - z0) / nz,
    )
    return mesh


def refine_uniform_tet(mesh: TetMesh):
    """Uniform refinement: each tet into 8 (4 corners + octahedron split
    along the (m01, m23) diagonal). Frees the 3-D multigrid hierarchy."""
    p = mesh.points_np
    c = mesh.cells_np
    e = mesh.edges_np
    ce = mesh.cell_edges_np  # edge order: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3)
    n_old = len(p)

    mid = 0.5 * (p[e[:, 0]] + p[e[:, 1]])
    new_pts = np.concatenate([p, mid], axis=0)

    m = n_old + ce  # [nt, 6] midpoint ids: m01,m02,m03,m12,m13,m23
    v0, v1, v2, v3 = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    m01, m02, m03, m12, m13, m23 = (m[:, k] for k in range(6))
    tets = [
        (v0, m01, m02, m03),
        (v1, m01, m12, m13),
        (v2, m02, m12, m23),
        (v3, m03, m13, m23),
        # octahedron: diagonal m01-m23
        (m01, m02, m03, m23),
        (m01, m02, m12, m23),
        (m01, m03, m13, m23),
        (m01, m12, m13, m23),
    ]
    new_cells = np.concatenate(
        [np.stack(t, axis=1) for t in tets], axis=0
    )
    return TetMesh(new_pts, new_cells, dtype=mesh.dtype)
