# Native meshkit engine (C++/ctypes) vs the numpy fallback: outputs must be
# bit-identical, so goldens don't depend on which path built the mesh.
import numpy as np

from flow_tpu import native, unit_square_mesh, rectangle_with_hole_mesh


def _numpy_edges(cells):
    nc = len(cells)
    e_all = np.concatenate(
        [cells[:, [1, 2]], cells[:, [2, 0]], cells[:, [0, 1]]], axis=0
    )
    e_sorted = np.sort(e_all, axis=1)
    edges, inverse, counts = np.unique(
        e_sorted, axis=0, return_inverse=True, return_counts=True
    )
    cell_edges = inverse.reshape(3, nc).T.astype(np.int32)
    bnd = np.where(counts == 1)[0].astype(np.int32)
    return edges.astype(np.int32), cell_edges, bnd


def test_native_builds():
    assert native.available(), "libmeshkit.so failed to build"


def test_build_edges_matches_numpy():
    for mesh in [
        unit_square_mesh(9, diagonal="crossed"),
        rectangle_with_hole_mesh(0.0, 0.6, -0.07, 0.07, 0.1, 0.01, 0.02, 0.03),
    ]:
        cells = mesh.cells_np
        e1, ce1, b1 = native.build_edges(cells)
        e2, ce2, b2 = _numpy_edges(cells)
        np.testing.assert_array_equal(e1, e2)
        np.testing.assert_array_equal(ce1, ce2)
        np.testing.assert_array_equal(b1, b2)


def test_rcm_reduces_bandwidth():
    mesh = unit_square_mesh(20, diagonal="crossed")
    edges = mesh.edges_np
    n = mesh.n_points
    perm = native.rcm_order(n, edges)
    assert sorted(perm.tolist()) == list(range(n))
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    bw_before = np.abs(edges[:, 0] - edges[:, 1]).max()
    bw_after = np.abs(inv[edges[:, 0]] - inv[edges[:, 1]]).max()
    assert bw_after < bw_before


def test_mesh_save_load(tmp_path):
    import os
    from flow_tpu.mesh import save_mesh, load_mesh
    from flow_tpu.mesh3d import box_mesh

    m2 = unit_square_mesh(5, diagonal="crossed")
    p = os.path.join(tmp_path, "m2.npz")
    save_mesh(p, m2)
    r2 = load_mesh(p)
    np.testing.assert_array_equal(r2.cells_np, m2.cells_np)
    np.testing.assert_array_equal(r2.points_np, m2.points_np)

    m3 = box_mesh((0, 0, 0), (1, 1, 1), 2, 2, 2)
    p3 = os.path.join(tmp_path, "m3.npz")
    save_mesh(p3, m3)
    r3 = load_mesh(p3)
    assert r3.dim == 3
    np.testing.assert_array_equal(r3.cells_np, m3.cells_np)


def test_reorder_rcm_bandwidth_and_invariance():
    # reorder_rcm is a pure renumbering: same triangulation (as a set of
    # vertex-coordinate triangles), reduced edge-graph bandwidth
    import numpy as np
    from flow_tpu.mesh import rectangle_with_hole_mesh
    from flow_tpu import native

    kw = dict(x0=0.0, x1=2.2, y0=0.0, y1=0.41, cx=0.2, cy=0.2, r=0.05,
              lcar=0.05)
    m0 = rectangle_with_hole_mesh(rcm=False, **kw)
    m1 = rectangle_with_hole_mesh(rcm=True, **kw)
    assert m0.n_points == m1.n_points and m0.n_cells == m1.n_cells

    def tri_set(m):
        pts = np.round(m.points_np[m.cells_np], 9)  # [nc,3,2]
        # canonical per-cell: sort the 3 vertices lexicographically
        keys = [tuple(sorted(map(tuple, c))) for c in pts]
        return set(keys)

    assert tri_set(m0) == tri_set(m1)

    def bandwidth(m):
        e = m.edges_np
        return int(np.max(np.abs(e[:, 0].astype(int) - e[:, 1]))), \
            float(np.mean(np.abs(e[:, 0].astype(int) - e[:, 1])))

    bw0, avg0 = bandwidth(m0)
    bw1, avg1 = bandwidth(m1)
    # grid-generated meshes are already banded: reorder must never worsen
    assert avg1 <= avg0 + 1e-12, (avg0, avg1)
    # cells must sweep vertex memory monotonically (Delaunay order is
    # quasi-random): min-vertex sequence is sorted after reorder
    mins1 = m1.cells_np.min(axis=1)
    assert np.all(np.diff(mins1.astype(int)) >= 0)
    # ... and RCM genuinely reduces bandwidth on a scrambled numbering
    rng = np.random.default_rng(0)
    perm = rng.permutation(m0.n_points)
    inv = np.empty_like(perm); inv[perm] = np.arange(len(perm))
    from flow_tpu.mesh import reorder_rcm
    p_s, c_s = m0.points_np[perm], inv[m0.cells_np].astype(np.int32)
    e_s = np.sort(np.concatenate([c_s[:, [1, 2]], c_s[:, [2, 0]], c_s[:, [0, 1]]]), axis=1)
    avg_scrambled = float(np.mean(np.abs(e_s[:, 0].astype(int) - e_s[:, 1])))
    p_r, c_r = reorder_rcm(p_s, c_s)
    e_r = np.sort(np.concatenate([c_r[:, [1, 2]], c_r[:, [2, 0]], c_r[:, [0, 1]]]), axis=1)
    avg_rcm = float(np.mean(np.abs(e_r[:, 0].astype(int) - e_r[:, 1])))
    assert avg_rcm < 0.2 * avg_scrambled, (avg_scrambled, avg_rcm)

    # physics invariance: total area and stiffness action norm match
    from flow_tpu import FunctionSpace, project
    from flow_tpu.fem import assembly
    from flow_tpu.fem.assembly import geometry

    for m in (m0, m1):
        Q = FunctionSpace(m, 1)
        f = project(lambda x: x[..., 0] ** 2 + x[..., 1], Q)
        y = assembly.stiffness_apply(Q, geometry(m), f.vector)
        m._stiff_norm = float(np.linalg.norm(np.asarray(y)))
        m._area = float(np.sum(np.asarray(m.cell_volumes())))
    assert abs(m0._area - m1._area) < 1e-12
    assert abs(m0._stiff_norm - m1._stiff_norm) < 1e-9 * m0._stiff_norm
