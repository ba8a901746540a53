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
