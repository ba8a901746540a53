# Gmsh .msh import (v2.2 and v4.1 ASCII) — mesh-file parity with the
# reference's external-mesh workflows (dolfin Mesh('test.xml'),
# /root/reference/tests/test_karman_vortex_street.py:53; pygmsh .msh caches,
# tests/test_boussinesq.py:55-58).
import numpy as np
import pytest

from flow_tpu.io import read_msh


# unit square split into 4 triangles around a center vertex; node tags are
# deliberately sparse/non-contiguous (gmsh never guarantees dense numbering)
MSH22 = """\
$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
5
1 0 0 0
2 1 0 0
4 1 1 0
7 0 1 0
9 0.5 0.5 0
$EndNodes
$Elements
7
1 15 2 0 1 1
2 1 2 0 1 1 2
3 1 2 0 2 2 4
4 2 2 0 6 1 2 9
5 2 2 0 6 2 4 9
6 2 2 0 6 4 7 9
7 2 2 0 6 7 1 9
$EndElements
"""

MSH41 = """\
$MeshFormat
4.1 0 8
$EndMeshFormat
$Nodes
1 5 1 9
2 1 0 5
1
2
4
7
9
0 0 0
1 0 0
1 1 0
0 1 0
0.5 0.5 0
$EndNodes
$Elements
2 6 1 7
1 1 1 2
1 1 2
2 2 4
2 1 2 4
4 1 2 9
5 2 4 9
6 4 7 9
7 7 1 9
$EndElements
"""


@pytest.mark.parametrize("content", [MSH22, MSH41], ids=["v2.2", "v4.1"])
def test_read_msh_square(tmp_path, content):
    p = tmp_path / "square.msh"
    p.write_text(content)
    mesh = read_msh(str(p))
    assert mesh.n_points == 5
    assert mesh.n_cells == 4
    # total area and positive orientation
    np.testing.assert_allclose(float(np.sum(np.asarray(mesh.cell_volumes()))), 1.0)
    from flow_tpu.fem.assembly import geometry

    g = geometry(mesh)
    assert float(np.min(np.asarray(g.detJ))) > 0  # orientation normalized
    # boundary topology: 4 boundary edges
    assert len(mesh.boundary_edges_np) == 4
    # usable downstream: a P1 space + interpolation
    from flow_tpu import FunctionSpace, project

    Q = FunctionSpace(mesh, 1)
    f = project(lambda x: x[..., 0] + 2 * x[..., 1], Q)
    got = np.asarray(f.vector)
    want = mesh.points_np @ [1.0, 2.0]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_read_msh_tet(tmp_path):
    # one reference tet, v2.2
    content = """\
$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 0 1 0
4 0 0 1
$EndNodes
$Elements
1
1 4 2 0 1 1 2 3 4
$EndElements
"""
    p = tmp_path / "tet.msh"
    p.write_text(content)
    mesh = read_msh(str(p))
    assert mesh.dim == 3
    assert mesh.n_cells == 1
    np.testing.assert_allclose(
        float(np.sum(np.asarray(mesh.cell_volumes()))), 1.0 / 6.0
    )


# ---------------------------------------------------------------------------
# physical groups + binary formats
# ---------------------------------------------------------------------------
MSH22_GROUPS = """\
$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
3
1 10 "bottom"
1 20 "right"
2 6 "fluid"
$EndPhysicalNames
$Nodes
5
1 0 0 0
2 1 0 0
4 1 1 0
7 0 1 0
9 0.5 0.5 0
$EndNodes
$Elements
6
1 1 2 10 1 1 2
2 1 2 20 2 2 4
3 2 2 6 6 1 2 9
4 2 2 6 6 2 4 9
5 2 2 6 6 4 7 9
6 2 2 6 6 7 1 9
$EndElements
"""

_PTS = {
    1: (0.0, 0.0, 0.0),
    2: (1.0, 0.0, 0.0),
    4: (1.0, 1.0, 0.0),
    7: (0.0, 1.0, 0.0),
    9: (0.5, 0.5, 0.0),
}
_TRIS = [(3, 1, 2, 9), (4, 2, 4, 9), (5, 4, 7, 9), (6, 7, 1, 9)]


def _msh22_binary():
    import struct

    out = [b"$MeshFormat\n2.2 1 8\n", struct.pack("<i", 1), b"\n",
           b"$EndMeshFormat\n"]
    out.append(
        b'$PhysicalNames\n3\n1 10 "bottom"\n1 20 "right"\n2 6 "fluid"\n'
        b"$EndPhysicalNames\n"
    )
    out.append(b"$Nodes\n5\n")
    for t, xyz in _PTS.items():
        out.append(struct.pack("<i3d", t, *xyz))
    out.append(b"\n$EndNodes\n$Elements\n6\n")
    # line block: etype=1, nel=2, ntags=2; per elem: tag phys elementary n0 n1
    out.append(struct.pack("<3i", 1, 2, 2))
    out.append(struct.pack("<5i", 1, 10, 1, 1, 2))
    out.append(struct.pack("<5i", 2, 20, 2, 2, 4))
    # tri block
    out.append(struct.pack("<3i", 2, 4, 2))
    for t, a, b, c in _TRIS:
        out.append(struct.pack("<6i", t, 6, 6, a, b, c))
    out.append(b"\n$EndElements\n")
    return b"".join(out)


def _msh41_binary():
    import struct

    out = [b"$MeshFormat\n4.1 1 8\n", struct.pack("<i", 1), b"\n",
           b"$EndMeshFormat\n"]
    out.append(
        b'$PhysicalNames\n3\n1 10 "bottom"\n1 20 "right"\n2 6 "fluid"\n'
        b"$EndPhysicalNames\n"
    )
    # entities: 0 points, 2 curves (phys 10, 20), 1 surface (phys 6), 0 vols
    ent = [struct.pack("<4Q", 0, 2, 1, 0)]
    for tag, phys in ((1, 10), (2, 20)):
        ent.append(struct.pack("<i6dQiQ", tag, 0, 0, 0, 0, 0, 0, 1, phys, 0))
    ent.append(struct.pack("<i6dQiQ", 3, 0, 0, 0, 0, 0, 0, 1, 6, 0))
    out.append(b"$Entities\n" + b"".join(ent) + b"\n$EndEntities\n")
    # nodes: one block on surface entity 3
    nb = [struct.pack("<4Q", 1, 5, 1, 9), struct.pack("<3iQ", 2, 3, 0, 5)]
    nb.append(struct.pack("<5Q", *_PTS.keys()))
    for xyz in _PTS.values():
        nb.append(struct.pack("<3d", *xyz))
    out.append(b"$Nodes\n" + b"".join(nb) + b"\n$EndNodes\n")
    # elements: line blocks on curves 1, 2; tri block on surface 3
    eb = [struct.pack("<4Q", 3, 6, 1, 6)]
    eb.append(struct.pack("<3iQ", 1, 1, 1, 1) + struct.pack("<3Q", 1, 1, 2))
    eb.append(struct.pack("<3iQ", 1, 2, 1, 1) + struct.pack("<3Q", 2, 2, 4))
    eb.append(struct.pack("<3iQ", 2, 3, 2, 4))
    for t, a, b, c in _TRIS:
        eb.append(struct.pack("<4Q", t, a, b, c))
    out.append(b"$Elements\n" + b"".join(eb) + b"\n$EndElements\n")
    return b"".join(out)


@pytest.mark.parametrize(
    "make", ["ascii22", "bin22", "bin41"],
)
def test_read_msh_groups(tmp_path, make):
    p = tmp_path / "g.msh"
    if make == "ascii22":
        p.write_text(MSH22_GROUPS)
    else:
        p.write_bytes(_msh22_binary() if make == "bin22" else _msh41_binary())
    mesh, groups = read_msh(str(p), return_groups=True)
    assert mesh.n_points == 5 and mesh.n_cells == 4
    np.testing.assert_allclose(
        float(np.sum(np.asarray(mesh.cell_volumes()))), 1.0
    )
    assert groups.names == {"bottom": (1, 10), "right": (1, 20),
                            "fluid": (2, 6)}
    # every cell carries the 'fluid' tag (survives the RCM cell re-sort)
    assert set(groups.cell_tags.tolist()) == {6}
    assert len(groups.cell_ids("fluid")) == 4
    # named facet group -> boundary dofs of a P2 space: bottom edge has
    # 2 vertices + 1 midpoint
    from flow_tpu import FunctionSpace

    W = FunctionSpace(mesh, 2)
    dofs = W.boundary_dofs(groups.where("bottom"))
    pts = W.dof_points_np[dofs]
    assert len(dofs) == 3
    np.testing.assert_allclose(pts[:, 1], 0.0, atol=1e-12)
    dofs_r = W.boundary_dofs(groups.where("right"))
    np.testing.assert_allclose(W.dof_points_np[dofs_r][:, 0], 1.0, atol=1e-12)
    # vertex ids of the group are consistent with coordinates
    vb = groups.facet_nodes("bottom")
    np.testing.assert_allclose(mesh.points_np[vb][:, 1], 0.0, atol=1e-12)


def test_read_msh_binary_matches_ascii(tmp_path):
    pa = tmp_path / "a.msh"
    pb = tmp_path / "b.msh"
    pa.write_text(MSH22_GROUPS)
    pb.write_bytes(_msh41_binary())
    ma = read_msh(str(pa))
    mb = read_msh(str(pb))
    np.testing.assert_allclose(ma.points_np, mb.points_np)
    np.testing.assert_array_equal(ma.cells_np, mb.cells_np)
