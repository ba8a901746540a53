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


def test_read_msh_rejects_binary(tmp_path):
    p = tmp_path / "bin.msh"
    p.write_text("$MeshFormat\n2.2 1 8\n$EndMeshFormat\n")
    with pytest.raises(ValueError, match="binary"):
        read_msh(str(p))
