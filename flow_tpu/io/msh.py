# Gmsh .msh reader (ASCII, MSH 2.2 and 4.1) — minimal mesh-file import so
# externally generated geometries run on this stack.
#
# The reference consumes external meshes throughout its test suite
# (dolfin Mesh('test.xml'), /root/reference/tests/test_karman_vortex_street.py:53;
# pygmsh-generated .msh caches, tests/test_boussinesq.py:55-58). This reader
# covers the subset those workflows need: nodes + highest-dimensional simplex
# elements (triangles for 2-D, tets for 3-D), lower-dimensional and point
# elements skipped. Orientation is normalized by the Mesh/TetMesh
# constructors, and node tags may be sparse (gmsh never guarantees dense
# numbering) — they are compacted to 0-based contiguous ids.
from __future__ import annotations

import numpy as np

__all__ = ["read_msh"]

_TRI = 2  # gmsh element type: 3-node triangle
_TET = 4  # gmsh element type: 4-node tetrahedron


def read_msh(path, dtype=None, rcm=True):
    """Read an ASCII gmsh .msh file (v2.2 or v4.1) -> Mesh or TetMesh.

    Picks tets if any are present, else triangles. Raises ValueError for
    binary files or other versions. Triangle meshes get a bandwidth-reducing
    RCM renumbering by default (gmsh numbering is arbitrary; gather locality
    on TPU follows the dof ordering) — pass rcm=False to keep file order.
    """
    with open(path) as f:
        lines = f.read().splitlines()

    i = 0
    version = None
    nodes = {}  # tag -> coords [3]
    elems = {_TRI: [], _TET: []}

    while i < len(lines):
        ln = lines[i].strip()
        if ln == "$MeshFormat":
            parts = lines[i + 1].split()
            version = float(parts[0])
            if int(parts[1]) != 0:
                raise ValueError("binary .msh not supported (ASCII only)")
            i += 2
        elif ln == "$Nodes":
            if version >= 4.0:
                i = _read_nodes_v4(lines, i + 1, nodes)
            else:
                i = _read_nodes_v2(lines, i + 1, nodes)
        elif ln == "$Elements":
            if version >= 4.0:
                i = _read_elements_v4(lines, i + 1, elems)
            else:
                i = _read_elements_v2(lines, i + 1, elems)
        else:
            i += 1

    if version is None:
        raise ValueError(f"{path}: not a gmsh .msh file (no $MeshFormat)")
    if not nodes:
        raise ValueError(f"{path}: no nodes")

    # compact sparse gmsh node tags to dense 0-based ids
    tags = np.array(sorted(nodes), dtype=np.int64)
    remap = {t: k for k, t in enumerate(tags.tolist())}
    pts = np.array([nodes[t] for t in tags.tolist()], dtype=np.float64)

    if elems[_TET]:
        cells = np.array(
            [[remap[t] for t in c] for c in elems[_TET]], dtype=np.int32
        )
        from ..mesh3d import TetMesh

        return TetMesh(pts, cells, dtype=dtype)
    if elems[_TRI]:
        cells = np.array(
            [[remap[t] for t in c] for c in elems[_TRI]], dtype=np.int32
        )
        if np.ptp(pts[:, 2]) > 1e-12 * max(1.0, np.abs(pts).max()):
            raise ValueError("triangle mesh is not planar in z")
        from ..mesh import Mesh, reorder_rcm

        p2 = pts[:, :2]
        if rcm:
            p2, cells = reorder_rcm(p2, cells)
        return Mesh(p2, cells, dtype=dtype)
    raise ValueError(f"{path}: no triangles or tets found")


def _read_nodes_v2(lines, i, nodes):
    n = int(lines[i].split()[0])
    for k in range(n):
        parts = lines[i + 1 + k].split()
        nodes[int(parts[0])] = [float(parts[1]), float(parts[2]), float(parts[3])]
    i += 1 + n
    assert lines[i].strip() == "$EndNodes"
    return i + 1


def _read_nodes_v4(lines, i, nodes):
    # header: numEntityBlocks numNodes minTag maxTag
    n_blocks = int(lines[i].split()[0])
    i += 1
    for _ in range(n_blocks):
        _, _, parametric, n_in_block = (int(x) for x in lines[i].split())
        i += 1
        tags = [int(lines[i + k]) for k in range(n_in_block)]
        i += n_in_block
        for k in range(n_in_block):
            parts = lines[i + k].split()
            nodes[tags[k]] = [float(parts[0]), float(parts[1]), float(parts[2])]
        i += n_in_block
    assert lines[i].strip() == "$EndNodes"
    return i + 1


def _read_elements_v2(lines, i, elems):
    n = int(lines[i].split()[0])
    for k in range(n):
        parts = [int(x) for x in lines[i + 1 + k].split()]
        etype = parts[1]
        if etype in elems:
            n_tags = parts[2]
            elems[etype].append(parts[3 + n_tags :])
    i += 1 + n
    assert lines[i].strip() == "$EndElements"
    return i + 1


def _read_elements_v4(lines, i, elems):
    n_blocks = int(lines[i].split()[0])
    i += 1
    for _ in range(n_blocks):
        _, _, etype, n_in_block = (int(x) for x in lines[i].split())
        i += 1
        for k in range(n_in_block):
            parts = [int(x) for x in lines[i + k].split()]
            if etype in elems:
                elems[etype].append(parts[1:])
        i += n_in_block
    assert lines[i].strip() == "$EndElements"
    return i + 1
