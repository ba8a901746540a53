# Function spaces and dof maps.
#
# Replaces dolfin's FunctionSpace / VectorFunctionSpace / Function
# (/root/reference/tests/test_navier_stokes.py:282-284). A FunctionSpace is a
# static dof-numbering plus gather/sum index structures; a Function is just a
# flat jnp array tied to its space. All index structures are built host-side
# once and frozen, so functions of dofs jit cleanly.
#
# Dof numbering:
#   P1: dof i == mesh vertex i.
#   P2: dofs [0, n_points) are vertices, [n_points, n_points+n_edges) are edge
#       midpoints. Local dof order matches fem/elements.py.
#   Vector spaces share the scalar numbering; values are stored [n_dofs, 2]
#   (structure-of-arrays: best layout for batched einsum contraction on MXU).
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import elements
from ..mesh import Mesh

__all__ = ["FunctionSpace", "VectorFunctionSpace", "Function", "SubSpace"]


class FunctionSpace:
    def __init__(self, mesh: Mesh, degree: int, n_components: int = 1):
        # index-structure construction is host work; the jnp mirrors are
        # created on the CPU backend (see utils/hostsetup.py)
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(mesh, degree, n_components)

    def _build(self, mesh: Mesh, degree: int, n_components: int):
        assert degree in (1, 2)
        self.mesh = mesh
        self.degree = degree
        self.n_components = n_components

        self.dim = getattr(mesh, "dim", 2)
        if degree == 1:
            cell_dofs = mesh.cells_np.copy()
            n_dofs = mesh.n_points
            dof_points = mesh.points_np.copy()
        else:
            cell_dofs = np.concatenate(
                [mesh.cells_np, mesh.n_points + mesh.cell_edges_np], axis=1
            )
            n_dofs = mesh.n_points + mesh.n_edges
            mid = 0.5 * (
                mesh.points_np[mesh.edges_np[:, 0]]
                + mesh.points_np[mesh.edges_np[:, 1]]
            )
            dof_points = np.concatenate([mesh.points_np, mid], axis=0)

        self.n_dofs = int(n_dofs)
        self.n_local = elements.n_local_dofs(degree, self.dim)
        self.cell_dofs_np = cell_dofs.astype(np.int32)
        self.cell_dofs = jnp.asarray(self.cell_dofs_np)
        self.dof_points_np = dof_points
        self.dof_points = jnp.asarray(dof_points, dtype=mesh.dtype)

        # ---- gather-based dof summation (the TPU-native "scatter") --------
        # For each global dof, the (cell, local) pairs that contribute:
        # out[d] = sum_k flat_vals[adj_idx[d, k]] * adj_mask[d, k] — pure
        # gathers + masked adds, no scatter op in the compiled graph.
        # Split by valence class: P2 edge-midpoint dofs touch at most 2 cells
        # while vertex dofs touch ~6-8, so one padded table would gather
        # ~5x more elements than exist (gather throughput is the hot-path
        # bound on TPU). Vertex rows and edge rows get separate tables.
        flat = self.cell_dofs_np.ravel()
        order = np.argsort(flat, kind="stable").astype(np.int32)
        counts = np.bincount(flat, minlength=n_dofs)
        starts = np.concatenate([[0], np.cumsum(counts)])
        rows = flat[order]
        pos = np.arange(len(order)) - starts[rows]

        def build_table(row_lo, row_hi):
            sel = (rows >= row_lo) & (rows < row_hi)
            nrow = row_hi - row_lo
            if nrow == 0:
                return (
                    np.zeros((0, 1), dtype=np.int32),
                    np.zeros((0, 1), dtype=np.float64),
                )
            mv = max(1, int(counts[row_lo:row_hi].max()))
            idx = np.zeros((nrow, mv), dtype=np.int32)
            msk = np.zeros((nrow, mv), dtype=np.float64)
            idx[rows[sel] - row_lo, pos[sel]] = order[sel]
            msk[rows[sel] - row_lo, pos[sel]] = 1.0
            return idx, msk

        n_vert = mesh.n_points if degree == 2 else n_dofs
        vi, vm = build_table(0, n_vert)
        ei, em = build_table(n_vert, n_dofs)
        self._adj = [
            (jnp.asarray(vi), jnp.asarray(vm, dtype=mesh.dtype)),
            (jnp.asarray(ei), jnp.asarray(em, dtype=mesh.dtype)),
        ]

        # boundary dof flags (host-side)
        bnd_vertex = np.zeros(mesh.n_points, dtype=bool)
        if self.dim == 2:
            be = mesh.edges_np[mesh.boundary_edges_np]
            bnd_vertex[be.ravel()] = True
        else:
            bnd_vertex[mesh.boundary_faces_np.ravel()] = True
        if degree == 1:
            self._on_boundary = bnd_vertex
        else:
            bnd_edge = np.zeros(mesh.n_edges, dtype=bool)
            bnd_edge[mesh.boundary_edges_np] = True
            self._on_boundary = np.concatenate([bnd_vertex, bnd_edge])

    # -- dof gathering / summation ------------------------------------------
    def gather(self, U):
        """U [n_dofs(,2)] -> local values [n_cells, n_local(,2)]."""
        return U[self.cell_dofs]

    def dof_sum(self, local_vals):
        """Sum local contributions [n_cells, n_local(,...)] into [n_dofs(,...)]."""
        flat = local_vals.reshape((-1,) + local_vals.shape[2:])
        parts = []
        for idx, msk in self._adj:
            if idx.shape[0] == 0:
                continue
            g = flat[idx]  # [nrow, maxval, ...]
            m = msk.reshape(msk.shape + (1,) * (g.ndim - 2))
            parts.append((g * m).sum(axis=1))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    # -- boundary queries -----------------------------------------------------
    def boundary_dofs(self, where="on_boundary"):
        """Global dof indices on the mesh boundary satisfying `where`.

        `where` is 'on_boundary' or a predicate f(x: [n,2] np array) -> bool
        array, evaluated at dof coordinates of boundary dofs (the analog of
        dolfin SubDomain.inside with on_boundary=True).
        """
        idx = np.where(self._on_boundary)[0]
        if where != "on_boundary":
            sel = np.asarray(where(self.dof_points_np[idx]), dtype=bool)
            idx = idx[sel]
        return idx.astype(np.int32)

    def zeros(self):
        shape = (self.n_dofs,) if self.n_components == 1 else (
            self.n_dofs,
            self.n_components,
        )
        return jnp.zeros(shape, dtype=self.mesh.dtype)

    def sub(self, component):
        return SubSpace(self, component)

    @property
    def value_shape(self):
        return () if self.n_components == 1 else (self.n_components,)

    def __repr__(self):
        kind = "P%d" % self.degree
        if self.n_components > 1:
            kind = "Vector" + kind
        return f"FunctionSpace({kind}, n_dofs={self.n_dofs})"


def VectorFunctionSpace(mesh, degree, n_components=2):
    return FunctionSpace(mesh, degree, n_components=n_components)


class SubSpace:
    """A component view W.sub(i) of a vector space, for component-wise BCs
    (cf. DirichletBC(W.sub(0), inflow, ...) in
    /root/reference/tests/test_karman_vortex_street.py:142-144)."""

    def __init__(self, parent: FunctionSpace, component: int):
        assert 0 <= component < parent.n_components
        self.parent = parent
        self.component = component


class Function:
    """A finite-element function: (space, dof vector).

    The dof vector is a jnp array [n_dofs] (scalar) or [n_dofs, 2] (vector).
    Functions are lightweight and immutable-by-convention: solvers return new
    Functions rather than mutating (functional style — jit-friendly).
    """

    def __init__(self, space: FunctionSpace, vector=None):
        self.space = space
        self.vector = space.zeros() if vector is None else vector
        self._name = ""

    def copy(self):
        return Function(self.space, self.vector)

    def assign(self, other):
        """In-place-style value assignment (dolfin u0.assign(u1) parity;
        rebinds the immutable dof array)."""
        self.vector = other.vector if isinstance(other, Function) else other
        return self

    def rename(self, name, _label=None):
        self._name = name
        return self

    @property
    def name(self):
        return self._name

    def split(self):
        """Component Functions (scalar views) of a vector Function."""
        assert self.space.n_components > 1
        scalar = FunctionSpace(self.space.mesh, self.space.degree)
        return tuple(
            Function(scalar, self.vector[:, c])
            for c in range(self.space.n_components)
        )

    def __repr__(self):
        return f"Function({self.space!r})"
