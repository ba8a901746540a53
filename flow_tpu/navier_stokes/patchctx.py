# Patch-layout Navier-Stokes context: the _Context assembly/solver surface
# (pressure_correction.py) re-addressed through the gather-free patch layout
# (fem/patch.py). All the discrete equations are INHERITED — _residual,
# _rhs_weak_*, _pressure_solve_impl, _velocity_correction_impl run unchanged
# because they only touch V/Q through gather/dof_sum and the geometry
# through detJ/G/C; this class swaps those for the sliced-window versions.
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..fem import assembly
from ..fem.assembly import BoundaryTab, geometry
from ..fem.patch import (
    PatchInfo,
    PatchSpace,
    PatchGeom,
    PatchBoundaryTab,
)
from .pressure_correction import _Context

__all__ = ["PatchNSContext"]


class PatchNSContext(_Context):
    """_Context work-alike over patch-contiguous state.

    Constructed from the REAL (fine-mesh) spaces plus a PatchInfo; exposes
    patch spaces as .V/.Q, patch-ordered geometry as .geom, and re-addressed
    boundary tabulations. Krylov calls inside the inherited substep solvers
    pick up the replica-weighted inner product through ._cg_dot."""

    def __init__(self, info: PatchInfo, Vr, Qr):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build_patch(info, Vr, Qr)

    def _build_patch(self, info: PatchInfo, Vr, Qr):
        mesh = Vr.mesh
        assert getattr(mesh, "dim", 2) == 2, "patch layout: 2-D triangles"
        assert Vr.degree == 2 and Qr.degree == 1, "patch layout: Taylor-Hood"
        assert info.meshes[-1] is mesh, (
            "PatchInfo hierarchy must end at the spaces' mesh"
        )
        self.info = info
        self.V_real, self.Q_real = Vr, Qr
        self.dim = 2
        dtype = mesh.dtype

        self.V = PatchSpace(info.layout(2), mesh, 2, n_components=2)
        self.Q = PatchSpace(info.layout(1), mesh, 1)
        self.geom = PatchGeom(info, dtype=dtype)

        fine_geom = geometry(mesh)
        self.btab = PatchBoundaryTab(
            BoundaryTab(Vr, rule_degree=6), self.V, fine_geom
        )
        self.btabQ = PatchBoundaryTab(
            BoundaryTab(Qr, rule_degree=6), self.Q, fine_geom
        )

        self._ds_stress = os.environ.get("FLOW_ABLATE_BND_STRESS", "") != "1"
        self._ds_dn = os.environ.get("FLOW_ABLATE_DN", "") != "1"

        ncomp = Vr.n_components
        self.mass_diag_V = assembly.mass_diag(self.V, self.geom)[
            :, None
        ] * jnp.ones((1, ncomp), dtype=dtype)
        self.stiff_diag_V = assembly.stiffness_diag(self.V, self.geom)[
            :, None
        ] * jnp.ones((1, ncomp), dtype=dtype)
        self.stiff_diag_Q = assembly.stiffness_diag(self.Q, self.geom)
        # the constant function in replicated coords: 1 on valid slots only
        self.ones_Q = self.Q._validf

        # replica-weighted inner products == the un-replicated algorithm;
        # dispatch V/Q weights on the (static) leading dimension
        self._cg_dot = self.dot

    def dot(self, x, y):
        n = x.shape[0]
        if n == self.V.n_dofs:
            return self.V.dot(x, y)
        assert n == self.Q.n_dofs, f"patch dot: unknown layout length {n}"
        return self.Q.dot(x, y)

    def mask_to_patch(self, space: PatchSpace, mask, val):
        """Global (mask, values) -> patch layout, with PADDING slots turned
        into Dirichlet-0 rows (mask 1, value 0): out-of-triangle lattice
        slots then stay exactly zero through every masked solve."""
        v = space._validf
        vv = v.reshape(v.shape + (1,) * (jnp.ndim(mask) - 1))
        maskp = space.to_patch(mask) + (1.0 - vv) * jnp.ones_like(vv)
        maskp = jnp.clip(maskp, 0.0, 1.0)
        valp = space.to_patch(val)
        return maskp, valp
