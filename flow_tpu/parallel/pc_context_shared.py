# Shared boundary-facet tabulation arrays for the sharded projection step.
from __future__ import annotations

from types import SimpleNamespace

from ..fem.assembly import BoundaryTab, geometry

__all__ = ["make_boundary_arrays"]


def make_boundary_arrays(V, Q, rule_degree=5):
    """Bundle the boundary tabulations of (V, Q) as plain replicated arrays
    consumable inside shard_map (no FunctionSpace/Mesh objects)."""
    btV = BoundaryTab(V, rule_degree=rule_degree)
    btQ = BoundaryTab(Q, rule_degree=rule_degree)
    geom = geometry(V.mesh)
    return SimpleNamespace(
        phiV=btV.phi,
        dphiV=btV.dphi,
        cdV=btV.cell_dofs,
        phiQ=btQ.phi,
        cdQ=btQ.cell_dofs,
        wl=btV.wl,
        normals=btV.normals,
        Gb=geom.G[btV.cells],
    )
