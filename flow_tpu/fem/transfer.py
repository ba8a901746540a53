# Inter-mesh state transfer on refine_uniform hierarchies.
#
# Used to seed fine-mesh runs from coarse developed states (e.g. transfer a
# developed vortex-shedding flow to a refined mesh instead of waiting for
# onset again at the fine resolution) and for full-multigrid-style initial
# guesses. The reference gets nothing like this from FEniCS: its only
# restart path is re-projecting expressions.
#
# Structure exploited (mesh.refine_uniform): fine vertices are
# [coarse vertices; coarse edge midpoints], and P2 dof numbering is
# [vertices; edges] (fem/spaces.py) — so a coarse P2 dof vector IS the
# vector of function values at the fine vertices, in order. Prolongation is
# therefore pure index arithmetic, no point location needed.
from __future__ import annotations

import jax.numpy as jnp

from .spaces import FunctionSpace, Function

__all__ = ["prolong", "prolong_vector", "restrict", "restrict_vector"]


def _prolong_p1(coarse_mesh, x):
    """P1 coarse -> fine: exact (fine vertex set = coarse verts + coarse
    edge midpoints; P1 is linear along each coarse edge)."""
    e = coarse_mesh.edges_np
    mid = 0.5 * (x[e[:, 0]] + x[e[:, 1]])
    return jnp.concatenate([x, mid], axis=0)


def _prolong_p2(fine_mesh, U):
    """P2 coarse -> fine.

    Fine-vertex values are the coarse dof vector itself (exact point
    values). Fine edge-midpoint dofs are set to the mean of their edge's
    endpoint values — linear interpolation, an O(h^2) approximation of the
    quadratic (exact index-free evaluation would need the coarse cell's
    full basis at interior points). Second-order accuracy is what the
    P2 field carries through a projection step anyway; for state seeding
    this is indistinguishable after a few steps."""
    ef = fine_mesh.edges_np
    mid = 0.5 * (U[ef[:, 0]] + U[ef[:, 1]])
    return jnp.concatenate([U, mid], axis=0)


def prolong_vector(x, coarse_space: FunctionSpace, fine_space: FunctionSpace):
    """Prolong a raw dof vector [n_dofs(,m)] from coarse_space to fine_space
    (fine_space.mesh must be refine_uniform(coarse_space.mesh))."""
    assert coarse_space.degree == fine_space.degree
    cm, fm = coarse_space.mesh, fine_space.mesh
    assert fm.n_points == cm.n_points + cm.n_edges, (
        "fine mesh is not refine_uniform(coarse mesh)"
    )
    if coarse_space.degree == 1:
        out = _prolong_p1(cm, x)
    else:
        assert coarse_space.n_dofs == fm.n_points
        out = _prolong_p2(fm, x)
    assert out.shape[0] == fine_space.n_dofs
    return out


def prolong(u: Function, fine_space: FunctionSpace) -> Function:
    """Prolong a Function onto the uniformly refined mesh's space."""
    return Function(fine_space, prolong_vector(u.vector, u.space, fine_space))


def restrict_vector(x, fine_space: FunctionSpace, coarse_space: FunctionSpace):
    """Restrict a raw dof vector [n_dofs(,m)] fine -> coarse by injection.

    Exact point values: the coarse dof locations (P1: coarse vertices;
    P2: coarse vertices + coarse edge midpoints) are precisely the leading
    block of the fine numbering (refine_uniform orders fine vertices as
    [coarse vertices; coarse edge midpoints], P2 dofs as [vertices; edges]),
    so injection is a prefix slice. restrict(prolong(x)) == x exactly.
    Used to seed coarse-mesh campaigns from fine saturated states (e.g.
    re-deriving a stage-N shedding measurement from a stage-N+1 checkpoint)."""
    assert coarse_space.degree == fine_space.degree
    cm, fm = coarse_space.mesh, fine_space.mesh
    assert fm.n_points == cm.n_points + cm.n_edges, (
        "fine mesh is not refine_uniform(coarse mesh)"
    )
    if coarse_space.degree == 2:
        assert coarse_space.n_dofs == fm.n_points
    return x[: coarse_space.n_dofs]


def restrict(u: Function, coarse_space: FunctionSpace) -> Function:
    """Restrict a Function onto the coarse (un-refined) mesh's space."""
    return Function(
        coarse_space, restrict_vector(u.vector, u.space, coarse_space)
    )
