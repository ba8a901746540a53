# Lagrange P1/P2 reference-element tabulation.
#
# Replaces FFC's runtime element tabulation (the reference's 'CG' 1/2 spaces,
# e.g. /root/reference/tests/test_navier_stokes.py:282-283). Everything here
# is tiny static numpy, consumed as compile-time constants by the jitted
# assembly contractions.
#
# Barycentric coordinates: l0 = 1-x-y, l1 = x, l2 = y.
# P1 dofs: local vertices 0..2.
# P2 dofs: vertices 0..2, then midpoints 3+k of edge k (opposite vertex k,
#          i.e. dof 3 = midpoint(v1,v2), dof 4 = midpoint(v2,v0),
#          dof 5 = midpoint(v0,v1)) — consistent with mesh.cell_edges.
from __future__ import annotations

import numpy as np

__all__ = ["tabulate", "n_local_dofs", "hessian_ref", "local_dof_barycentric"]


def n_local_dofs(degree):
    return {1: 3, 2: 6}[degree]


def _bary(points):
    x = points[:, 0]
    y = points[:, 1]
    return np.stack([1.0 - x - y, x, y], axis=1)  # [nq, 3]


def tabulate(degree, points):
    """Tabulate basis values and reference gradients at `points` [nq,2].

    Returns (phi [nq, nl], dphi [nq, nl, 2]).
    """
    lam = _bary(points)
    nq = len(points)
    # gradients of barycentric coords wrt (x, y)
    dlam = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])  # [3, 2]
    if degree == 1:
        phi = lam.copy()
        dphi = np.broadcast_to(dlam, (nq, 3, 2)).copy()
    elif degree == 2:
        phi = np.empty((nq, 6))
        dphi = np.empty((nq, 6, 2))
        for i in range(3):
            phi[:, i] = lam[:, i] * (2.0 * lam[:, i] - 1.0)
            dphi[:, i, :] = (4.0 * lam[:, i, None] - 1.0) * dlam[i]
        for k in range(3):
            a, b = (k + 1) % 3, (k + 2) % 3
            phi[:, 3 + k] = 4.0 * lam[:, a] * lam[:, b]
            dphi[:, 3 + k, :] = 4.0 * (
                lam[:, a, None] * dlam[b] + lam[:, b, None] * dlam[a]
            )
    else:
        raise ValueError(f"unsupported degree {degree}")
    return phi, dphi


def hessian_ref(degree):
    """Constant reference Hessians H[i] (2x2) of each basis function.

    P2 basis functions are quadratic => constant second derivatives; P1 => 0.
    Used for the rotational-form grad(div u*) term
    (/root/reference/flow/navier_stokes/pressure_correction.py:322-323) and
    the SUPG residual's div(kappa grad u) (/root/reference/flow/heat.py:81-86).
    """
    nl = n_local_dofs(degree)
    H = np.zeros((nl, 2, 2))
    if degree == 2:
        dlam = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        for i in range(3):
            H[i] = 4.0 * np.outer(dlam[i], dlam[i])
        for k in range(3):
            a, b = (k + 1) % 3, (k + 2) % 3
            H[3 + k] = 4.0 * (np.outer(dlam[a], dlam[b]) + np.outer(dlam[b], dlam[a]))
    return H


def local_dof_barycentric(degree):
    """Barycentric coordinates of the local dof points [nl, 3]."""
    v = np.eye(3)
    if degree == 1:
        return v
    mids = np.array(
        [[0.0, 0.5, 0.5], [0.5, 0.0, 0.5], [0.5, 0.5, 0.0]]
    )
    return np.concatenate([v, mids], axis=0)
