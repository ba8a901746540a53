# Padded-ELL sparse operators for CONSTANT bilinear forms.
#
# The matrix-free quadrature path (assembly.stiffness_apply) evaluates
#   gather(x) -> per-cell einsum -> dof_sum (a second gather)
# per apply. For operators whose matrix never changes (the pressure-Poisson
# stiffness, multigrid level operators, mass matrices), assembling once into
# a padded ELL table turns every apply into ONE row-gather x[cols] plus a
# vals*rows contraction — about half the HBM traffic and no intermediate
# [nc, nl] materialization. This is the TPU analog of PETSc's assembled AIJ
# operators on the solver hot path (reference pressure solve:
# /root/reference/flow/navier_stokes/pressure_correction.py:407-419), kept
# static-shape (padded rows + masked columns) so it jits cleanly.
#
# Rows are kept in dof order (locality follows the mesh numbering — pair
# with RCM ordering for banded gathers).
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces import FunctionSpace

__all__ = ["ELLMatrix", "ell_from_local", "ell_stiffness", "ell_scaled_ZtMZ"]


class ELLMatrix:
    """Static-shape padded ELL matrix: cols [n, K] int32, vals [n, K].

    Padding entries have col=0, val=0 (they multiply row 0 harmlessly).
    apply(x) supports x [n] or [n, m] (component-diagonal vector apply).
    """

    def __init__(self, cols, vals, dtype):
        self.cols = jnp.asarray(cols)
        self.vals = jnp.asarray(vals, dtype=dtype)
        self.n, self.width = cols.shape

    def apply(self, x):
        xg = x[self.cols]  # [n, K(,m)]
        if x.ndim == 1:
            return jnp.einsum("nk,nk->n", self.vals, xg)
        return jnp.einsum("nk,nkm->nm", self.vals, xg)

    def diag(self):
        """Operator diagonal (for Jacobi/Chebyshev smoothers)."""
        eye = self.cols == jnp.arange(self.n, dtype=self.cols.dtype)[:, None]
        return jnp.sum(jnp.where(eye, self.vals, 0.0), axis=1)

    def __call__(self, x):
        return self.apply(x)


def ell_from_local(space: FunctionSpace, loc) -> ELLMatrix:
    """Assemble element matrices loc [nc, nl, nl] into an ELLMatrix.

    Host-side, one-time: duplicate (row, col) pairs are summed; rows are
    padded to the max row valence.
    """
    loc = np.asarray(loc, dtype=np.float64)
    cd = space.cell_dofs_np.astype(np.int64)
    nl = cd.shape[1]
    n = space.n_dofs
    rows = np.repeat(cd, nl, axis=1).ravel()  # i index varies slower
    cols = np.tile(cd, (1, nl)).ravel()
    vals = loc.reshape(len(cd), nl * nl).ravel()

    # sum duplicates via lexicographic sort on (row, col)
    key = rows * n + cols
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    vals_s = vals[order]
    uniq, start = np.unique(key_s, return_index=True)
    sums = np.add.reduceat(vals_s, start)
    r = (uniq // n).astype(np.int64)
    c = (uniq % n).astype(np.int64)

    counts = np.bincount(r, minlength=n)
    width = int(counts.max())
    pos = np.arange(len(r)) - np.concatenate([[0], np.cumsum(counts)])[r]
    cols_pad = np.zeros((n, width), dtype=np.int32)
    vals_pad = np.zeros((n, width), dtype=np.float64)
    cols_pad[r, pos] = c
    vals_pad[r, pos] = sums
    return ELLMatrix(cols_pad, vals_pad, space.mesh.dtype)


def ell_stiffness(space: FunctionSpace, geom, coeff=None) -> ELLMatrix:
    """Assembled stiffness K_ij = int c grad(phi_i).grad(phi_j) as ELL
    (identical values to assembly.stiffness_apply — exact factored tensors)."""
    from . import assembly
    from ..utils.hostsetup import setup_on_cpu

    with setup_on_cpu():
        loc = assembly.stiffness_local(space, geom, coeff=coeff)
    return ell_from_local(space, np.asarray(loc))


def ell_scaled_ZtMZ(space: FunctionSpace, loc) -> ELLMatrix:
    """Generic: assemble any precomputed element matrices (e.g. multigrid
    Galerkin level operators) into ELL."""
    return ell_from_local(space, loc)
