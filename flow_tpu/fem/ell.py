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


# ---------------------------------------------------------------------------
# ELL graph + on-device assembly (the state-dependent-operator path)
# ---------------------------------------------------------------------------
class ELLGraph:
    """Sparsity structure of the scalar dof-connectivity graph as padded ELL,
    plus the (cell, i, j) -> flat ELL-slot map that lets element tensors be
    assembled ON DEVICE with one scatter-add.

    This is what makes a per-Newton-iteration ASSEMBLED momentum Jacobian
    viable on TPU: the graph and slot map are host-precomputed once; each
    rebuild is `zeros.at[dest].add(element_tensor.ravel())` — O(nc*nl^2)
    scatter work amortized over the ~2 matvecs/Krylov-iteration x O(10)
    iterations that then run as cheap row-gather ELL applies (the TPU analog
    of PETSc's MatSetValues+assembled AIJ inside SNES; reference Newton:
    /root/reference/flow/navier_stokes/pressure_correction.py:224-254).
    """

    def __init__(self, space: FunctionSpace):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(space)

    def _build(self, space: FunctionSpace):
        cd = space.cell_dofs_np.astype(np.int64)
        nc, nl = cd.shape
        n = space.n_dofs
        rows = np.repeat(cd, nl, axis=1).ravel()
        cols = np.tile(cd, (1, nl)).ravel()
        key = rows * n + cols
        uniq, inv = np.unique(key, return_inverse=True)
        r = (uniq // n).astype(np.int64)
        c = (uniq % n).astype(np.int64)
        counts = np.bincount(r, minlength=n)
        width = int(counts.max())
        pos = np.arange(len(r)) - np.concatenate([[0], np.cumsum(counts)])[r]
        cols_pad = np.zeros((n, width), dtype=np.int32)
        cols_pad[r, pos] = c
        # flat destination slot for every (cell, i, j) entry
        slot_of_uniq = (r * width + pos).astype(np.int32)
        self.dest_np = slot_of_uniq[inv].reshape(nc, nl, nl)
        self.dest = jnp.asarray(self.dest_np)
        self.cols_np = cols_pad
        self.cols = jnp.asarray(cols_pad)
        self.n, self.width = n, width
        self.n_local = nl

    def assemble_np(self, loc):
        """Host (numpy) assembly of element tensors — for constant operator
        parts precomputed at setup time. Same output layout as assemble()."""
        loc = np.asarray(loc)
        if loc.ndim == 3:
            flat = np.zeros(self.n * self.width, dtype=loc.dtype)
            np.add.at(flat, self.dest_np.ravel(), loc.ravel())
            return flat.reshape(self.n, self.width)
        m = loc.shape[-1]
        flat = np.zeros((self.n * self.width, m, m), dtype=loc.dtype)
        np.add.at(flat, self.dest_np.ravel(), loc.reshape(-1, m, m))
        return flat.reshape(self.n, self.width, m, m)

    def assemble(self, loc):
        """Element tensors -> padded ELL values, on device.

        loc [nc, nl, nl]        -> vals [n, W]
        loc [nc, nl, nl, m, m]  -> vals [n, W, m, m]  (component blocks)
        """
        if loc.ndim == 3:
            flat = jnp.zeros(self.n * self.width, dtype=loc.dtype)
            flat = flat.at[self.dest.ravel()].add(loc.ravel())
            return flat.reshape(self.n, self.width)
        m = loc.shape[-1]
        flat = jnp.zeros((self.n * self.width, m, m), dtype=loc.dtype)
        flat = flat.at[self.dest.ravel()].add(loc.reshape(-1, m, m))
        return flat.reshape(self.n, self.width, m, m)

    def apply(self, vals, x):
        """vals [n,W] @ x [n(,m)] or vals [n,W,m,m] @ x [n,m].

        One row-gather x[cols] plus a small contraction — the whole point:
        ~2 HBM reads per nonzero vs the quadrature pipeline's
        gather -> einsum chain -> dof-sum per apply."""
        xg = x[self.cols]
        if vals.ndim == 2:
            if x.ndim == 1:
                return jnp.einsum("nk,nk->n", vals, xg)
            return jnp.einsum("nk,nkm->nm", vals, xg)
        return jnp.einsum("nkab,nkb->na", vals, xg)

    def diag(self, vals):
        """Block diagonal: [n] from [n,W], [n,m] from [n,W,m,m]."""
        eye = self.cols == jnp.arange(self.n, dtype=self.cols.dtype)[:, None]
        if vals.ndim == 2:
            return jnp.sum(jnp.where(eye, vals, 0.0), axis=1)
        d = jnp.einsum("nkaa->nka", vals)
        return jnp.sum(jnp.where(eye[:, :, None], d, 0.0), axis=1)


def momentum_const_ell(V: FunctionSpace, geom, graph: ELLGraph):
    """Constant (state-independent) ELL pieces of the momentum Jacobian
    J = M delta_ab + (dt/rho) w_im [rho J_conv(u) + mu J_visc]:

      mass_vals  [n, W]        M_ij = int phi_i phi_j
      visc1_vals [n, W]        int grad phi_i . grad phi_j   (delta_ab part)
      visc2_vals [n, W, d, d]  int d_a phi_j d_b phi_i       (grad-transpose
                               part of the stress form mu (grad u + grad u^T))

    Host-side numpy, chunked over cells to bound the [nc, nl, nl, d, d]
    intermediate. Element tensors match fem/forms.py sym_grad_loc/mass_loc
    exactly (same factored reference tensors)."""
    from . import assembly

    Mref = assembly.ref_mass(V.degree, assembly._dim(V))
    Kref = assembly.ref_stiffness(V.degree, assembly._dim(V))
    detJ = np.asarray(geom.detJ, dtype=np.float64)
    C = np.asarray(geom.C, dtype=np.float64)
    G = np.asarray(geom.G, dtype=np.float64)
    nc = detJ.shape[0]
    d = G.shape[1]
    nl = graph.n_local

    mass_vals = graph.assemble_np(Mref[None, :, :] * detJ[:, None, None])
    visc1_vals = graph.assemble_np(np.einsum("ekl,klij->eij", C, Kref))

    visc2_vals = np.zeros((graph.n * graph.width, d, d))
    chunk = max(1, 50_000_000 // (nl * nl * d * d * 8))
    for s in range(0, nc, chunk):
        e = min(nc, s + chunk)
        el = np.einsum(
            "e,eak,ebl,klji->eijab", detJ[s:e], G[s:e], G[s:e], Kref
        )
        np.add.at(
            visc2_vals, graph.dest_np[s:e].ravel(), el.reshape(-1, d, d)
        )
    return mass_vals, visc1_vals, visc2_vals.reshape(graph.n, graph.width, d, d)
