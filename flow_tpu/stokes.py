# Steady Stokes: saddle-point solve on Taylor-Hood P2/P1.
#
# API-parity rebuild of /root/reference/flow/stokes.py:13-148. The weak form
# is identical —
#     a((u,p),(v,q)) = mu grad(u):grad(v) - p div(v) - q div(u)
# (stokes.py:40-42) — but the backend is TPU-native: a matrix-free monolithic
# operator solved by MINRES with the pressure-mass Schur block preconditioner
# (the same spectral idea as stokes.py:55-60's `mu grad(u):grad(v) - p q`
# preconditioner pair, realized as block-diag Chebyshev + scaled pressure
# mass instead of GMRES+hypre_amg). Small systems take a dense LU fast path.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fem import assembly, forms, dense
from .fem.assembly import geometry
from .fem.spaces import FunctionSpace, VectorFunctionSpace, Function
from .fem.bc import combine_bcs
from .solvers import krylov
from .solvers.chebyshev import power_iteration_lmax, chebyshev_preconditioner
from .message import info

__all__ = ["TaylorHood", "solve"]

DENSE_THRESHOLD = 20000


class TaylorHood:
    """The mixed space WP = (vector P2) x (P1) — replaces
    FunctionSpace(mesh, VectorElement('Lagrange', cell, 2) * FiniteElement(
    'Lagrange', cell, 1)) in the reference tests."""

    def __init__(self, mesh, V=None, Q=None):
        self.mesh = mesh
        self.V = V if V is not None else VectorFunctionSpace(mesh, 2)
        self.Q = Q if Q is not None else FunctionSpace(mesh, 1)

    def sub(self, i):
        return (self.V, self.Q)[i]


def _split_bcs(WP: TaylorHood, bcs):
    u_bcs, p_bcs = [], []
    for bc in bcs:
        # classify by space identity (DirichletBC resolves SubSpace -> parent)
        if bc.space is WP.V:
            u_bcs.append(bc)
        elif bc.space is WP.Q:
            p_bcs.append(bc)
        else:
            raise ValueError(
                "DirichletBC space is neither WP.V nor WP.Q; build BCs on "
                "the mixed space's own subspaces (WP.sub(0)/WP.sub(1))"
            )
    return u_bcs, p_bcs


def solve(
    WP: TaylorHood,
    bcs,
    mu,
    f,
    verbose=True,
    tol=1.0e-13,
    max_iter=500,
    solver_config=None,
):
    """Solve Stokes; returns (u, p) Functions.

    Mirrors flow.stokes.solve(WP, bcs, mu, f, verbose, tol, max_iter)
    (/root/reference/flow/stokes.py:13-21). `solver_config` (a
    utils.config.SolverConfig) overrides tol/max_iter/monitoring — the typed
    replacement for PETSc solver_parameters dicts.
    """
    if solver_config is not None:
        tol = solver_config.rtol
        max_iter = solver_config.maxiter
        verbose = solver_config.monitor_convergence
    assert mu > 0.0
    mesh = WP.mesh
    V, Q = WP.V, WP.Q
    geom = geometry(mesh)
    u_bcs, p_bcs = _split_bcs(WP, bcs)
    mask_u, val_u = combine_bcs(V, u_bcs)
    mask_p, val_p = combine_bcs(Q, p_bcs)

    nu = V.n_dofs * 2
    npr = Q.n_dofs
    dtype = mesh.dtype

    def pack(U, P):
        return jnp.concatenate([U.reshape(-1), P])

    def unpack(z):
        return z[:nu].reshape(V.n_dofs, 2), z[nu:]

    def A_raw(z):
        U, P = unpack(z)
        yu = mu * forms.vector_laplacian_apply(V, geom, U)
        yu = yu - forms.pressure_grad_rhs(V, Q, geom, P)
        yp = -forms.div_rhs(V, Q, geom, U)
        return pack(yu, yp)

    mask = pack(mask_u, mask_p)
    gvals = pack(mask_u * val_u, mask_p * val_p)
    free = 1.0 - mask

    def A_bc(z):
        y = A_raw(free * z)
        return free * y + mask * z

    # rhs: int f.v dx
    tab = assembly.tabulation(V, 2 * V.degree + 2)
    xq = geom.physical_points(tab.ref_pts)
    from .fem.interpolate import eval_callable

    fq = eval_callable(f, xq)
    b_u = assembly.integrate_rhs(V, tab, geom, val=fq)
    b = pack(b_u, jnp.zeros(npr, dtype=dtype))
    b_c = free * (b - A_raw(gvals)) + gvals

    nullspace = None
    if not p_bcs:
        ns = pack(jnp.zeros((V.n_dofs, 2), dtype=dtype), jnp.ones(npr, dtype=dtype))
        nullspace = [ns]

    if nu + npr <= DENSE_THRESHOLD:
        z = _dense_solve(WP, geom, mu, A_raw, b_c, mask, gvals, nullspace)
        iters = -1
    else:
        M = _block_preconditioner(WP, geom, mu, free, mask)
        z, sinfo = krylov.minres(
            A_bc, b_c, M=M, rtol=tol, maxiter=max_iter, nullspace=nullspace
        )
        if verbose:
            info("stokes: minres iters=%d res=%.3e", int(sinfo.iters), float(sinfo.resnorm))
        if not bool(sinfo.converged):
            raise RuntimeError(
                f"Stokes MINRES did not converge in {max_iter} iterations "
                f"(residual {float(sinfo.resnorm):.3e})"
            )
        iters = int(sinfo.iters)

    U, P = unpack(z)
    u = Function(V, U).rename("velocity")
    p = Function(Q, P).rename("pressure")
    return u, p


def _dense_solve(WP, geom, mu, A_raw, b_c, mask, gvals, nullspace):
    """Direct LU on the assembled dense saddle-point matrix (small systems)."""
    V, Q = WP.V, WP.Q
    nu = V.n_dofs * 2
    n = nu + Q.n_dofs

    A = np.zeros((n, n))
    # velocity block: mu * componentwise stiffness
    K = np.asarray(assembly.stiffness_local(V, geom))  # [nc, 6, 6]
    cdV = V.cell_dofs_np
    for a in range(2):
        dense.add_block(A, cdV * 2 + a, cdV * 2 + a, mu * K)
    # B block: -int q div(u);  B^T: -int p div(v)
    Bref = forms.ref_mixed(Q.degree, V.degree)
    G = np.asarray(geom.G)
    detJ = np.asarray(geom.detJ)
    Bloc = np.einsum("e,ebk,kmj->emjb", detJ, G, Bref)  # [nc, 3, 6, 2]
    cdQ = Q.cell_dofs_np
    for b_comp in range(2):
        dense.add_block(
            A,
            nu + cdQ,
            cdV * 2 + b_comp,
            -Bloc[:, :, :, b_comp],
        )
        dense.add_block(
            A,
            cdV * 2 + b_comp,
            nu + cdQ,
            -np.transpose(Bloc[:, :, :, b_comp], (0, 2, 1)),
        )

    m = np.asarray(mask)
    A[m == 1.0, :] = 0.0
    A[:, m == 1.0] = 0.0
    A[m == 1.0, m == 1.0] = 1.0
    if nullspace is not None:
        # pin the pressure constant by augmenting with a rank-1 term
        v = np.asarray(nullspace[0])
        A = A + np.outer(v, v)
    return jnp.asarray(np.linalg.solve(A, np.asarray(b_c)))


def _block_preconditioner(WP, geom, mu, free, mask):
    """Block-diagonal SPD preconditioner: Chebyshev on the viscous block,
    scaled lumped pressure mass on the Schur block."""
    V, Q = WP.V, WP.Q
    nu = V.n_dofs * 2
    dtype = WP.mesh.dtype

    free_u = free[:nu].reshape(V.n_dofs, 2)
    mask_u = mask[:nu].reshape(V.n_dofs, 2)

    def K_bc(U):
        y = mu * forms.vector_laplacian_apply(V, geom, free_u * U)
        return free_u * y + mask_u * U

    diag_u = mu * assembly.stiffness_diag(V, geom)
    diag_u = jnp.broadcast_to(diag_u[:, None], (V.n_dofs, 2))
    diag_u = free_u * diag_u + mask_u
    lmax = power_iteration_lmax(K_bc, diag_u, (V.n_dofs, 2), dtype=dtype)
    Mu = chebyshev_preconditioner(K_bc, diag_u, lmax, degree=6)

    Mp_diag = assembly.lumped_mass_diag(Q, geom) / mu

    def M(z):
        ru = z[:nu].reshape(V.n_dofs, 2)
        rp = z[nu:]
        return jnp.concatenate([Mu(ru).reshape(-1), rp / Mp_diag])

    return M
