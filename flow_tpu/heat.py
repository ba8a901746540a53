# Convection-diffusion ("heat") operator with optional SUPG stabilization.
#
# API-parity rebuild of /root/reference/flow/heat.py:12-122: an operator
# object for u' = F(t, u) consumed by flow_tpu.parabolic steppers through
# eval_alpha_M_beta_F / solve_alpha_M_beta_F.
#
#   M: mass matrix with *vertex* quadrature (lumping; for P2 the edge-midpoint
#      rows are zero exactly as in the reference, heat.py:39-45)
#   F(u) = int [ -kappa/(rho cp) grad(u).grad(v) - (b.grad u) v + s v ] dx
#      (+ SUPG terms on both M and F, heat.py:79-86)
#
# Deviation from the reference (documented quirk, SURVEY.md §2.1): the
# reference's solve_alpha_M_beta_F computes a corrected right-hand side and
# then discards it (heat.py:109-114), and its lhs/rhs sign split flips the
# source term. Both are invisible when source == 0 (the only in-repo use,
# test_boussinesq.py:224). We implement the mathematically consistent
# F(u) = A u + b.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fem import assembly, elements
from .fem.assembly import geometry, tabulation
from .fem.spaces import FunctionSpace, Function
from .fem.bc import combine_bcs
from .fem.interpolate import eval_callable
from .solvers import krylov
from . import stabilization

__all__ = ["Heat"]

DENSE_THRESHOLD = 6000


class Heat:
    """Provides alpha*M*u + beta*F(t, u) evaluation and solves."""

    def __init__(
        self,
        V: FunctionSpace,
        conv,
        kappa,
        rho,
        cp,
        bcs,
        source,
        supg_stabilization=False,
        rule_degree=None,
    ):
        self.V = V
        self.bcs = bcs
        mesh = V.mesh
        geom = geometry(mesh)
        self.geom = geom
        rho_cp = rho * cp

        deg = V.degree
        rd = rule_degree or (2 * deg + 1)
        tab = tabulation(V, rd)
        # convection at quadrature points
        if conv is None:
            bq = None
        else:
            cv = conv.vector if isinstance(conv, Function) else conv
            if isinstance(conv, Function):
                ctab = tabulation(conv.space, rd)
                bq = assembly.values_at_qp(ctab, conv.space.gather(cv))
            else:
                xq = geom.physical_points(tab.ref_pts)
                bq = eval_callable(conv, xq)

        # ---- operators through the form-to-kernel compiler -------------------
        # The weak form is written symbolically (the in-repo analog of the
        # reference's UFL, heat.py:60-88) and compiled to the same batched
        # einsum element kernels the hand-derived path produced.
        from .fem import formlang as fl
        from .fem import quadrature

        u, v = fl.TrialFunction(V), fl.TestFunction(V)

        # M: vertex-quadrature ("lumped") mass — reference heat.py:39-45
        M_loc = fl.compile_form(u * v, geom, quadrature.VERTEX).local()

        # A: -kappa/(rho cp) grad(u).grad(v) - (b.grad u) v
        A_form = (-(kappa / rho_cp)) * fl.dot(fl.grad(u), fl.grad(v))
        if bq is not None:
            b_c = fl.Coefficient(bq, vector=True)  # [nc,nq,dim] at this rule
            A_form = A_form - fl.dot(b_c, fl.grad(u)) * v
        A_loc = fl.compile_form(A_form, geom, rd).local()

        # b: source term
        xq = geom.physical_points(tab.ref_pts)
        if isinstance(source, Function):
            stab_t = tabulation(source.space, rd)
            sq = assembly.values_at_qp(stab_t, source.space.gather(source.vector))
        else:
            sq = eval_callable(source, xq)
        b_loc = fl.compile_form(fl.Coefficient(sq) * v, geom, rd).local()

        # SUPG: every term gets the streamline test factor tau (b.grad v);
        # the strong residual contributes the basis Laplacian (reference
        # heat.py:79-86)
        if supg_stabilization:
            assert conv is not None
            tau = stabilization.supg_tau(mesh, bq, kappa, deg)  # [nc, nq]
            vstab = fl.Coefficient(tau) * fl.dot(b_c, fl.grad(v))
            M_loc = M_loc + fl.compile_form(u * vstab, geom, rd).local()
            A_loc = A_loc + fl.compile_form(
                ((kappa / rho_cp) * fl.lap(u)) * vstab
                - fl.dot(b_c, fl.grad(u)) * vstab,
                geom,
                rd,
            ).local()
            b_loc = b_loc + fl.compile_form(
                fl.Coefficient(sq / rho_cp) * vstab, geom, rd
            ).local()

        self.M_loc = M_loc
        self.A_loc = A_loc
        self.b_vec = V.dof_sum(b_loc)
        self.mask, self.bc_vals = combine_bcs(V, bcs)
        self._lu_cache = {}  # (alpha, beta) -> factorized sparse operator

    # -- operator actions -----------------------------------------------------
    def _apply_loc(self, loc, u):
        return self.V.dof_sum(jnp.einsum("eil,el->ei", loc, self.V.gather(u)))

    def M_apply(self, u):
        return self._apply_loc(self.M_loc, u)

    def A_apply(self, u):
        return self._apply_loc(self.A_loc, u)

    def eval_alpha_M_beta_F(self, alpha, beta, u, t):
        """alpha * M * u + beta * F(u, t)   (reference heat.py:92-101)."""
        uvec = u.vector if isinstance(u, Function) else u
        alpha = float(alpha)
        beta = float(beta)
        return alpha * self.M_apply(uvec) + beta * (self.A_apply(uvec) + self.b_vec)

    def solve_alpha_M_beta_F(self, alpha, beta, b, t, solver="direct"):
        """Solve (alpha M + beta A) u = b - beta*b_vec with Dirichlet rows
        replaced (row-replacement semantics of dolfin bc.apply,
        reference heat.py:113-121).

        solver='direct' (default): dense LU below DENSE_THRESHOLD, cached
        sparse LU above — the reference's own choice ("Krylov doesn't
        converge" for convection-dominated systems, heat.py:116-121); the
        factorization is host-side setup work reused across time steps with
        the same (alpha, beta). solver='gmres': the matrix-free
        Jacobi-GMRES path (jit-compatible; fragile when convection
        dominates at large scale)."""
        alpha = float(alpha)
        beta = float(beta)
        S_loc = alpha * self.M_loc + beta * self.A_loc
        rhs = b - beta * self.b_vec
        mask, vals = self.mask, self.bc_vals
        rhs = (1.0 - mask) * rhs + mask * vals

        if solver == "direct" and self.V.n_dofs <= DENSE_THRESHOLD:
            from .fem import dense

            S = dense.scalar_dense(self.V, S_loc)
            m = np.asarray(mask) == 1.0
            S[m, :] = 0.0
            S[m, m] = 1.0
            x = jnp.asarray(np.linalg.solve(S, np.asarray(rhs)))
        elif solver == "direct":
            lu = self._sparse_lu(alpha, beta, S_loc)
            x = jnp.asarray(
                lu.solve(np.asarray(rhs, dtype=np.float64)), dtype=rhs.dtype
            )
        else:
            assert solver == "gmres"
            free = 1.0 - mask

            def op(x):
                return free * self._apply_loc(S_loc, x) + mask * x

            diag = self.V.dof_sum(jnp.einsum("eii->ei", S_loc))
            diag = free * diag + mask
            diag = jnp.where(jnp.abs(diag) < 1e-300, 1.0, diag)
            # dtype-aware tolerance: 1e-12 is unreachable in f32 (the TPU
            # performance dtype) and would spuriously raise below
            rtol = 1e-12 if rhs.dtype == jnp.float64 else 1e-6
            x, sinfo = krylov.gmres(
                op, rhs, M=lambda r: r / diag, rtol=rtol, maxiter=2000
            )
            if not bool(sinfo.converged):
                raise RuntimeError("Heat solve did not converge")
        return Function(self.V, x)

    def _sparse_lu(self, alpha, beta, S_loc):
        """Cached scipy splu of the BC-constrained operator (host-side
        setup work, like all one-time assembly; reused every step with the
        same (alpha, beta) — the parabolic steppers call with fixed
        coefficients)."""
        key = (alpha, beta)
        lu = self._lu_cache.get(key)
        if lu is None:
            import scipy.sparse
            import scipy.sparse.linalg

            cd = self.V.cell_dofs_np.astype(np.int64)
            nl = cd.shape[1]
            n = self.V.n_dofs
            rows = np.repeat(cd, nl, axis=1).ravel()
            cols = np.tile(cd, (1, nl)).ravel()
            vals = np.asarray(S_loc, dtype=np.float64).ravel()
            S = scipy.sparse.csr_matrix(
                (vals, (rows, cols)), shape=(n, n)
            )
            m = np.asarray(self.mask) == 1.0
            # Dirichlet row replacement: zero the rows, unit diagonal
            D = scipy.sparse.diags(np.where(m, 0.0, 1.0))
            S = D @ S + scipy.sparse.diags(m.astype(np.float64))
            lu = scipy.sparse.linalg.splu(S.tocsc())
            self._lu_cache[key] = lu
        return lu
