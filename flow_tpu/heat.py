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
        wd = tab.w[None, :] * geom.detJ[:, None]  # [nc, nq]

        # gradients of all basis functions at qp: [nc, nq, nl, 2]
        gphi = jnp.einsum("qlk,edk->eqld", tab.dphi, geom.G)

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

        # ---- M: vertex-quadrature mass --------------------------------------
        from .fem import quadrature

        dim = getattr(mesh, "dim", 2)
        vpts, vw = quadrature.simplex_rule(quadrature.VERTEX, dim)
        vphi, _ = elements.tabulate(deg, vpts, dim=dim)
        Mref_v = np.einsum("q,qi,qj->ij", vw, vphi, vphi)
        M_loc = jnp.asarray(Mref_v, dtype=mesh.dtype)[None] * geom.detJ[:, None, None]

        # ---- A: bilinear part of F -------------------------------------------
        # -kappa/(rho cp) * stiffness
        A_loc = -(kappa / rho_cp) * assembly.stiffness_local(V, geom)
        # -(b . grad u) v
        if bq is not None:
            bgrad = jnp.einsum("eqd,eqld->eql", bq, gphi)  # (b.grad phi_l) [nc,nq,nl]
            A_loc = A_loc - jnp.einsum("eq,eql,qi->eil", wd, bgrad, tab.phi)

        # ---- b: source part ---------------------------------------------------
        xq = geom.physical_points(tab.ref_pts)
        if isinstance(source, Function):
            stab_t = tabulation(source.space, rd)
            sq = assembly.values_at_qp(stab_t, source.space.gather(source.vector))
        else:
            sq = eval_callable(source, xq)
        b_loc = jnp.einsum("eq,eq,qi->ei", wd, sq, tab.phi)

        # ---- SUPG -------------------------------------------------------------
        if supg_stabilization:
            assert conv is not None
            tau = stabilization.supg_tau(mesh, bq, kappa, deg)  # [nc, nq]
            # test factor: tau * (b . grad v_i)
            tbg = tau[:, :, None] * jnp.einsum("eqd,eqid->eqi", bq, gphi)
            # M += int u tau (b.grad v)
            M_loc = M_loc + jnp.einsum("eq,ql,eqi->eil", wd, tab.phi, tbg)
            # Laplacian of basis: tr(G Href_l G^T) per element [nc, nl]
            Href = jnp.asarray(
                elements.hessian_ref(deg, getattr(mesh, "dim", 2)),
                dtype=mesh.dtype,
            )
            lap = jnp.einsum("eak,lkm,eam->el", geom.G, Href, geom.G)
            # A += int (kappa/(rho cp) lap(u) - b.grad u) tau (b.grad v)
            A_loc = A_loc + jnp.einsum(
                "eq,el,eqi->eil", wd, (kappa / rho_cp) * lap, tbg
            )
            A_loc = A_loc - jnp.einsum("eq,eql,eqi->eil", wd, bgrad, tbg)
            # b += int (s/(rho cp)) tau (b.grad v)
            b_loc = b_loc + jnp.einsum("eq,eq,eqi->ei", wd, sq / rho_cp, tbg)

        self.M_loc = M_loc
        self.A_loc = A_loc
        self.b_vec = V.dof_sum(b_loc)
        self.mask, self.bc_vals = combine_bcs(V, bcs)

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

    def solve_alpha_M_beta_F(self, alpha, beta, b, t):
        """Solve (alpha M + beta A) u = b - beta*b_vec with Dirichlet rows
        replaced (row-replacement semantics of dolfin bc.apply,
        reference heat.py:113-121)."""
        alpha = float(alpha)
        beta = float(beta)
        S_loc = alpha * self.M_loc + beta * self.A_loc
        rhs = b - beta * self.b_vec
        mask, vals = self.mask, self.bc_vals
        rhs = (1.0 - mask) * rhs + mask * vals

        if self.V.n_dofs <= DENSE_THRESHOLD:
            from .fem import dense

            S = dense.scalar_dense(self.V, S_loc)
            m = np.asarray(mask) == 1.0
            S[m, :] = 0.0
            S[m, m] = 1.0
            x = jnp.asarray(np.linalg.solve(S, np.asarray(rhs)))
        else:
            free = 1.0 - mask

            def op(x):
                return free * self._apply_loc(S_loc, x) + mask * x

            diag = self.V.dof_sum(jnp.einsum("eii->ei", S_loc))
            diag = free * diag + mask
            diag = jnp.where(jnp.abs(diag) < 1e-300, 1.0, diag)
            x, sinfo = krylov.gmres(
                op, rhs, M=lambda r: r / diag, rtol=1e-12, maxiter=2000
            )
            if not bool(sinfo.converged):
                raise RuntimeError("Heat solve did not converge")
        return Function(self.V, x)
