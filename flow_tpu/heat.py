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
        mesh_hierarchy=None,
    ):
        """mesh_hierarchy (optional): the refine_uniform chain ending at
        V.mesh. Enables the ON-DEVICE multigrid-GMRES solve path for large
        systems (solver='mg' / the >DENSE_THRESHOLD auto default) — the
        scipy-splu host solve is then only a fallback for meshes without
        refinement structure."""
        self.V = V
        self.bcs = bcs
        mesh = V.mesh
        geom = geometry(mesh)
        self.geom = geom
        rho_cp = rho * cp
        self.mesh_hierarchy = mesh_hierarchy
        if mesh_hierarchy is not None:
            assert mesh_hierarchy[-1] is mesh, (
                "mesh_hierarchy must end at V.mesh"
            )
        self._kappa_prime = float(kappa) / float(rho_cp)

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
        # cell-mean |convection| on the discretization mesh: drives the
        # streamline-upwind artificial diffusion kappa + |b| h / 2 of the
        # MG preconditioner levels (solvers/shifted_mg.py docstring)
        self._bmag_cell = None
        if bq is not None:
            self._bmag_cell = np.asarray(
                jnp.mean(jnp.sqrt(jnp.sum(bq * bq, axis=-1)), axis=1)
            )

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

    def solve_alpha_M_beta_F(self, alpha, beta, b, t, solver=None):
        """Solve (alpha M + beta A) u = b - beta*b_vec with Dirichlet rows
        replaced (row-replacement semantics of dolfin bc.apply,
        reference heat.py:113-121).

        solver=None (auto): dense LU below DENSE_THRESHOLD; above it the
        ON-DEVICE 'mg' path when a mesh_hierarchy was provided, else the
        host sparse-LU fallback.
        solver='mg': GMRES preconditioned by a shift-parameterized P1
        geometric multigrid V-cycle on the symmetric reaction-diffusion
        part alpha*M_lumped + (-beta)*kappa' K (solvers/shifted_mg.py; for
        P2 spaces through the exact P2(mesh) == P1(refine(mesh)) dof
        identification). Replaces the reference's LU choice
        (/root/reference/flow/heat.py:116-121) with a device-resident
        solve that scales — the convection/SUPG parts are handled by
        GMRES, the elliptic+mass part by the V-cycle.
        solver='direct': dense below threshold, cached scipy splu above
        (host-side; the reference's own choice).
        solver='gmres': Jacobi-GMRES (fragile when convection dominates)."""
        alpha = float(alpha)
        beta = float(beta)
        if solver is None:
            if self.V.n_dofs <= DENSE_THRESHOLD:
                solver = "direct"
            elif self.mesh_hierarchy is not None:
                solver = "mg"
            else:
                solver = "direct"  # host splu fallback
        S_loc = alpha * self.M_loc + beta * self.A_loc
        rhs = b - beta * self.b_vec
        mask, vals = self.mask, self.bc_vals
        rhs = (1.0 - mask) * rhs + mask * vals

        if solver == "mg":
            free = 1.0 - mask

            def op(x):
                return free * self._apply_loc(S_loc, x) + mask * x

            hier = self._mg_hierarchy()
            c = max(-beta, 0.0)

            def M(r):
                return hier.v_cycle(r, shift=alpha, c=c)

            # 1e-11: the solution error is rtol x cond(S) (measured ~6e3
            # for the convection-dominated 74k case) — this keeps it well
            # inside the goldens' 1e-6 discipline while staying above the
            # measured f64 matvec noise floor (1e-12 was unreachable)
            rtol = 1e-11 if rhs.dtype == jnp.float64 else 1e-6
            # long restart: for convection-dominated operators the
            # MG-preconditioned spectrum is complex-plane-spread and
            # GMRES(40) restarts can stall (measured); 120 converges
            x, sinfo = krylov.gmres(
                op, rhs, M=M, rtol=rtol, maxiter=600, restart=120
            )
            if not bool(sinfo.converged):
                raise RuntimeError("Heat MG-GMRES solve did not converge")
            return Function(self.V, x)

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

    def _mg_hierarchy(self):
        """Shift-parameterized MG preconditioner over the symmetric part,
        cached ON THE FINE MESH (the Boussinesq driver rebuilds its Heat
        every Banach sweep with identical structure; only BC values and
        alpha change, and the hierarchy depends on neither)."""
        assert self.mesh_hierarchy is not None, (
            "solver='mg' needs mesh_hierarchy=[coarse...fine]"
        )
        from .solvers.shifted_mg import ShiftedP1Hierarchy

        mesh = self.V.mesh

        # streamline-upwind artificial diffusion on the discretization
        # mesh: kappa_eff = kappa' + |b| h / 2 (see ShiftedP1Hierarchy —
        # without it the pure-diffusion V-cycle is an indefinite
        # preconditioner for convection-dominated operators)
        extra_mesh = None
        if self._bmag_cell is not None:
            detJ = np.asarray(self.geom.detJ)
            if getattr(mesh, "dim", 2) == 3:
                h = np.cbrt(6.0 * np.abs(detJ))
            else:
                h = np.sqrt(2.0 * np.abs(detJ))
            extra_mesh = 0.5 * self._bmag_cell * h
        # bucket the cache by the convection strength's power of two: the
        # Boussinesq Banach loop rebuilds Heat with a slowly-evolving
        # transport field every sweep — a slightly stale streamline
        # coefficient is a fine preconditioner, a per-sweep hierarchy
        # rebuild is not
        if extra_mesh is None:
            bucket = None
        else:
            ratio = float(extra_mesh.max()) / max(self._kappa_prime, 1e-300)
            bucket = int(np.ceil(np.log2(max(ratio, 1.0))))
        mask_np = np.asarray(self.mask)
        key = (
            self.V.degree,
            round(self._kappa_prime, 14),
            hash(mask_np.tobytes()),
            bucket,
        )
        cache = getattr(mesh, "_heat_mg_cache", None)
        if cache is None:
            cache = mesh._heat_mg_cache = {}
        hier = cache.get(key)
        if hier is None:
            meshes = list(self.mesh_hierarchy)
            nlev = len(meshes)
            extras = None
            if extra_mesh is not None:
                extras = [None] * nlev
                extras[-1] = extra_mesh
                for l in range(nlev - 2, -1, -1):
                    ncp = meshes[l].n_cells
                    ch = extras[l + 1].reshape(-1, ncp)
                    extras[l] = ch.mean(axis=0)
            if self.V.degree == 2:
                # P2 dofs on mesh == P1 dofs on refine(mesh), in order
                # (fem/transfer.py): one extra preconditioner-side level
                fkey = "_heat_mg_refined"
                fine = getattr(mesh, fkey, None)
                if fine is None:
                    if getattr(mesh, "dim", 2) == 3:
                        from .mesh3d import refine_uniform_tet

                        fine = refine_uniform_tet(mesh)
                    else:
                        from .mesh import refine_uniform

                        fine = refine_uniform(mesh)
                    setattr(mesh, fkey, fine)
                meshes = meshes + [fine]
                if extras is not None:
                    # same continuous coefficient on the children
                    nchild = fine.n_cells // mesh.n_cells
                    extras = extras + [np.tile(extra_mesh, nchild)]
            hier = ShiftedP1Hierarchy(
                meshes,
                bc_mask=self.mask,
                kappa=self._kappa_prime,
                smoother_degree=2,
                extra_diff=extras,
            )
            cache[key] = hier
        return hier

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
