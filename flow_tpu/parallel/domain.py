# SPMD domain decomposition over a JAX device mesh — the TPU-native
# replacement for the reference's implicit DOLFIN/PETSc MPI partitioning
# (SURVEY.md §2.2 "MPI distribution", §2.3).
#
# Model (replicated-vector domain decomposition):
#   * cells are spatially sorted and block-partitioned across the 'x' mesh
#     axis (each device owns a contiguous strip of elements);
#   * dof vectors are replicated; each device assembles the contributions of
#     its own elements and one psum per operator application produces the
#     globally assembled vector (the FEM analog of gradient all-reduce in
#     data parallelism — communication per Krylov matvec = one all-reduce of
#     the dof vector over ICI);
#   * Krylov/Newton iterations run replicated inside shard_map: dot products
#     need no communication at all.
#
# The whole projection step (Newton + pressure Poisson + correction) is one
# shard_map'ed XLA program. This reuses the *same* form kernels as the
# single-chip path (fem/forms.py) through duck-typed per-device local spaces.
from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, PartitionSpec as P

from ..fem import assembly, forms
from ..fem.assembly import geometry
from ..fem.spaces import FunctionSpace
from ..fem.bc import combine_bcs
from ..solvers import krylov
from .pc_context_shared import make_boundary_arrays

__all__ = ["partition_cells", "ShardedProjection"]

AXIS = "x"


def partition_cells(mesh, n_devices):
    """Spatially-sorted block partition of cells; returns (order, n_local).

    Cells are sorted by centroid x (strip decomposition: each device's strip
    touches only its neighbors, keeping the future halo-exchange variant a
    2-neighbor ppermute), padded to a multiple of n_devices."""
    cent = mesh.points_np[mesh.cells_np].mean(axis=1)
    order = np.argsort(cent[:, 0], kind="stable").astype(np.int32)
    n_local = -(-len(order) // n_devices)
    return order, n_local


class _LocalSpace:
    """Duck-typed FunctionSpace for a per-device block of cells: global dof
    numbering, local (sharded) cell list, scatter-add dof summation.

    Satisfies the interface used by fem/forms.py and fem/assembly.py
    (gather / dof_sum / degree / n_components / n_dofs / mesh.dtype), so the
    sharded path runs the *identical* form kernels as single-chip."""

    def __init__(self, degree, n_components, n_dofs, cell_dofs, dtype):
        self.degree = degree
        self.n_components = n_components
        self.n_dofs = n_dofs
        self.cell_dofs = cell_dofs
        self.n_local = cell_dofs.shape[1]
        self.mesh = SimpleNamespace(dtype=dtype)

    def gather(self, U):
        return U[self.cell_dofs]

    def dof_sum(self, loc):
        out = jnp.zeros((self.n_dofs,) + loc.shape[2:], dtype=loc.dtype)
        return out.at[self.cell_dofs].add(loc)


class _LocalGeom:
    def __init__(self, detJ, G, C):
        self.detJ = detJ
        self.G = G
        self.C = C


class ShardedProjection:
    """The full Navier-Stokes projection step, shard_map'ed over a 1-D device
    mesh. Discrete equations identical to navier_stokes.pressure_correction.

    step(U, P, dt) -> (U1, P1) with U, P replicated [n_dofs(,2)] arrays.
    """

    def __init__(
        self,
        V: FunctionSpace,
        Q: FunctionSpace,
        u_bcs,
        p_bcs,
        rho,
        mu,
        devices=None,
        time_step_method="backward euler",
        rotational_form=True,
        newton_tol=1.0e-10,
        newton_maxiter=10,
        linear_rtol=1.0e-7,
        pressure_rtol=1.0e-10,
        with_force=False,
        force_rule=6,
    ):
        mesh = V.mesh
        dtype = mesh.dtype
        devices = devices if devices is not None else jax.devices()
        ndev = len(devices)
        self.jmesh = JMesh(np.array(devices), (AXIS,))
        self.ndev = ndev

        # -- partition + pad per-cell data -----------------------------------
        order, n_local = partition_cells(mesh, ndev)
        ntot = n_local * ndev
        pad = ntot - len(order)

        geomg = geometry(mesh)

        def pad_cells(a, fill=0):
            a = np.asarray(a)[order]
            if pad:
                a = np.concatenate(
                    [a, np.full((pad,) + a.shape[1:], fill, dtype=a.dtype)]
                )
            return jnp.asarray(a)

        self.cd_V = pad_cells(V.cell_dofs_np)
        self.cd_Q = pad_cells(Q.cell_dofs_np)
        # padded cells get detJ = 0 and G = C = 0: every form kernel scales
        # by detJ / C / (w*detJ), so padding contributes exactly zero
        self.detJ = pad_cells(np.asarray(geomg.detJ), fill=0.0)
        self.G = pad_cells(np.asarray(geomg.G), fill=0.0)
        self.C = pad_cells(np.asarray(geomg.C), fill=0.0)

        # -- replicated data ---------------------------------------------------
        self.mask_u, self.val_u = combine_bcs(V, u_bcs)
        self.has_p_bcs = bool(p_bcs)
        if self.has_p_bcs:
            self.mask_p, self.val_p = combine_bcs(Q, p_bcs)
        else:
            self.mask_p = jnp.zeros(Q.n_dofs, dtype=dtype)
            self.val_p = self.mask_p
        self.ones_Q = jnp.ones(Q.n_dofs, dtype=dtype)

        # Jacobi diagonals (global, replicated)
        md = assembly.mass_diag(V, geomg)[:, None] * jnp.ones((1, 2), dtype=dtype)
        sd = assembly.stiffness_diag(V, geomg)[:, None] * jnp.ones((1, 2), dtype=dtype)
        self.mass_diag_V = md
        self.stiff_diag_V = sd
        self.stiff_diag_Q = assembly.stiffness_diag(Q, geomg)

        # boundary-term arrays (replicated; each device computes 1/ndev of it)
        self.bnd = make_boundary_arrays(V, Q, rule_degree=5)

        self.rho = float(rho)
        self.mu = float(mu)
        self.rotational = rotational_form
        if time_step_method == "forward euler":
            self.theta = (1.0, 0.0)
        elif time_step_method == "backward euler":
            self.theta = (0.0, 1.0)
        else:
            assert time_step_method == "crank-nicolson"
            self.theta = (0.5, 0.5)
        self.newton_tol = newton_tol
        self.newton_maxiter = newton_maxiter
        self.linear_rtol = linear_rtol
        self.pressure_rtol = pressure_rtol

        self.nV = V.n_dofs
        self.nQ = Q.n_dofs
        self.degV = V.degree
        self.degQ = Q.degree
        self.dtype = dtype

        # body-force support: Fq is per-cell quadrature values of f at the
        # force rule, sharded along cells like the geometry
        self.with_force = with_force
        self.force_rule = force_rule
        if with_force:
            from ..fem.assembly import tabulation as _tabulation

            self._nq_force = _tabulation(V, force_rule).nq
            # reuse the cell permutation/padding of the geometry arrays
            order, n_local = partition_cells(mesh, ndev)
            self._force_order = order
            self._force_pad = n_local * ndev - len(order)

        spec_cells = P(AXIS)
        spec_rep = P()
        in_specs = [
            spec_rep,  # U
            spec_rep,  # P
            spec_rep,  # dt
            spec_cells,  # cd_V
            spec_cells,  # cd_Q
            spec_cells,  # detJ
            spec_cells,  # G
            spec_cells,  # C
        ]
        if with_force:
            in_specs.append(spec_cells)  # Fq
        self.step = jax.jit(
            jax.shard_map(
                self._step_local,
                mesh=self.jmesh,
                in_specs=tuple(in_specs),
                out_specs=(spec_rep, spec_rep, spec_rep),
                check_vma=False,
            )
        )

    def pack_force(self, Fq_cells):
        """Reorder+pad per-cell force quadrature values [n_cells, nq, ncomp]
        into the sharded cell layout."""
        a = np.asarray(Fq_cells)[self._force_order]
        if self._force_pad:
            a = np.concatenate(
                [a, np.zeros((self._force_pad,) + a.shape[1:], dtype=a.dtype)]
            )
        return jnp.asarray(a, dtype=self.dtype)

    # convenience wrapper matching the single-chip call style
    def __call__(self, U, Pv, dt, Fq=None):
        args = [
            U, Pv, jnp.asarray(dt, dtype=self.dtype),
            self.cd_V, self.cd_Q, self.detJ, self.G, self.C,
        ]
        if self.with_force:
            assert Fq is not None, "constructed with with_force=True"
            args.append(Fq)
        return self.step(*args)

    # ---- per-device step (runs under shard_map) ----------------------------
    def _step_local(self, U, Pv, dt, cd_V, cd_Q, detJ, G, C, Fq=None):
        dtype = self.dtype
        Vl = _LocalSpace(self.degV, 2, self.nV, cd_V, dtype)
        Ql = _LocalSpace(self.degQ, 1, self.nQ, cd_Q, dtype)
        gl = _LocalGeom(detJ, G, C)
        rho, mu = self.rho, self.mu
        inv_ndev = 1.0 / self.ndev

        def psum(x):
            return jax.lax.psum(x, AXIS)

        # ---- momentum rhs: fused local evaluation (one gather + one dof
        # summation per residual; partial over this device's cells + 1/ndev
        # of the replicated boundary terms)
        free_u = 1.0 - self.mask_u
        U0loc = Vl.gather(U)
        Ploc0 = Ql.gather(Pv)

        def rhs_weak_loc(Wloc):
            loc = -rho * forms.skew_convection_combined_loc(
                Vl, gl, Wloc, rule_degree=5
            )
            loc = loc - forms.sym_grad_loc(Vl, gl, Wloc, mu)
            loc = loc + forms.pressure_grad_loc(Vl, Ql, gl, Ploc0)
            if Fq is not None:
                loc = loc + forms.body_force_loc(
                    Vl, gl, Fq, rule_degree=self.force_rule
                )
            return loc

        def residual(x):
            xloc = Vl.gather(x)
            loc = forms.mass_loc(Vl, gl, xloc - U0loc)
            w_ex, w_im = self.theta
            if w_ex:
                loc = loc - (dt / rho) * w_ex * rhs_weak_loc(U0loc)
            if w_im:
                loc = loc - (dt / rho) * w_im * rhs_weak_loc(xloc)
            r = Vl.dof_sum(loc)
            w_ex_b = (dt / rho) * w_ex if w_ex else 0.0
            w_im_b = (dt / rho) * w_im if w_im else 0.0
            bnd = None
            if w_ex:
                bnd = w_ex_b * self._boundary_terms(U, Pv)
            if w_im:
                b = w_im_b * self._boundary_terms(x, Pv)
                bnd = b if bnd is None else bnd + b
            if bnd is not None:
                r = r - inv_ndev * bnd
            r = psum(r)
            return free_u * r + self.mask_u * (x - self.val_u)

        w_im = self.theta[1]
        diag = self.mass_diag_V + (dt / rho) * w_im * (2.0 * mu) * self.stiff_diag_V
        diag = free_u * diag + self.mask_u
        x0 = free_u * U + self.mask_u * self.val_u

        def newton_body(state):
            x, rnorm, k = state
            r, Jv = jax.linearize(residual, x)

            dx, _ = krylov.bicgstab(
                Jv, -r, M=lambda t: t / diag,
                rtol=self.linear_rtol, atol=0.05 * self.newton_tol, maxiter=300,
            )
            x = x + dx
            rn = residual(x)
            return (x, jnp.sqrt(jnp.sum(rn * rn)), k + 1)

        def newton_cond(state):
            _, rnorm, k = state
            return jnp.logical_and(rnorm > self.newton_tol, k < self.newton_maxiter)

        r0 = residual(x0)
        Ui, _, _ = jax.lax.while_loop(
            newton_cond, newton_body, (x0, jnp.sqrt(jnp.sum(r0 * r0)), jnp.array(0))
        )

        # ---- pressure Poisson -------------------------------------------------
        # increment form phi = p1 - p0, matching FastStepper (see
        # navier_stokes/fast.py _pressure_solve_mg: increment-relative
        # Krylov stopping); FLOW_ABS_SOLVES=1 restores the full-field form
        import os as _os

        incr = _os.environ.get("FLOW_ABS_SOLVES", "") != "1"

        def K(p):
            return psum(forms.assembly.stiffness_apply(Ql, gl, p))

        L2 = -(rho / dt) * forms.div_rhs(Vl, Ql, gl, Ui)
        if self.rotational:
            L2 = L2 - mu * forms.grad_div_ustar_rhs(Vl, Ql, gl, Ui)
        L2 = psum(L2) if incr else psum(L2) + K(Pv)

        diag_Q = jnp.where(self.stiff_diag_Q > 0, self.stiff_diag_Q, 1.0)
        if not self.has_p_bcs:
            P1, _ = krylov.cg(
                K, L2, M=lambda r: r / diag_Q,
                rtol=self.pressure_rtol, maxiter=1000, nullspace=[self.ones_Q],
            )
        else:
            free_p = 1.0 - self.mask_p

            def K_bc(p):
                return free_p * K(free_p * p) + self.mask_p * p

            pin = (
                self.mask_p * (self.val_p - Pv) if incr
                else self.mask_p * self.val_p
            )
            rhs = free_p * (L2 - K(pin)) + pin
            P1, _ = krylov.cg(
                K_bc, rhs, M=lambda r: r / (free_p * diag_Q + self.mask_p),
                rtol=self.pressure_rtol, maxiter=1000,
            )
        if incr:
            P1 = Pv + P1

        # ---- velocity correction ---------------------------------------------
        phi = P1 - Pv
        div_part = None
        if self.rotational:
            div_part = mu * forms.grad_div_ustar(Vl, gl, Ui)
        gphi = (dt / rho) * forms.grad_phi_rhs(
            Vl, Ql, gl, phi, div_part=div_part, rule_degree=4
        )

        def M_bc(u):
            y = psum(forms.assembly.mass_apply(Vl, gl, free_u * u))
            return free_u * y + self.mask_u * u

        diag_m = free_u * self.mass_diag_V + self.mask_u
        if incr:
            # solve for d = u1 - u* (increment-relative stopping)
            L3 = psum(-gphi)
            dmask = self.mask_u * (self.val_u - Ui)
            rhs = (
                free_u * (L3 - psum(forms.assembly.mass_apply(Vl, gl, dmask)))
                + dmask
            )
            d, _ = krylov.cg(
                M_bc, rhs, M=lambda r: r / diag_m, rtol=1.0e-10, maxiter=500
            )
            U1 = Ui + d
        else:
            L3 = psum(forms.assembly.mass_apply(Vl, gl, Ui) - gphi)
            rhs = (
                free_u
                * (
                    L3
                    - psum(
                        forms.assembly.mass_apply(
                            Vl, gl, self.mask_u * self.val_u
                        )
                    )
                )
                + self.mask_u * self.val_u
            )
            U1, _ = krylov.cg(
                M_bc, rhs, M=lambda r: r / diag_m, rtol=1.0e-10, maxiter=500
            )
        return U1, P1, Ui

    def _boundary_terms(self, W, P0):
        """-int p0 n.v ds + mu int (grad w)^T n.v ds over all boundary facets
        (computed replicated, scaled by 1/ndev by the caller)."""
        b = self.bnd
        wq = jnp.einsum("bql,blm->bqm", b.phiV, W[b.cdV])
        gw = jnp.einsum("bqlk,bdk,blm->bqmd", b.dphiV, b.Gb, W[b.cdV])
        pq = jnp.einsum("bql,bl->bq", b.phiQ, P0[b.cdQ])
        val = -pq[:, :, None] * b.normals[:, None, :]
        val = val + self.mu * jnp.einsum(
            "bqmd,bm->bqd", gw.transpose(0, 1, 3, 2), b.normals
        )
        loc = jnp.einsum("bqm,bq,bqi->bim", val, b.wl, b.phiV)
        out = jnp.zeros((self.nV, 2), dtype=loc.dtype)
        return out.at[b.cdV].add(loc)
