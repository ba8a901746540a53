# Variationally-consistent force evaluation on a boundary dof set.
#
# The standard high-accuracy drag/lift evaluation for cylinder benchmarks
# (Schaefer-Turek / John): instead of integrating the boundary traction
# sigma(u,p).n (whose f32 evaluation is ill-conditioned — boundary gradients
# cancel catastrophically at small velocities, the round-1 |Cd|>20 spike
# source), test the momentum residual against the discrete field w_d that is
# the unit vector e_d at every body dof and zero elsewhere:
#
#   F_d = (rho (du/dt + (u.grad)u), w_d) + (sigma(u,p), grad w_d) - (f, w_d)
#
# which equals the traction integral for the exact solution and is
# superconvergent for the discrete one. Everything is assembled on the
# O(surface) layer of cells touching a body dof — the probe costs a few
# hundred elements, not a volume pass.
#
# Reference has no force probes at all; the north-star metric
# (BASELINE.json: drag/lift/Strouhal to 1e-3) requires them.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fem import assembly
from ..fem.assembly import geometry, tabulation
from ..fem.spaces import FunctionSpace

__all__ = ["ConsistentForceProbe"]


class ConsistentForceProbe:
    """jit-safe callable (U1, P1, U0, dt) -> [dim] force vector on the body
    whose dofs are selected by `where` (a predicate over dof coordinates,
    same convention as FunctionSpace.boundary_dofs).

    needs_history=True: FastStepper passes the previous state and step so
    the rho*du/dt term uses the scheme's own time-derivative stencil (for
    BDF2 it receives (u_hat, dt_eff) — exactly the BDF2 derivative).
    """

    needs_history = True

    def __init__(self, V: FunctionSpace, Q: FunctionSpace, where, rho, mu,
                 rule_degree=5):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(V, Q, where, rho, mu, rule_degree)

    def _build(self, V, Q, where, rho, mu, rule_degree):
        self.rho, self.mu = float(rho), float(mu)
        mesh = V.mesh
        dim = getattr(mesh, "dim", 2)
        self.dim = dim

        body = np.zeros(V.n_dofs, dtype=bool)
        body[V.boundary_dofs(where)] = True

        # the O(surface) support layer: cells touching any body dof
        touch = body[V.cell_dofs_np].any(axis=1)
        cells = np.where(touch)[0].astype(np.int32)
        assert len(cells) > 0, "no cells touch the body dof set"
        self.cells = jnp.asarray(cells)

        self.cell_dofs_V = V.cell_dofs_np[cells]  # [ns, nlv]
        self.cell_dofs_Q = Q.cell_dofs_np[cells]  # [ns, nlq]
        # w mask at the V local dofs of the subset cells [ns, nlv]
        self.wmask = jnp.asarray(
            body[self.cell_dofs_V].astype(np.float64), dtype=mesh.dtype
        )
        self.cell_dofs_V = jnp.asarray(self.cell_dofs_V)
        self.cell_dofs_Q = jnp.asarray(self.cell_dofs_Q)

        geom = geometry(mesh)
        self.detJ = geom.detJ[self.cells]
        self.G = geom.G[self.cells]  # [ns, dim, dim]
        self.tabV = tabulation(V, rule_degree)
        self.tabQ = tabulation(Q, rule_degree)
        self.wq = jnp.asarray(self.tabV.w)  # [nq] (same rule for both tabs)

    def __call__(self, U1, P1, U0=None, dt=None, Fq=None):
        """Force vector [dim]. U0/dt give the rho*du/dt term (omit for the
        steady functional). Fq: body force at the probe's quadrature points
        [ns, nq, dim] (omit for f=0)."""
        tv, tq = self.tabV, self.tabQ
        phiV = jnp.asarray(tv.phi)      # [nq, nlv]
        dphiV = jnp.asarray(tv.dphi)    # [nq, nlv, dim(ref)]
        phiQ = jnp.asarray(tq.phi)      # [nq, nlq]

        Uloc = U1[self.cell_dofs_V]     # [ns, nlv, m]
        Ploc = P1[self.cell_dofs_Q]     # [ns, nlq]

        # values / physical gradients at quadrature points (subset cells)
        uq = jnp.einsum("ql,slm->sqm", phiV, Uloc)
        gq = jnp.einsum("qlk,sdk,slm->sqmd", dphiV, self.G, Uloc)
        pq = jnp.einsum("ql,sl->sq", phiQ, Ploc)

        # physical test-function gradients: dphi_i/dx_d [s,q,i,d]
        gphi = jnp.einsum("qlk,sdk->sqld", dphiV, self.G)

        wd = self.wq[None, :] * self.detJ[:, None]  # [s, q]

        # material acceleration rho (du/dt + (u.grad)u) [s,q,m]
        acc = jnp.einsum("sqmd,sqd->sqm", gq, uq)
        if U0 is not None:
            U0loc = U0[self.cell_dofs_V]
            u0q = jnp.einsum("ql,slm->sqm", phiV, U0loc)
            acc = acc + (uq - u0q) / dt
        if Fq is not None:
            acc = acc - Fq / self.rho
        # (rho*acc, phi_i e_d): [s, i, d]
        loc = self.rho * jnp.einsum("sqm,sq,qi->sim", acc, wd, phiV)

        # (mu (grad u + grad u^T), grad(phi_i e_d)):
        #   integrand_{i,d} = mu (g[d,k] + g[k,d]) dphi_i/dx_k
        sig = self.mu * (gq + jnp.swapaxes(gq, 2, 3))  # [s,q,m,d]
        loc = loc + jnp.einsum("sqmk,sq,sqik->sim", sig, wd, gphi)

        # -(p, div(phi_i e_d)) = -p dphi_i/dx_d
        loc = loc - jnp.einsum("sq,sq,sqid->sid", pq, wd, gphi)

        # contract with the body mask (the w_d test field). The functional
        # equals the traction integral with the FLUID-outward normal; the
        # force on the body (DFG convention, body-outward normal) is its
        # negative.
        return -jnp.einsum("sim,si->m", loc, self.wmask)
