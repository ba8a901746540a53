# Adaptive AB2/Trapezoid monolithic Navier-Stokes integrator
# (Gresho/Sani sec. 3.16.4).
#
# The reference ships this scheme as dead code — /root/reference/
# experimental/ab2r.py has no imports and cannot run (SURVEY.md §2.1). This
# is a working TPU-native realization of the same design:
#   * consistent-initialization bootstrap: solve the coupled system
#       [M  C] [du/dt]   [F(u0)]
#       [C^T 0] [ p   ] = [ 0   ]
#     for the initial acceleration and pressure (ab2r.py:33-139's intent);
#   * explicit Adams-Bashforth-2 predictor (ab2r.py:176-181);
#   * nonlinear trapezoid corrector, solved monolithically (velocity +
#     pressure saddle point) by Newton/GMRES (ab2r.py:216-256);
#   * local-truncation-error step-size controller
#       dt' = dt * (eps / ||u_TR - u_AB2||)^(1/3)   (ab2r.py:264-273).
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fem import assembly, forms
from ..fem.assembly import geometry, tabulation
from ..fem.spaces import FunctionSpace, Function
from ..fem.bc import combine_bcs
from ..fem.interpolate import eval_callable
from ..solvers import krylov

__all__ = ["AB2TR"]


class AB2TR:
    """Monolithic adaptive NS integrator on Taylor-Hood (V=P2 vec, Q=P1).

    Usage:
        integ = AB2TR(V, Q, u_bcs, rho, mu, f)
        state = integ.bootstrap(u0, p0_guess=None)
        state, dt_used, lte = integ.step(state, dt)
    """

    def __init__(self, V: FunctionSpace, Q: FunctionSpace, u_bcs, rho, mu, f=None):
        self.V, self.Q = V, Q
        self.rho = float(rho)
        self.mu = float(mu)
        self.geom = geometry(V.mesh)
        self.mask_u, self.val_u = combine_bcs(V, u_bcs)
        self.free_u = 1.0 - self.mask_u
        self.f = f
        dtype = V.mesh.dtype
        self.ones_Q = jnp.ones(Q.n_dofs, dtype=dtype)
        self.mass_diag = assembly.mass_diag(V, self.geom)[:, None] * jnp.ones(
            (1, 2), dtype=dtype
        )
        self.mp_diag = assembly.lumped_mass_diag(Q, self.geom)

        self._f_q = None
        if f is not None:
            ftab = tabulation(V, 6)
            xq = self.geom.physical_points(ftab.ref_pts)
            self._f_q = eval_callable(f, xq)

    # -- spatial operator: momentum rhs (no pressure) -------------------------
    def _rhs_mom(self, U):
        V, geom = self.V, self.geom
        out = -self.rho * forms.skew_convection_combined_rhs(
            V, geom, U, rule_degree=5
        )
        out = out - forms.sym_grad_apply(V, geom, U, self.mu)
        if self._f_q is not None:
            ftab = tabulation(V, 6)
            out = out + assembly.integrate_rhs(V, ftab, geom, val=self._f_q)
        return out

    def _saddle_residual(self, Udot, P, U):
        """[ M u' - rhs_mom(u) + C p ;  C^T u' ] (the constraint is enforced
        on the acceleration: d/dt div(u) = 0 keeps u div-free)."""
        V, Q, geom = self.V, self.Q, self.geom
        ru = assembly.mass_apply(V, geom, Udot) - self._rhs_mom(U)
        ru = ru - forms.pressure_grad_rhs(V, Q, geom, P)
        rp = forms.div_rhs(V, Q, geom, Udot)
        return ru, rp

    # -- consistent initialization --------------------------------------------
    def bootstrap(self, u0: Function, dudt_bc_vals=None):
        """Solve the coupled [M C; C^T 0] system for (du/dt, p) at t=0."""
        V, Q = self.V, self.Q
        U0 = u0.vector
        mask, free = self.mask_u, self.free_u
        gdot = jnp.zeros_like(U0) if dudt_bc_vals is None else dudt_bc_vals
        nV2 = V.n_dofs * 2

        def pack(a, b):
            return jnp.concatenate([a.reshape(-1), b])

        def op(z):
            Ud = z[:nV2].reshape(V.n_dofs, 2)
            P = z[nV2:]
            ru = assembly.mass_apply(V, self.geom, free * Ud) - forms.pressure_grad_rhs(
                V, Q, self.geom, P
            )
            ru = free * ru + mask * Ud
            rp = forms.div_rhs(V, Q, self.geom, free * Ud + mask * gdot)
            rp = rp - jnp.mean(rp)
            return pack(ru, rp)

        bu = self._rhs_mom(U0)
        bu = free * bu + mask * gdot
        b = pack(bu, jnp.zeros(Q.n_dofs, dtype=U0.dtype))

        ns = pack(jnp.zeros_like(U0), self.ones_Q)
        ns = ns / jnp.sqrt(jnp.sum(ns * ns))

        def Mprec(z):
            Ud = z[:nV2].reshape(V.n_dofs, 2)
            P = z[nV2:]
            return pack(Ud / self.mass_diag, P / self.mp_diag)

        z, sinfo = krylov.gmres(
            lambda z: op(z - jnp.sum(ns * z) * ns),
            b - jnp.sum(ns * b) * ns,
            M=Mprec,
            rtol=1e-10,
            maxiter=4000,
            restart=80,
        )
        Udot = z[:nV2].reshape(V.n_dofs, 2)
        P = z[nV2:]
        P = P - jnp.mean(P)
        return {
            "u": U0,
            "udot": Udot,
            "p": P,
            "udot_old": Udot,
            "dt_old": None,
        }

    # -- one adaptive step -----------------------------------------------------
    def step(self, state, dt, eps=1e-4, newton_tol=1e-9, newton_maxiter=8):
        """AB2 predict, TR correct, LTE-based next-dt. Returns
        (new_state, dt_next, lte)."""
        V, Q = self.V, self.Q
        U0, Udot0 = state["u"], state["udot"]
        dt_old = state["dt_old"]
        mask, free = self.mask_u, self.free_u

        # AB2 predictor (falls back to forward Euler on the first step)
        if dt_old is None:
            U_pred = U0 + dt * Udot0
        else:
            r = dt / dt_old
            U_pred = U0 + 0.5 * dt * ((2.0 + r) * Udot0 - r * state["udot_old"])

        # TR corrector: solve for (u1, p_half) with
        #   M(u1 - u0) = dt/2 (rhs(u1) + rhs(u0)) + dt C p
        #   C^T u1 = 0
        nV2 = V.n_dofs * 2

        def pack(a, b):
            return jnp.concatenate([a.reshape(-1), b])

        rhs0 = self._rhs_mom(U0)

        def res(z):
            U1 = z[:nV2].reshape(V.n_dofs, 2)
            P = z[nV2:]
            ru = assembly.mass_apply(V, self.geom, U1 - U0) - 0.5 * dt * (
                self._rhs_mom(U1) + rhs0
            )
            ru = ru - dt * forms.pressure_grad_rhs(V, Q, self.geom, P)
            ru = free * ru + mask * (U1 - self.val_u)
            # BC-consistent velocity in the constraint (the boundary data
            # carries nonzero flux that the interior must balance)
            rp = forms.div_rhs(V, Q, self.geom, free * U1 + mask * self.val_u)
            rp = rp - jnp.mean(rp)
            return pack(ru, rp)

        def Mprec(z):
            U1 = z[:nV2].reshape(V.n_dofs, 2)
            P = z[nV2:]
            return pack(U1 / self.mass_diag, P / (dt * self.mp_diag / self.rho))

        z = pack(free * U_pred + mask * self.val_u, state["p"])
        for _ in range(newton_maxiter):
            r, Jv = jax.linearize(res, z)
            rn = float(jnp.sqrt(jnp.sum(r * r)))
            if rn < newton_tol:
                break
            dz, _ = krylov.gmres(Jv, -r, M=Mprec, rtol=1e-8, maxiter=2000, restart=80)
            z = z + dz

        U1 = z[:nV2].reshape(V.n_dofs, 2)
        P1 = z[nV2:]
        P1 = P1 - jnp.mean(P1)
        Udot1 = (2.0 / dt) * (U1 - U0) - Udot0  # TR consistency

        # LTE controller (ab2r.py:264-273's rule)
        lte = float(jnp.max(jnp.abs(U1 - U_pred))) / 3.0
        dt_next = dt * (eps / max(lte, 1e-30)) ** (1.0 / 3.0)
        dt_next = min(dt_next, 2.0 * dt)

        new_state = {
            "u": U1,
            "udot": Udot1,
            "p": P1,
            "udot_old": Udot0,
            "dt_old": dt,
        }
        return new_state, dt_next, lte
