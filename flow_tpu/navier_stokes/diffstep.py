# Reverse-mode differentiable projection stepper (adjoint-capable).
#
# FastStepper's Krylov solves run inside lax.while_loop, which reverse-mode
# AD cannot traverse. This module re-expresses the SAME discrete step —
# semi-implicit (lagged-transport) momentum + pressure Poisson + velocity
# correction, increment form, einsum path — with every linear solve wrapped
# in jax.lax.custom_linear_solve. JAX then differentiates each solve via the
# implicit-function theorem: the backward pass solves the TRANSPOSED system
# with the same Krylov method, so
#   * memory stays O(state) per step (no taping of Krylov iterations),
#   * gradients are exact at solver tolerance,
#   * jax.grad works through whole trajectories (chain steps, checkpoint
#     with jax.checkpoint for long horizons).
# This enables adjoint sensitivity / design optimization / data
# assimilation — a capability the reference stack does not have (dolfin
# ships no adjoint; /root/reference/flow has none), and the payoff of
# building the framework as pure functional JAX.
#
# Differentiable inputs: U, P, dt, mu, rho (pass them as tracers to
# jax.grad / jax.jacfwd). Mesh, BCs and tolerances are static.
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..fem import assembly, forms
from ..solvers import krylov
from .fast import FastStepper

__all__ = ["DiffStepper"]


def _sg(x):
    return lax.stop_gradient(x)


class DiffStepper:
    """Differentiable counterpart of a lagged-convection FastStepper.

    Wraps (or builds) a FastStepper purely for its setup artifacts — the
    NSContext (residual/forms/tabulations), BC masks, diagonals, theta
    weights — and exposes a functional `step` whose outputs are
    reverse-mode differentiable with respect to (U, P, dt, mu, rho).

    Forward-pass semantics match FastStepper(convection="lagged") with the
    increment-form solves (the production default): equivalence is pinned
    in tests/test_diffstep.py.
    """

    def __init__(
        self,
        V=None,
        Q=None,
        u_bcs=None,
        p_bcs=None,
        rho=1.0,
        mu=1.0,
        rotational_form=False,
        stepper: FastStepper | None = None,
        momentum_rtol=1.0e-10,
        pressure_rtol=1.0e-10,
        correction_rtol=1.0e-10,
        maxiter=1000,
    ):
        if stepper is None:
            stepper = FastStepper(
                V,
                Q,
                u_bcs,
                p_bcs,
                rho=rho,
                mu=mu,
                rotational_form=rotational_form,
                convection="lagged",
                packed=False,
            )
        assert stepper.lagged, "DiffStepper requires a lagged-convection stepper"
        assert not stepper.winkernel and not stepper.packed, (
            "DiffStepper uses the einsum path (winkernel/packed matvecs are "
            "not expressed through custom_linear_solve)"
        )
        self.st = stepper
        self.ctx = stepper.ctx
        self.rho = stepper.rho
        self.mu = stepper.mu
        self.rotational = stepper.rotational
        self.momentum_rtol = momentum_rtol
        self.pressure_rtol = pressure_rtol
        self.correction_rtol = correction_rtol
        self.maxiter = maxiter
        self.step = jax.jit(self._step_impl)
        self.rollout = jax.jit(self._rollout_impl, static_argnames=("n_steps",))

    # -- solve callbacks (preconditioners are stop_gradient'd: they change
    #    iteration counts, never the solution, so this is exact) ----------
    def _bicgstab_solve(self, diag, rtol):
        diag = _sg(diag)

        def solve(mv, b):
            x, _ = krylov.bicgstab(
                mv, b, M=lambda t: t / diag, rtol=rtol, maxiter=self.maxiter
            )
            return x

        return solve

    def _cg_solve(self, diag, rtol):
        diag = _sg(diag)

        def solve(mv, b):
            x, _ = krylov.cg(
                mv, b, M=lambda r: r / diag, rtol=rtol, maxiter=self.maxiter
            )
            return x

        return solve

    def _rollout_impl(self, U, P, dt, n_steps, mu=None, rho=None):
        """n_steps differentiable steps as ONE lax.scan — program size stays
        constant in n_steps (a Python loop of steps re-traces the whole
        pipeline per step). Each scan body is jax.checkpoint'ed: the
        backward pass stores only the per-step (U, P) carries and
        recomputes everything else, so adjoint memory is
        O(n_steps x state), independent of solver internals."""

        @jax.checkpoint
        def body(carry, _):
            U_, P_ = carry
            U1, P1 = self._step_impl(U_, P_, dt, mu=mu, rho=rho)
            return (U1, P1), None

        (U, P), _ = lax.scan(body, (U, P), None, length=n_steps)
        return U, P

    # -- one differentiable projection step ------------------------------
    def _step_impl(self, U, P, dt, mu=None, rho=None, x0=None):
        """One increment-form projection step; returns (U1, P1).

        mu/rho default to the stepper's constants — pass tracers to
        differentiate with respect to them. x0 is the lagged transport /
        initial guess (default U, the theta-method choice)."""
        st, ctx = self.st, self.ctx
        mu = st.mu if mu is None else mu
        rho = st.rho if rho is None else rho
        V, Q, geom = st.V, st.Q, ctx.geom
        mask_u, val_u = st.mask_u, st.val_u
        free_u = 1.0 - mask_u
        w_im = st.theta[1]
        if x0 is None:
            x0 = U
        x0 = free_u * x0 + mask_u * val_u

        # substep 1: lagged momentum — res is AFFINE in x, so the Newton
        # loop collapses to ONE linear solve for d = x - x0
        def res_lag(x, U_, P_, mu_, rho_, dt_, t_):
            r = ctx._residual(
                x, U_, None, None, P_, rho_, mu_, dt_, st.theta, transport=t_
            )
            return free_u * r + mask_u * (x - val_u)

        def mom_matvec(v):
            # jvp is structurally linear in v (custom_linear_solve can
            # transpose it) and differentiable in the closed-over params
            return jax.jvp(
                lambda x: res_lag(x, U, P, mu, rho, dt, x0), (x0,), (v,)
            )[1]

        diag_m = ctx.mass_diag_V + (dt / rho) * w_im * (2.0 * mu) * ctx.stiff_diag_V
        diag_m = free_u * diag_m + mask_u
        b_m = -res_lag(x0, U, P, mu, rho, dt, x0)
        d = lax.custom_linear_solve(
            mom_matvec,
            b_m,
            solve=self._bicgstab_solve(diag_m, self.momentum_rtol),
            transpose_solve=self._bicgstab_solve(diag_m, self.momentum_rtol),
        )
        Ui = x0 + d

        # substep 2: pressure Poisson, increment form (phi = p1 - p0)
        L2 = -(rho / dt) * forms.div_rhs(V, Q, geom, Ui)
        if self.rotational:
            L2 = L2 - mu * forms.grad_div_ustar_rhs(V, Q, geom, Ui)
        diag_q = jnp.where(ctx.stiff_diag_Q > 0, ctx.stiff_diag_Q, 1.0)

        if not st.has_p_bcs:
            # pure Neumann: solve the rank-one-completed SPD system
            #   (K + u u^T) phi = (I - u u^T) rhs,   u = normalized ones
            # — nonsingular, and its solution is exactly the zero-mean
            # solution the nullspace-projected CG returns (so the forward
            # pass matches FastStepper and implicit differentiation is on
            # an invertible operator)
            uQ = ctx.ones_Q / jnp.linalg.norm(ctx.ones_Q)

            def K_reg(p):
                return assembly.stiffness_apply(Q, geom, p) + uQ * jnp.vdot(
                    uQ, p
                )

            rhs = L2 - uQ * jnp.vdot(uQ, L2)
            phi = lax.custom_linear_solve(
                K_reg,
                rhs,
                solve=self._cg_solve(diag_q, self.pressure_rtol),
                symmetric=True,
            )
        else:
            mask_p, val_p = st.mask_p, st.val_p
            free_p = 1.0 - mask_p

            def K_bc(p):
                return (
                    free_p * assembly.stiffness_apply(Q, geom, free_p * p)
                    + mask_p * p
                )

            pin = mask_p * (val_p - P)
            rhs = (
                free_p * (L2 - assembly.stiffness_apply(Q, geom, pin)) + pin
            )
            phi = lax.custom_linear_solve(
                K_bc,
                rhs,
                solve=self._cg_solve(free_p * diag_q + mask_p, self.pressure_rtol),
                symmetric=True,
            )
        P1 = P + phi

        # substep 3: velocity correction, increment form (d = u1 - u*)
        div_part = None
        if self.rotational:
            div_part = mu * forms.grad_div_ustar(V, geom, Ui)

        def M_bc(u):
            y = assembly.mass_apply(V, geom, free_u * u)
            return free_u * y + mask_u * u

        diag_c = free_u * ctx.mass_diag_V + mask_u
        L3 = -(dt / rho) * forms.grad_phi_rhs(
            V, Q, geom, phi, div_part=div_part, rule_degree=4
        )
        dmask = mask_u * (val_u - Ui)
        rhs_c = free_u * (L3 - assembly.mass_apply(V, geom, dmask)) + dmask
        dc = lax.custom_linear_solve(
            M_bc,
            rhs_c,
            solve=self._cg_solve(diag_c, self.correction_rtol),
            symmetric=True,
        )
        U1 = Ui + dc
        return U1, P1
