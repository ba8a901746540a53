# The packed-patch projection stepper: the benchmark hot path (lagged
# backward-Euler rotational projection with increment-form solves) built
# entirely from the lane-packed patch kernels (fem/patchpack.py).
#
# Scope: exactly the bench configuration the north star measures —
#   * semi-implicit ("lagged") convection: ONE affine momentum solve per
#     step (adopted bench default since r3 chain-7, physics-guarded),
#   * backward-Euler theta (BDF2 chains through the same machinery as
#     FastStepper, via the u_hat trick),
#   * rotational incremental pressure correction, increment-form solves
#     (the round-3 shedding fix),
#   * MG-preconditioned pressure CG, Jacobi momentum GMRES/BiCGStab,
#   * fused lax.scan time loop with the on-device CFL controller.
# The general engine (Newton, Crank-Nicolson, body forces, 3-D, window
# kernels...) stays in navier_stokes/fast.py; this class trades generality
# for the memory layout the TPU wants. Equivalence vs FastStepper is pinned
# in tests/test_patchfast.py.
#
# Discrete equations: reference flow/navier_stokes/pressure_correction.py
# :30-518 (same weak forms; see fast.py and patchctx.py for the lineage).
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fem import assembly
from ..fem.assembly import BoundaryTab, geometry
from ..fem.bc import combine_bcs
from ..fem.patch import PatchInfo
from ..fem.patchpack import (
    PackedPatch,
    PackedBoundary,
    PackedPatchP1Hierarchy,
)
from ..solvers import krylov

__all__ = ["PackedPatchStepper"]


class StepStats(NamedTuple):
    newton_iters: jnp.ndarray
    newton_res: jnp.ndarray
    linear_iters: jnp.ndarray
    pressure_iters: jnp.ndarray
    correction_iters: jnp.ndarray
    # convergence flags (public-API RuntimeError semantics, reference
    # error_on_nonconvergence — pressure_correction.py:568-603)
    pressure_converged: jnp.ndarray = jnp.array(True)
    correction_converged: jnp.ndarray = jnp.array(True)


class PackedPatchStepper:
    def __init__(
        self,
        V,
        Q,
        u_bcs,
        p_bcs,
        rho,
        mu,
        info: PatchInfo,
        time_step_method="backward euler",
        newton_tol=0.0,
        newton_rtol=1.0e-2,
        linear_rtol=1.0e-1,
        pressure_rtol=3.0e-4,
        pressure_maxiter=600,
        correction_rtol=1.0e-4,
        cfl_target=1.0,
        dt_max=1.0,
        momentum_solver="gmres",
        gmres_restart=32,
        mg_smoother_degree=3,
        forces_probe=None,
        hoist_constants=True,
        rotational_form=True,
        picard_maxiter=1,
        picard_tol=0.0,
    ):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(
                V, Q, u_bcs, p_bcs, rho, mu, info, time_step_method,
                newton_tol, newton_rtol, linear_rtol, pressure_rtol,
                pressure_maxiter, correction_rtol, cfl_target, dt_max,
                momentum_solver, gmres_restart, mg_smoother_degree,
                forces_probe, hoist_constants, rotational_form,
                picard_maxiter, picard_tol,
            )

    def _build(
        self, V, Q, u_bcs, p_bcs, rho, mu, info, time_step_method,
        newton_tol, newton_rtol, linear_rtol, pressure_rtol,
        pressure_maxiter, correction_rtol, cfl_target, dt_max,
        momentum_solver, gmres_restart, mg_smoother_degree, forces_probe,
        hoist_constants, rotational_form=True, picard_maxiter=1,
        picard_tol=0.0,
    ):
        import os as _os

        assert time_step_method in ("backward euler", "bdf2")
        self.bdf2 = time_step_method == "bdf2"
        # rotational_form=False: plain incremental (IPCS) update — no
        # grad(div u*) terms in the pressure rhs / correction
        self.rotational = bool(rotational_form)
        # picard_maxiter>1: refreeze the lagged transport at each iterate
        # until the ABS momentum residual <= picard_tol — the fixed point of
        # the lagged (Picard) linearization solves the same nonlinear
        # momentum equation as the public Newton path to the same contract
        # (the lagged residual at T=x IS the nonlinear residual: the skew
        # convection is bilinear in (T, x))
        self.picard_maxiter = int(picard_maxiter)
        self.picard_tol = float(picard_tol)
        self.V_real, self.Q_real = V, Q
        mesh = V.mesh
        self.pp = pp = PackedPatch(info)
        dtype = pp.dtype
        self.rho, self.mu = float(rho), float(mu)
        self.hmax = mesh.hmax
        self.newton_tol = newton_tol
        self.newton_rtol = newton_rtol
        self.linear_rtol = linear_rtol
        self.pressure_rtol = pressure_rtol
        self.pressure_maxiter = pressure_maxiter
        self.correction_rtol = correction_rtol
        self.cfl_target = cfl_target
        self.dt_max = dt_max
        self.mom_solver = _os.environ.get("FLOW_MOM_SOLVER", "") or momentum_solver
        self.gmres_restart = gmres_restart
        self.forces_probe = forces_probe

        # BC masks/values -> packed, padding pinned as Dirichlet-0 rows
        mask_u, val_u = combine_bcs(V, u_bcs)
        self.has_p_bcs = bool(p_bcs)
        n2 = pp.n2

        def pack_vec(x, pad_val=0.0):
            a = pp.lay2.to_packed(x[:, 0])
            b = pp.lay2.to_packed(x[:, 1])
            if pad_val:
                inv = 1.0 - pp.lay2.valid_j
                a = a + pad_val * inv
                b = b + pad_val * inv
            return jnp.concatenate([a, b])

        self.pack_vec = pack_vec
        self.mask_u = pack_vec(mask_u, pad_val=1.0)
        self.val_u = pack_vec(val_u)
        if self.has_p_bcs:
            mask_p, val_p = combine_bcs(Q, p_bcs)
            self.mask_p = pp.lay1.to_packed(mask_p) + (1.0 - pp.lay1.valid_j)
            self.val_p = pp.lay1.to_packed(val_p)
        else:
            self.mask_p = 1.0 - pp.lay1.valid_j
            self.val_p = jnp.zeros(pp.n1, dtype=dtype)

        # Jacobi diagonals (global -> packed; exact one-time setup)
        geom = geometry(mesh)
        md = assembly.mass_diag(V, geom)
        sd = assembly.stiffness_diag(V, geom)
        self.mass_diag = jnp.concatenate(
            [pp.lay2.to_packed(md)] * 2
        )
        self.stiff_diag = jnp.concatenate([pp.lay2.to_packed(sd)] * 2)
        dq = assembly.stiffness_diag(Q, geom)
        dq = pp.lay1.to_packed(dq)
        self.stiff_diag_Q = jnp.where(dq > 0, dq, 1.0)

        # boundary tabs (ds-terms; O(surface))
        self.bt = PackedBoundary(BoundaryTab(V, rule_degree=6), pp.lay2, geom)
        self.btQ = PackedBoundary(BoundaryTab(Q, rule_degree=6), pp.lay1, geom)

        # pressure MG preconditioner
        self.pressure_precond = PackedPatchP1Hierarchy(
            info,
            bc_mask=self.mask_p if self.has_p_bcs else None,
            smoother_degree=mg_smoother_degree,
            dtype=dtype,
        ).v_cycle

        # weighted-metric machinery (replicated layout)
        w1 = pp.lay1.weight_j
        w2 = pp.lay2.weight_j
        self.wvec = jnp.concatenate([w2, w2])
        self._sqrtw = jnp.sqrt(jnp.where(self.wvec > 0, self.wvec, 1.0))
        self.w1 = w1

        self.step = jax.jit(self._step_impl)
        # body-force variant (public-API route, navier_stokes/packedapi.py)
        self._step_f = jax.jit(
            lambda Uf, Pf, dt, Ff: self._step_impl(Uf, Pf, dt, Ff=Ff)
        )
        self._hoist_cache = {}
        self.hoist_constants = (
            hoist_constants and _os.environ.get("FLOW_NO_HOIST", "") != "1"
        )
        self._run_jit = jax.jit(self._run_impl, static_argnames=("n_steps",))
        self.run = self._run_hoisted if self.hoist_constants else self._run_jit

    # -- inner products -------------------------------------------------------
    def dotv(self, x, y):
        return jnp.sum(self.wvec * x * y)

    def dotp(self, x, y):
        return jnp.sum(self.w1 * x * y)

    # -- state conversions ----------------------------------------------------
    def to_packed_state(self, U, P):
        return self.pack_vec(U), self.pp.lay1.to_packed(P)

    def from_packed_state(self, Uf, Pf):
        a, b = self.pp.comps(Uf)
        U = jnp.stack(
            [self.pp.lay2.from_packed(a), self.pp.lay2.from_packed(b)], -1
        )
        return U, self.pp.lay1.from_packed(Pf)

    def zeros(self):
        pp = self.pp
        return (
            jnp.zeros(2 * pp.n2, dtype=pp.dtype),
            jnp.zeros(pp.n1, dtype=pp.dtype),
        )

    def step_api(self, Uf, Pf, dt, Ff=None):
        """One jitted step, optionally with a packed nodal body force."""
        dt = jnp.asarray(dt, dtype=Uf.dtype)
        if Ff is None:
            return self.step(Uf, Pf, dt)
        return self._step_f(Uf, Pf, dt, Ff)

    # -- momentum operator (lagged, affine) -----------------------------------
    def _mom_operator(self, Tf, dt):
        """(A, rhs_P_part): the full lagged tangent x -> A x (volume EMA +
        ds tangents) at frozen transport Tf, and the transport-dependent
        do-nothing factor reused by the residual build."""
        pp, bt = self.pp, self.bt
        rho, mu = self.rho, self.mu
        s = dt / rho
        S = pp.ema_S(Tf, s * mu, s * rho)
        tb = bt.values_vec(Tf)
        tn = jnp.einsum("bqm,bm->bq", tb, bt.normals)
        tnp_ = jnp.maximum(tn, 0.0)

        def A(xf):
            av = pp.ema_volume_apply(S, xf, s * mu)
            # ds tangents: mu (grad x)^T n (linear) and the directional
            # do-nothing -(rho/2)(T.n)+ x (frozen transport)
            gw = bt.grads_vec(xf)
            val = mu * jnp.einsum("bqma,bm->bqa", gw, bt.normals)
            wb = bt.values_vec(xf)
            val = val - 0.5 * rho * tnp_[:, :, None] * wb
            return av - s * bt.integrate_rhs_vec(val)

        return A, S

    def _mom_rhs(self, Uf, Pf, dt, Ff=None):
        """rhs of the affine momentum system: M u0 + s [pg(P) + bnd_P(P)
        + F], F the body-force functional. Ff is the NODAL P2 vector field
        f (e.g. Boussinesq buoyancy rho(theta) g) in packed layout; the
        force functional of its interpolant is exactly M Ff — identical to
        the einsum path's quadrature integral of the same interpolant
        (reference body force, pressure_correction.py:172 / flow/
        navier_stokes/pressure_correction.py:134-144)."""
        pp, bt, btQ = self.pp, self.bt, self.btQ
        s = dt / self.rho
        r = pp.mass_apply_vec(Uf if Ff is None else Uf + s * Ff)
        r = r + s * pp.pressure_grad_rhs(Pf)
        p0b = btQ.values_scalar(Pf)  # [nb, q]
        val = -p0b[:, :, None] * bt.normals[:, None, :]
        return r + s * bt.integrate_rhs_vec(val)

    def _mom_krylov(self, A, b, M, rtol, atol):
        if self.mom_solver == "gmres":
            sw = self._sqrtw

            def A2(v):
                return sw * A(v / sw)

            def M2(v):
                return sw * M(v / sw)

            x2, sinfo = krylov.gmres(
                A2, sw * b, M=M2, rtol=rtol, atol=atol, maxiter=300,
                restart=self.gmres_restart,
            )
            return x2 / sw, sinfo
        return krylov.bicgstab(
            A, b, M=M, rtol=rtol, atol=atol, maxiter=300, dot=self.dotv
        )

    # -- BDF2 as backward Euler from a modified state (fast.py lineage) -------
    @staticmethod
    def _bdf2_hat(U, Um1, dt, dtp):
        r = dt / dtp
        uhat = ((1.0 + r) ** 2 * U - r * r * Um1) / (1.0 + 2.0 * r)
        dt_eff = dt * (1.0 + r) / (1.0 + 2.0 * r)
        return uhat, dt_eff, r

    def _step_impl_bdf2(self, Uf, Um1, Pf, dt, dtp, Ff=None):
        uhat, dt_eff, r = self._bdf2_hat(Uf, Um1, dt, dtp)
        # second-order extrapolated transport (the lagged linearization's
        # BDF2-consistent frozen field)
        x0 = (1.0 + r) * Uf - r * Um1
        return self._step_impl(uhat, Pf, dt_eff, transport=x0, Ff=Ff)

    # -- one projection step --------------------------------------------------
    def _step_impl(self, Uf, Pf, dt, transport=None, Ff=None):
        pp = self.pp
        rho, mu = self.rho, self.mu
        free = 1.0 - self.mask_u
        x0 = free * (Uf if transport is None else transport) \
            + self.mask_u * self.val_u
        rhs = self._mom_rhs(Uf, Pf, dt, Ff=Ff)
        diag = self.mass_diag + (dt / rho) * (2.0 * mu) * self.stiff_diag
        diag = free * diag + self.mask_u

        def residual_and_solve(x, rtol, atol):
            A_raw, _ = self._mom_operator(x, dt)

            def A_bc(v):
                return free * A_raw(v) + self.mask_u * v

            r = free * (A_raw(x) - rhs) + self.mask_u * (x - self.val_u)
            dx, sinfo = self._mom_krylov(
                A_bc, -r, lambda t: t / diag, rtol, atol
            )
            return x + dx, sinfo

        if self.picard_maxiter <= 1:
            # bench path: ONE affine (lagged) solve, unchanged
            Ui, sinfo = residual_and_solve(
                x0, self.newton_rtol,
                0.05 * self.newton_tol if self.newton_tol else 0.0,
            )
            nres = sinfo.resnorm
            n_nonlin = jnp.array(1)
            lin_iters = sinfo.iters
        else:
            # Picard to the Newton contract: iterate the lagged solve with
            # the transport refrozen at the current iterate until the ABS
            # nonlinear residual <= picard_tol (reference Newton
            # error_on_nonconvergence semantics, tol checked by the caller)
            tol = self.picard_tol

            def res_norm(x):
                A_raw, _ = self._mom_operator(x, dt)
                r = free * (A_raw(x) - rhs) + self.mask_u * (x - self.val_u)
                return jnp.sqrt(self.dotv(r, r))

            def cond(c):
                _, rn, k, _ = c
                return (rn > tol) & (k < self.picard_maxiter)

            def body(c):
                x, rn, k, li = c
                x1, sinfo = residual_and_solve(
                    x, self.linear_rtol, 0.05 * tol
                )
                return (x1, res_norm(x1), k + 1, li + sinfo.iters)

            rn0 = res_norm(x0)
            Ui, nres, n_nonlin, lin_iters = jax.lax.while_loop(
                cond, body, (x0, rn0, jnp.array(0), jnp.array(0))
            )

        P1, pinfo = self._pressure_solve(Ui, Pf, dt)
        U1, cinfo = self._correction(Ui, P1, Pf, dt)
        return U1, P1, StepStats(
            n_nonlin, nres, lin_iters, pinfo.iters, cinfo.iters,
            pinfo.converged, cinfo.converged,
        )

    # -- substep 2: pressure Poisson (increment form; rotational opt.) --------
    def _pressure_solve(self, Ui, Pf, dt):
        pp = self.pp
        L2 = -(self.rho / dt) * pp.div_rhs(Ui)
        if self.rotational:
            L2 = L2 - self.mu * pp.grad_div_rhs(Ui)
        mask, gvals = self.mask_p, self.val_p
        free = 1.0 - mask

        def K_raw(p):
            return pp.p1_stiffness_apply(p)

        if self.has_p_bcs:

            def K_bc(p):
                return free * K_raw(free * p) + mask * p

            pin = mask * (gvals - Pf)
            rhs = free * (L2 - K_raw(pin)) + pin
            phi, sinfo = krylov.cg(
                K_bc, rhs, M=self.pressure_precond,
                rtol=self.pressure_rtol, maxiter=self.pressure_maxiter,
                dot=self.dotp,
            )
        else:
            ones = pp.lay1.valid_j
            phi, sinfo = krylov.cg(
                K_raw, L2, M=self.pressure_precond,
                rtol=self.pressure_rtol, maxiter=self.pressure_maxiter,
                nullspace=[ones], dot=self.dotp,
            )
        return Pf + phi, sinfo

    # bench axis aliases (bench.py poisson/assembly axes)
    def _pressure_solve_mg(self, Ui, Pf, dt):
        P1, sinfo = self._pressure_solve(Ui, Pf, dt)
        return P1, sinfo.iters

    def bench_residual(self, x, Uf, Pf, dt):
        """One full momentum residual evaluation (operator apply + rhs) —
        the packed twin of ctx._residual for the assembly GDoF/s axis."""
        free = 1.0 - self.mask_u
        A_raw, _ = self._mom_operator(x, dt)
        rhs = self._mom_rhs(Uf, Pf, dt)
        return free * (A_raw(x) - rhs) + self.mask_u * (x - self.val_u)

    # -- substep 3: velocity correction (increment form; rotational opt.) -----
    def _correction(self, Ui, P1, Pf, dt):
        pp = self.pp
        phi = P1 - Pf
        div_part = pp.grad_div_cell(Ui) if self.rotational else None
        free = 1.0 - self.mask_u

        def M_bc(u):
            return free * pp.mass_apply_vec(free * u) + self.mask_u * u

        diag = free * self.mass_diag + self.mask_u
        L3 = -(dt / self.rho) * pp.grad_phi_rhs(
            phi, div_part=div_part, mu=self.mu
        )
        dmask = self.mask_u * (self.val_u - Ui)
        rhs = free * (L3 - pp.mass_apply_vec(dmask)) + dmask
        d, sinfo = krylov.cg(
            M_bc, rhs, M=lambda r: r / diag, rtol=self.correction_rtol,
            maxiter=500, dot=self.dotv,
        )
        return Ui + d, sinfo

    # -- fused scan loop ------------------------------------------------------
    def _run_hoisted(
        self, Uf, Pf, dt0, n_steps, Um1=None, dtp0=None, dt_max=None,
        cfl_target=None,
    ):
        from ..utils.hoist import HoistedFunction

        opt = {
            "Um1": Um1, "dtp0": dtp0, "dt_max": dt_max,
            "cfl_target": cfl_target,
        }
        names = tuple(k for k, v in opt.items() if v is not None)
        args = (Uf, Pf, dt0) + tuple(opt[k] for k in names)
        sig = tuple(
            (jnp.shape(a), str(jnp.result_type(a)))
            for a in jax.tree.leaves(args)
        )
        key = (n_steps, names, sig)
        hf = self._hoist_cache.get(key)
        if hf is None:

            def g(Uf, Pf, dt0, *rest):
                return self._run_impl(
                    Uf, Pf, dt0, n_steps, **dict(zip(names, rest))
                )

            hf = HoistedFunction(g, args)
            self._hoist_cache[key] = hf
        return hf(*args)

    def _run_impl(
        self, Uf, Pf, dt0, n_steps, Um1=None, dtp0=None, dt_max=None,
        cfl_target=None,
    ):
        pp = self.pp
        dt_cap = jnp.asarray(
            self.dt_max if dt_max is None else dt_max, dtype=Uf.dtype
        )
        cfl = jnp.asarray(
            self.cfl_target if cfl_target is None else cfl_target,
            dtype=Uf.dtype,
        )
        if self.bdf2:
            return self._run_impl_bdf2(
                Uf, Pf, dt0, n_steps, Um1, dtp0, dt_cap, cfl
            )

        def body(carry, _):
            Uf, Pf, dt, t = carry
            U1, P1, stats = self._step_impl(Uf, Pf, dt)
            t = t + dt
            a, b = pp.comps(U1)
            umax = jnp.sqrt(jnp.max(a * a + b * b))
            target_dt = cfl * self.hmax / jnp.maximum(umax, 1e-30)
            dt_new = jnp.minimum(
                dt_cap,
                dt * jnp.minimum(2.0, 1.0 + 0.5 * (target_dt - dt) / dt),
            )
            out = {
                "t": t,
                "dt": dt,
                "newton_iters": stats.newton_iters,
                "linear_iters": stats.linear_iters,
                "pressure_iters": stats.pressure_iters,
                "correction_iters": stats.correction_iters,
            }
            if self.forces_probe is not None:
                Ug, Pg = self.from_packed_state(U1, P1)
                if getattr(self.forces_probe, "needs_history", False):
                    Upg, _ = self.from_packed_state(Uf, Pf)
                    out["forces"] = self.forces_probe(Ug, Pg, Upg, dt)
                else:
                    out["forces"] = self.forces_probe(Ug, Pg)
            return (U1, P1, dt_new, t), out

        t0 = jnp.asarray(0.0, dtype=Uf.dtype)
        dt0 = jnp.asarray(dt0, dtype=Uf.dtype)
        (Uf, Pf, dt, t), telemetry = jax.lax.scan(
            body, (Uf, Pf, dt0, t0), None, length=n_steps
        )
        return Uf, Pf, dt, telemetry

    def _run_impl_bdf2(self, Uf, Pf, dt0, n_steps, Um1, dtp0, dt_cap, cfl):
        pp = self.pp
        if Um1 is None:
            Um1 = Uf
        dt0 = jnp.asarray(dt0, dtype=Uf.dtype)
        dtp0 = dt0 if dtp0 is None else jnp.asarray(dtp0, dtype=Uf.dtype)

        def body(carry, _):
            Uf, Um1, Pf, dt, dtp, t = carry
            U1, P1, stats = self._step_impl_bdf2(Uf, Um1, Pf, dt, dtp)
            t = t + dt
            a, b = pp.comps(U1)
            umax = jnp.sqrt(jnp.max(a * a + b * b))
            target_dt = cfl * self.hmax / jnp.maximum(umax, 1e-30)
            dt_new = jnp.minimum(
                dt_cap,
                dt * jnp.minimum(2.0, 1.0 + 0.5 * (target_dt - dt) / dt),
            )
            out = {
                "t": t,
                "dt": dt,
                "newton_iters": stats.newton_iters,
                "linear_iters": stats.linear_iters,
                "pressure_iters": stats.pressure_iters,
                "correction_iters": stats.correction_iters,
            }
            if self.forces_probe is not None:
                Ug, Pg = self.from_packed_state(U1, P1)
                if getattr(self.forces_probe, "needs_history", False):
                    # (u_hat, dt_eff): (U1 - u_hat)/dt_eff is exactly the
                    # variable-step BDF2 derivative (fast.py lineage)
                    uhat, dt_eff, _ = self._bdf2_hat(Uf, Um1, dt, dtp)
                    uhg, _ = self.from_packed_state(uhat, Pf)
                    out["forces"] = self.forces_probe(Ug, Pg, uhg, dt_eff)
                else:
                    out["forces"] = self.forces_probe(Ug, Pg)
            return (U1, Uf, P1, dt_new, dt, t), out

        t0 = jnp.asarray(0.0, dtype=Uf.dtype)
        (Uf, Um1, Pf, dt, dtp, t), telemetry = jax.lax.scan(
            body, (Uf, Um1, Pf, dt0, dtp0, t0), None, length=n_steps
        )
        return Uf, Pf, dt, telemetry, (Um1, dtp)
