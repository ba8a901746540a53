# Box-packed 3-D projection stepper — the cavity3d / 3-D Boussinesq hot
# path (VERDICT r4 #2) built from the structured-lattice kernels
# (fem/boxpack.py): lagged BE/BDF2 rotational increment-form projection,
# exactly the architecture of navier_stokes/patchfast.py, minus everything
# the structured box makes unnecessary (no replicas -> plain dots; no
# seams; all-Dirichlet velocity walls -> no ds terms; P1 pressure stays in
# standard numbering -> ops/structured.StructuredLaplacian +
# solvers/structured_mg.StructuredHierarchy drive the Poisson solve).
#
# Discrete equations: reference flow/navier_stokes/pressure_correction.py
# :30-518 (same weak forms; patchfast.py/fast.py lineage). Equivalence vs
# the einsum FastStepper is pinned in tests/test_boxpack.py.
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fem import assembly
from ..fem.assembly import geometry
from ..fem.bc import combine_bcs
from ..fem.boxpack import BoxPack
from ..ops.structured import StructuredLaplacian
from ..solvers import krylov
from ..solvers.structured_mg import StructuredHierarchy
from .patchfast import StepStats

__all__ = ["BoxPackedStepper"]


class BoxPackedStepper:
    def __init__(
        self,
        V,
        Q,
        u_bcs,
        p_bcs,
        rho,
        mu,
        time_step_method="backward euler",
        newton_tol=0.0,
        newton_rtol=1.0e-2,
        linear_rtol=1.0e-1,
        pressure_rtol=1.0e-4,
        pressure_maxiter=600,
        correction_rtol=1.0e-5,
        cfl_target=1.0,
        dt_max=0.1,
        momentum_solver="bicgstab",
        gmres_restart=32,
        mg_smoother_degree=3,
        picard_maxiter=1,
        picard_tol=0.0,
    ):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(
                V, Q, u_bcs, p_bcs, rho, mu, time_step_method, newton_tol,
                newton_rtol, linear_rtol, pressure_rtol, pressure_maxiter,
                correction_rtol, cfl_target, dt_max, momentum_solver,
                gmres_restart, mg_smoother_degree, picard_maxiter,
                picard_tol,
            )

    def _build(
        self, V, Q, u_bcs, p_bcs, rho, mu, time_step_method, newton_tol,
        newton_rtol, linear_rtol, pressure_rtol, pressure_maxiter,
        correction_rtol, cfl_target, dt_max, momentum_solver, gmres_restart,
        mg_smoother_degree, picard_maxiter=1, picard_tol=0.0,
    ):
        import os as _os

        assert time_step_method in ("backward euler", "bdf2")
        assert not p_bcs, "box stepper: pure-Neumann pressure (cavity walls)"
        self.bdf2 = time_step_method == "bdf2"
        # picard>1: the Newton-contract mode (see patchfast.py — the lagged
        # residual at T=x IS the nonlinear residual)
        self.picard_maxiter = int(picard_maxiter)
        self.picard_tol = float(picard_tol)
        self.V_real, self.Q_real = V, Q
        mesh = V.mesh
        self.bp = bp = BoxPack(mesh)
        dtype = bp.dtype
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
        self.mom_solver = (
            _os.environ.get("FLOW_MOM_SOLVER", "") or momentum_solver
        )
        self.gmres_restart = gmres_restart

        # BC masks/values -> packed (pure permutation; no padding slots)
        mask_u, val_u = combine_bcs(V, u_bcs)

        def pack_vec(x):
            x = jnp.asarray(x, dtype=dtype)
            return jnp.concatenate(
                [bp.to_packed(x[:, c]) for c in range(3)]
            )

        self.pack_vec = pack_vec
        self.mask_u = pack_vec(mask_u)
        self.val_u = pack_vec(val_u)

        geom = geometry(mesh)
        md = assembly.mass_diag(V, geom)
        sd = assembly.stiffness_diag(V, geom)
        self.mass_diag = jnp.concatenate([bp.to_packed(md)] * 3)
        self.stiff_diag = jnp.concatenate([bp.to_packed(sd)] * 3)

        # pressure operator/preconditioner on the standard P1 grid vector
        self.K1 = StructuredLaplacian(mesh)
        self.pressure_precond = StructuredHierarchy(
            mesh, smoother_degree=mg_smoother_degree
        ).v_cycle
        self.ones_p = jnp.ones(bp.n1, dtype=dtype)

        self.step = jax.jit(self._step_impl)
        self._run_jit = jax.jit(self._run_impl, static_argnames=("n_steps",))
        self._hoist_cache = {}
        self.hoist_constants = _os.environ.get("FLOW_NO_HOIST", "") != "1"
        self.run = self._run_hoisted if self.hoist_constants else self._run_jit

    # -- state conversions -----------------------------------------------------
    def to_packed_state(self, U, P):
        return self.pack_vec(U), jnp.asarray(P, dtype=self.bp.dtype)

    def from_packed_state(self, Uf, Pf):
        bp = self.bp
        U = jnp.stack(
            [bp.from_packed(c) for c in bp.comps(Uf)], axis=-1
        )
        return U, Pf

    def zeros(self):
        bp = self.bp
        return (
            jnp.zeros(3 * bp.n2, dtype=bp.dtype),
            jnp.zeros(bp.n1, dtype=bp.dtype),
        )

    def step_api(self, Uf, Pf, dt, Ff=None):
        """One jitted step, optionally with a packed nodal body force
        (the 3-D Boussinesq buoyancy route)."""
        dt = jnp.asarray(dt, dtype=Uf.dtype)
        if Ff is None:
            return self.step(Uf, Pf, dt)
        if not hasattr(self, "_step_f"):
            self._step_f = jax.jit(
                lambda U, P, d, F: self._step_impl(U, P, d, Ff=F)
            )
        return self._step_f(Uf, Pf, dt, Ff)

    # -- inner products (no replication -> plain sums) --------------------------
    @staticmethod
    def dotv(x, y):
        return jnp.sum(x * y)

    dotp = dotv

    # -- momentum --------------------------------------------------------------
    def _mom_operator(self, Tf, dt):
        import os as _os

        bp = self.bp
        s = dt / self.rho
        if _os.environ.get("FLOW_BOX_NO_TABLES", "") == "1":
            # table-free mode: re-expand the transport inside every matvec
            # instead of holding the per-step [nq, 10, N, N, N] tables —
            # more FLOPs, no persistent residents (the N>=96 compile-OOM
            # fallback; see BENCH_NOTES r5 3-D ladder). Best-effort: XLA's
            # loop-invariant code motion may re-hoist the tables out of the
            # Krylov while_loop — verify against the HBM budget when used.
            def A(xf):
                A_tabs = bp.conv_tables(Tf)
                return bp.momentum_apply(
                    A_tabs, xf, s * self.mu, s * self.rho
                )

            return A
        A_tabs = bp.conv_tables(Tf)

        def A(xf):
            return bp.momentum_apply(A_tabs, xf, s * self.mu, s * self.rho)

        return A

    def _mom_rhs(self, Uf, Pf, dt, Ff=None):
        bp = self.bp
        s = dt / self.rho
        r = bp.mass_apply_vec(Uf if Ff is None else Uf + s * Ff)
        return r + s * bp.pressure_grad_rhs(Pf)

    def _mom_krylov(self, A, b, M, rtol, atol):
        if self.mom_solver == "gmres":
            return krylov.gmres(
                A, b, M=M, rtol=rtol, atol=atol, maxiter=300,
                restart=self.gmres_restart,
            )
        return krylov.bicgstab(
            A, b, M=M, rtol=rtol, atol=atol, maxiter=300, dot=self.dotv
        )

    # -- BDF2 via the u_hat trick (patchfast lineage) ---------------------------
    @staticmethod
    def _bdf2_hat(U, Um1, dt, dtp):
        r = dt / dtp
        uhat = ((1.0 + r) ** 2 * U - r * r * Um1) / (1.0 + 2.0 * r)
        dt_eff = dt * (1.0 + r) / (1.0 + 2.0 * r)
        return uhat, dt_eff, r

    def _step_impl_bdf2(self, Uf, Um1, Pf, dt, dtp, Ff=None):
        uhat, dt_eff, r = self._bdf2_hat(Uf, Um1, dt, dtp)
        x0 = (1.0 + r) * Uf - r * Um1
        return self._step_impl(uhat, Pf, dt_eff, transport=x0, Ff=Ff)

    # -- one projection step ----------------------------------------------------
    def _step_impl(self, Uf, Pf, dt, transport=None, Ff=None):
        rho, mu = self.rho, self.mu
        free = 1.0 - self.mask_u
        x0 = free * (Uf if transport is None else transport) \
            + self.mask_u * self.val_u
        rhs = self._mom_rhs(Uf, Pf, dt, Ff=Ff)
        diag = self.mass_diag + (dt / rho) * (2.0 * mu) * self.stiff_diag
        diag = free * diag + self.mask_u

        def residual_and_solve(x, rtol, atol):
            A_raw = self._mom_operator(x, dt)

            def A_bc(v):
                return free * A_raw(v) + self.mask_u * v

            r = free * (A_raw(x) - rhs) + self.mask_u * (x - self.val_u)
            dx, sinfo = self._mom_krylov(
                A_bc, -r, lambda t: t / diag, rtol, atol
            )
            return x + dx, sinfo

        if self.picard_maxiter <= 1:
            Ui, sinfo = residual_and_solve(
                x0, self.newton_rtol,
                0.05 * self.newton_tol if self.newton_tol else 0.0,
            )
            nres = sinfo.resnorm
            n_nonlin = jnp.array(1)
            lin_iters = sinfo.iters
        else:
            tol = self.picard_tol

            def res_norm(x):
                A_raw = self._mom_operator(x, dt)
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

            Ui, nres, n_nonlin, lin_iters = jax.lax.while_loop(
                cond, body, (x0, res_norm(x0), jnp.array(0), jnp.array(0))
            )

        P1, pinfo = self._pressure_solve(Ui, Pf, dt)
        U1, cinfo = self._correction(Ui, P1, Pf, dt)
        return U1, P1, StepStats(
            n_nonlin, nres, lin_iters, pinfo.iters,
            cinfo.iters, pinfo.converged, cinfo.converged,
        )

    # -- substep 2: pressure Poisson (increment form, rotational) ---------------
    def _pressure_solve(self, Ui, Pf, dt):
        bp = self.bp
        L2 = -(self.rho / dt) * bp.div_rhs(Ui) - self.mu * bp.grad_div_rhs(Ui)
        phi, sinfo = krylov.cg(
            self.K1, L2, M=self.pressure_precond,
            rtol=self.pressure_rtol, maxiter=self.pressure_maxiter,
            nullspace=[self.ones_p], dot=self.dotp,
        )
        return Pf + phi, sinfo

    def _pressure_solve_mg(self, Ui, Pf, dt):
        P1, sinfo = self._pressure_solve(Ui, Pf, dt)
        return P1, sinfo.iters

    def bench_residual(self, x, Uf, Pf, dt):
        free = 1.0 - self.mask_u
        A_raw = self._mom_operator(x, dt)
        rhs = self._mom_rhs(Uf, Pf, dt)
        return free * (A_raw(x) - rhs) + self.mask_u * (x - self.val_u)

    # -- substep 3: velocity correction (increment form, rotational) ------------
    def _correction(self, Ui, P1, Pf, dt):
        bp = self.bp
        phi = P1 - Pf
        div_part = bp.grad_div_cell(Ui)
        free = 1.0 - self.mask_u

        def M_bc(u):
            return free * bp.mass_apply_vec(free * u) + self.mask_u * u

        diag = free * self.mass_diag + self.mask_u
        L3 = -(dt / self.rho) * bp.grad_phi_rhs(
            phi, div_part=div_part, mu=self.mu
        )
        dmask = self.mask_u * (self.val_u - Ui)
        rhs = free * (L3 - bp.mass_apply_vec(dmask)) + dmask
        d, sinfo = krylov.cg(
            M_bc, rhs, M=lambda r: r / diag, rtol=self.correction_rtol,
            maxiter=500, dot=self.dotv,
        )
        return Ui + d, sinfo

    # -- fused scan loop (hoisted like patchfast) --------------------------------
    def _run_hoisted(self, Uf, Pf, dt0, n_steps, Um1=None, dtp0=None):
        from ..utils.hoist import HoistedFunction

        opt = {"Um1": Um1, "dtp0": dtp0}
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

    def _run_impl(self, Uf, Pf, dt0, n_steps, Um1=None, dtp0=None):
        bp = self.bp
        dt_cap = jnp.asarray(self.dt_max, dtype=Uf.dtype)
        cfl = jnp.asarray(self.cfl_target, dtype=Uf.dtype)
        if self.bdf2:
            return self._run_impl_bdf2(
                Uf, Pf, dt0, n_steps, Um1, dtp0, dt_cap, cfl
            )

        def body(carry, _):
            Uf, Pf, dt, t = carry
            U1, P1, stats = self._step_impl(Uf, Pf, dt)
            t = t + dt
            cs = bp.comps(U1)
            umax = jnp.sqrt(jnp.max(cs[0] ** 2 + cs[1] ** 2 + cs[2] ** 2))
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
            return (U1, P1, dt_new, t), out

        t0 = jnp.asarray(0.0, dtype=Uf.dtype)
        dt0 = jnp.asarray(dt0, dtype=Uf.dtype)
        (Uf, Pf, dt, t), telemetry = jax.lax.scan(
            body, (Uf, Pf, dt0, t0), None, length=n_steps
        )
        return Uf, Pf, dt, telemetry

    def _run_impl_bdf2(self, Uf, Pf, dt0, n_steps, Um1, dtp0, dt_cap, cfl):
        bp = self.bp
        if Um1 is None:
            Um1 = Uf
        dt0 = jnp.asarray(dt0, dtype=Uf.dtype)
        dtp0 = dt0 if dtp0 is None else jnp.asarray(dtp0, dtype=Uf.dtype)

        def body(carry, _):
            Uf, Um1, Pf, dt, dtp, t = carry
            U1, P1, stats = self._step_impl_bdf2(Uf, Um1, Pf, dt, dtp)
            t = t + dt
            cs = bp.comps(U1)
            umax = jnp.sqrt(jnp.max(cs[0] ** 2 + cs[1] ** 2 + cs[2] ** 2))
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
            return (U1, Uf, P1, dt_new, dt, t), out

        t0 = jnp.asarray(0.0, dtype=Uf.dtype)
        (Uf, Um1, Pf, dt, dtp, t), telemetry = jax.lax.scan(
            body, (Uf, Um1, Pf, dt0, dtp0, t0), None, length=n_steps
        )
        return Uf, Pf, dt, telemetry
