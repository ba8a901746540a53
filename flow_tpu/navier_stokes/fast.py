# The performance path: one fully-fused, jit-compiled projection step and a
# lax.scan time loop with on-device adaptive dt — zero host synchronization
# per step.
#
# This is where the TPU-native design departs hardest from the reference: in
# FEniCS each substep crosses Python -> FFC-JIT C++ -> PETSc and back
# (SURVEY.md §3.1 "process/device boundaries"); here the *entire* time step —
# Newton on the tentative velocity, pressure Poisson, velocity correction,
# CFL dt controller, force probes — is a single XLA program. Host code only
# sees the final state and per-step telemetry arrays.
#
# Same discrete equations as pressure_correction._step (they share the
# _Context assembly code); tolerances/iteration caps are configurable because
# the benchmark path runs f32 (SURVEY.md §7 hard part #4).
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import assembly, forms
from ..fem.spaces import FunctionSpace
from ..fem.bc import combine_bcs
from ..solvers import krylov
from .pressure_correction import _get_ctx, CONV_RULE

__all__ = ["FastStepper"]


class StepStats(NamedTuple):
    newton_iters: jnp.ndarray
    newton_res: jnp.ndarray
    linear_iters: jnp.ndarray  # total BiCGStab iterations across Newton
    pressure_iters: jnp.ndarray
    correction_iters: jnp.ndarray


class FastStepper:
    """Compiled projection stepper bound to (spaces, BCs, material constants).

    step(U, P, dt)        -> (U1, P1, stats)        [one jitted call]
    run(U, P, dt0, n)     -> (U, P, dt, telemetry)  [lax.scan over n steps,
                              CFL-adaptive dt computed on device]
    """

    def __init__(
        self,
        V: FunctionSpace,
        Q: FunctionSpace,
        u_bcs,
        p_bcs,
        rho,
        mu,
        time_step_method="backward euler",
        rotational_form=True,
        newton_tol=1.0e-10,
        newton_rtol=0.0,
        newton_maxiter=10,
        linear_rtol=1.0e-7,
        ew_forcing=False,
        pressure_rtol=1.0e-10,
        pressure_maxiter=1000,
        pressure_precond=None,
        correction_rtol=1.0e-10,
        cfl_target=1.0,
        dt_max=1.0,
        forces_probe=None,
        divergence_probe=False,
        assembled_jacobian="auto",
        hoist_constants=True,
        momentum_precond=None,
        packed="auto",
        convection="newton",
        momentum_solver="bicgstab",
        patches=None,
    ):
        # setup work (context diagonals, BC masks, ELL assembly) runs on the
        # host CPU backend — see utils/hostsetup.py
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build_setup(
                V, Q, u_bcs, p_bcs, rho, mu, time_step_method,
                rotational_form, newton_tol, newton_rtol, newton_maxiter,
                linear_rtol, ew_forcing, pressure_rtol, pressure_maxiter,
                pressure_precond, correction_rtol, cfl_target, dt_max,
                forces_probe, divergence_probe, assembled_jacobian,
                hoist_constants, momentum_precond, packed, convection,
                momentum_solver, patches,
            )

    def _build_setup(
        self, V, Q, u_bcs, p_bcs, rho, mu, time_step_method,
        rotational_form, newton_tol, newton_rtol, newton_maxiter,
        linear_rtol, ew_forcing, pressure_rtol, pressure_maxiter,
        pressure_precond, correction_rtol, cfl_target, dt_max,
        forces_probe, divergence_probe, assembled_jacobian,
        hoist_constants=True, momentum_precond=None, packed="auto",
        convection="newton", momentum_solver="bicgstab", patches=None,
    ):
        import os as _os0

        # tangent storage policy for granular Newton (see _gran_newton_iter)
        self.tangent_mode = _os0.environ.get("FLOW_TANGENT_MODE", "linearize")
        # granular lagged-linear fast path (see _gran_lagged_solve)
        self.gran_linfast = _os0.environ.get("FLOW_GRAN_LINFAST", "1") == "1"
        # extrapolated warm start for the granular lagged momentum solve
        # (FLOW_MOM_WARMSTART=1, opt-in): seed the solve with the previous
        # step's momentum increment scaled by dt/dt_prev. The outer stopping
        # target stays relative to the TRUE initial residual at U (computed
        # in the setup execution regardless), so the converged answer and
        # the physics are unchanged — only the Krylov iteration count moves.
        self.mom_warmstart = (
            _os0.environ.get("FLOW_MOM_WARMSTART", "") == "1"
        )
        self._ws_prev = None  # (x_solution, U_at_solve, float(dt)) host refs
        # increment-form pressure/correction solves (default ON; see
        # _pressure_solve_mg docstring); FLOW_ABS_SOLVES=1 for A/B
        self.increment_form = _os0.environ.get("FLOW_ABS_SOLVES", "") != "1"
        # semi-implicit ("lagged") convection: transport the implicit skew
        # convection with u^n (theta methods) / the second-order
        # extrapolation (BDF2) — one LINEAR momentum solve per step instead
        # of a Newton loop (classic IPCS/SBDF2 linearization; O(dt) local
        # consistency for BE, O(dt^2) for BDF2, same formal scheme orders)
        assert convection in ("newton", "lagged"), convection
        self.lagged = convection == "lagged"
        # gather-free window kernel for the momentum matvec — the lagged
        # operator or the full Newton tangent with reaction term
        # (fem/winmom.py; FLOW_WINKERNEL=1 enables — measured on TPU before
        # any default flip, see BENCH_NOTES)
        self.winkernel = _os0.environ.get("FLOW_WINKERNEL", "") == "1"
        if self.winkernel:
            from ..utils.winguard import winkernel_size_ok

            self.winkernel = winkernel_size_ok(V.n_dofs, "momentum winkernel")
        self._winmom = None
        # patch-contiguous layout mode (fem/patch.py — the gather-free
        # operator backend over coarse+refine^k hierarchies): state lives as
        # patch-flat replicated vectors, gathers/dof-sums become window
        # slices/overlap-adds, and Krylov runs with the replica-weighted
        # inner product (iterate-for-iterate the un-replicated algorithm).
        self.V_real, self.Q_real = V, Q
        self.patch = patches is not None
        if self.patch:
            from .patchctx import PatchNSContext

            assert not self.winkernel, "patch mode supersedes winkernel"
            assert momentum_precond is None, (
                "patch mode: vertex momentum preconditioner not wired"
            )
            self.ctx = PatchNSContext(patches, V, Q)
            V, Q = self.ctx.V, self.ctx.Q
            self.V, self.Q = V, Q
            packed = False
        else:
            self.V, self.Q = V, Q
            self.ctx = _get_ctx(V, Q)
        self._pdot = self.ctx.dot if self.patch else None
        self._sqrtw_V = None
        if self.patch:
            # sqrt of the replica weight (1 on padding): conjugating the
            # momentum operator by it turns PLAIN GMRES into the exact
            # weighted-metric GMRES (batched MGS stays one clean matmul;
            # mixing a weighted dot into only part of the Arnoldi breaks
            # the Hessenberg relation — measured 5 -> 96 iterations)
            w = self.V._weight
            w = jnp.where(w > 0, w, 1.0)
            self._sqrtw_V = jnp.sqrt(w)[:, None]
        if self.winkernel:
            import jax as _jax

            from ..attic.winmom import WindowLaggedMomentum

            self._winmom = WindowLaggedMomentum(
                # S=None auto-sizes windows from the RCM bandwidth
                # (FLOW_WINKERNEL_S=<n> pins it)
                V, S=int(_os0.environ.get("FLOW_WINKERNEL_S", "0")) or None,
                interpret=_jax.default_backend() == "cpu",
            )
            self._zero_P = jnp.zeros(Q.n_dofs, dtype=V.mesh.dtype)
            # boundary facet tables with window-permuted dof indices: the
            # lagged solve then lives entirely in permuted row coordinates
            import copy as _copy

            self._btab_perm = None
            if self.ctx.btab is not None:
                bt = self.ctx.btab
                btp = _copy.copy(bt)
                btp.cell_dofs = jnp.asarray(self._winmom.wl.inv)[bt.cell_dofs]
                self._btab_perm = btp
            nq = self._winmom.tab.phi.shape[0]
            self._win_Tq_zero = jnp.zeros(
                (
                    self._winmom.wl.nb,
                    self._winmom.dim * nq,
                    self._winmom.wl.C,
                ),
                dtype=jnp.float32,
            )
        self.rho = float(rho)
        self.mu = float(mu)
        self.rotational = rotational_form
        self.bdf2 = time_step_method == "bdf2"
        if time_step_method == "forward euler":
            self.theta = (1.0, 0.0)
        elif time_step_method in ("backward euler", "bdf2"):
            # BDF2 runs through the backward-Euler machinery: with step
            # ratio r = dt_n/dt_{n-1} the variable-step BDF2 update is a BE
            # step from u_hat = ((1+r)^2 u_n - r^2 u_{n-1})/(1+2r) with
            # effective step dt* = dt (1+r)/(1+2r) — second-order accuracy
            # with only mild numerical damping at BE per-step cost (the
            # property that lets the Schafer-Turek shedding run avoid
            # Crank-Nicolson's ~4x slower steps).
            self.theta = (0.0, 1.0)
        else:
            assert time_step_method == "crank-nicolson"
            self.theta = (0.5, 0.5)

        self.mask_u, self.val_u = combine_bcs(self.V_real, u_bcs)
        self.has_p_bcs = bool(p_bcs)
        if self.has_p_bcs:
            self.mask_p, self.val_p = combine_bcs(self.Q_real, p_bcs)
        else:
            self.mask_p = jnp.zeros(self.Q_real.n_dofs, dtype=V.mesh.dtype)
            self.val_p = self.mask_p
        if self.patch:
            # patch layout + padding slots pinned as Dirichlet-0 rows
            self.mask_u, self.val_u = self.ctx.mask_to_patch(
                self.V, self.mask_u, self.val_u
            )
            self.mask_p, self.val_p = self.ctx.mask_to_patch(
                self.Q, self.mask_p, self.val_p
            )

        self.newton_tol = newton_tol
        self.newton_rtol = newton_rtol
        self.newton_maxiter = newton_maxiter
        self.linear_rtol = linear_rtol
        self.ew_forcing = ew_forcing  # Eisenstat-Walker choice 2 inner rtol
        self.pressure_rtol = pressure_rtol
        self.pressure_maxiter = pressure_maxiter
        self.pressure_precond = pressure_precond  # callable r -> z or None
        self.correction_rtol = correction_rtol
        self.cfl_target = cfl_target
        self.dt_max = dt_max
        self.hmax = V.mesh.hmax
        self.forces_probe = forces_probe  # callable (U, P) -> array or None
        self.divergence_probe = divergence_probe

        # assembled ELL pressure-Poisson operator (constant matrix): one
        # row-gather per CG matvec instead of the full quadrature pipeline.
        # Patch mode: the factored quadrature-free stiffness apply IS the
        # fast path (window slices, no gathers) — no ELL.
        if self.patch:
            self._K_Q = None
            self._KQ_apply = lambda p: assembly.stiffness_apply(
                self.Q, self.ctx.geom, p
            )
        else:
            from ..fem.ell import ell_stiffness

            self._K_Q = ell_stiffness(Q, self.ctx.geom)
            self._KQ_apply = self._K_Q.apply
        if self.winkernel:
            import jax as _jax2

            from ..attic.winkernel import WindowStiffnessOperator

            self._K_Q_win = WindowStiffnessOperator(
                Q, interpret=_jax2.default_backend() == "cpu"
            )
            self._KQ_apply = self._K_Q_win._apply_impl

        # assembled momentum Jacobian (ELL, rebuilt on device once per
        # Newton iteration): BiCGStab matvecs become row-gather ELL applies
        # instead of quadrature-pipeline tangent evaluations. MEASURED
        # RESULT (TPU v5e, 120k DoF): a negative trade — TPU gathers are
        # row-count-bound (~1e8-3e8 rows/s), and the ELL apply gathers
        # n_dofs*W (~1.3M) rows vs the tangent pipeline's nc*nl (~0.3M), so
        # the "cheap" matvec costs 3.9 ms vs the tangent's 5.2 ms while the
        # per-iteration rebuild adds ~32 ms and the missing do-nothing
        # ds-Jacobian costs ~2 extra Newton iterations (net: 5.8 -> 2.7
        # steps/s). Kept as an opt-in capability (exactness verified in
        # test_fast); "auto" resolves to OFF. Full analysis: BENCH_NOTES.md.
        if assembled_jacobian == "auto":
            assembled_jacobian = False
        if self.patch:
            assert not assembled_jacobian, "patch mode: no ELL Jacobian"
        self._mom_graph = None
        if assembled_jacobian:
            from ..fem.ell import (
                ELLGraph,
                momentum_const_ell,
                momentum_bnd_stress_ell_vals,
            )

            g = ELLGraph(V)
            mass_v, visc1_v, visc2_v = momentum_const_ell(V, self.ctx.geom, g)
            if self.ctx.btab is not None:
                # the mu (grad u)^T n ds-term is linear in u: fold its
                # Jacobian into the constant viscous block (the residual
                # SUBTRACTS the boundary term, hence the minus)
                visc2_v = visc2_v - momentum_bnd_stress_ell_vals(
                    V, self.ctx.geom, self.ctx.btab, g
                )
            dtp = V.mesh.dtype
            self._mom_graph = g
            self._mom_mass = jnp.asarray(mass_v, dtype=dtp)
            self._mom_visc1 = jnp.asarray(visc1_v, dtype=dtp)
            self._mom_visc2 = jnp.asarray(visc2_v, dtype=dtp)

        # assembled-ELL LAGGED momentum operator: with frozen transport the
        # momentum solve's operator is FIXED for the whole step, so one
        # scalar convection rebuild (forms.conv_lagged_jacobian_loc — the
        # antisymmetric s23 part only, 4x less data than the Newton block
        # Jacobian) is amortized over every BiCGStab matvec, each of which
        # becomes a row-gather ELL apply instead of the quadrature tangent
        # pipeline. Unlike the Newton assembled path, the operator here is
        # EXACT: both ds-term Jacobians are included (the linear stress
        # term folded into the constant block, the do-nothing term
        # assembled per step through FacetMassELL), so the single linear
        # solve has identical semantics to the matrix-free branch.
        #
        # On-chip verdict (r3 chain-10 A/B, real v5e): NEGATIVE — 4.90 vs
        # 6.88 steps/s at 120k, 0.035 vs 0.296 at 1.9M. TPU gathers are
        # row-count-bound, and the ELL matvec gathers ~25 neighbor rows
        # per dof where the quadrature tangent gathers 6 dofs per cell
        # (~2.7 rows/dof) — the assembled form REREADS the sparsity every
        # matvec while the quadrature path re-derives it from 9x fewer
        # gathered rows. Stays opt-in for algorithm studies.
        # momentum Krylov dispatch: BiCGStab (default) costs 2 matvecs per
        # iteration; at the calibrated ~10-iteration lagged solves GMRES
        # costs ~1 matvec/iteration plus an [m+1, N] MXU orthogonalization
        # (~0.2 ms at 1.9M — trivial next to the ~82 ms matvec), so IF its
        # iteration count stays <~1.6x BiCGStab's it wins wall-clock on
        # the dominant substep. Opt-in pending the on-chip A/B.
        self.mom_solver = _os0.environ.get("FLOW_MOM_SOLVER", "") or momentum_solver
        self.gmres_restart = int(_os0.environ.get("FLOW_GMRES_RESTART", "32"))
        assert self.mom_solver in ("bicgstab", "gmres"), self.mom_solver

        lag_ell_env = _os0.environ.get("FLOW_LAGGED_ELL", "auto")
        self._lagmom_graph = None
        # "auto" resolves OFF (measured negative on-chip, above)
        if (
            self.lagged and not self.winkernel and not self.patch
            and lag_ell_env == "1"
        ):
            from ..fem.ell import (
                ELLGraph,
                FacetMassELL,
                momentum_const_ell,
                momentum_bnd_stress_ell_vals,
            )

            dtp = V.mesh.dtype
            g = self._mom_graph if self._mom_graph is not None else ELLGraph(V)
            mass_v, visc1_v, visc2_v = momentum_const_ell(V, self.ctx.geom, g)
            self._lagmom_graph = g
            self._lagmom_mass = jnp.asarray(mass_v, dtype=dtp)
            self._lagmom_visc1 = jnp.asarray(visc1_v, dtype=dtp)
            visc2B = np.asarray(visc2_v, dtype=np.float64)
            if self.ctx.btab is not None and self.ctx._ds_stress:
                visc2B = visc2B - momentum_bnd_stress_ell_vals(
                    V, self.ctx.geom, self.ctx.btab, g
                )
            self._lagmom_visc2 = jnp.asarray(visc2B, dtype=dtp)
            eye_nw = (
                np.asarray(g.cols_np) == np.arange(g.n)[:, None]
            ) & np.asarray(g._valid)
            dblk = (visc2B * eye_nw[:, :, None, None]).sum(axis=1)
            self._lagmom_dvisc2 = jnp.asarray(
                np.einsum("naa->na", dblk), dtype=dtp
            )
            self._lagmom_fm = None
            if self.ctx.btab is not None and self.ctx._ds_dn:
                self._lagmom_fm = FacetMassELL(g, self.ctx.btab, dtp)

        # matrix-free ELEMENT-MATRIX apply for the lagged momentum solve
        # (FLOW_LAGGED_EMA=1): with frozen transport the volume operator
        # decomposes as SCALAR[e,i,j] x delta_ab (mass + component-viscous
        # + lagged skew convection) plus the CONSTANT factored
        # grad-transpose stress coupling, so ONE per-step quadrature build
        # of the [nc, nl, nl] scalar tensor replaces the per-matvec
        # quadrature einsum chain (~half the measured matvec at 1.9M DoF,
        # BENCH_NOTES chain-8: einsum 40.9 of 82 ms) while KEEPING the
        # nl-dofs-per-cell gather structure that beats assembled-ELL on
        # TPU (gathers are row-count-bound; dof-graph ELL rereads ~25
        # neighbor rows/dof — chain-10 negative result). Stored flat
        # [nc, nl*nl]: the [nc,nl,nl] layout tile-pads ~21x on TPU
        # (round-3 padding discovery).
        # Default ON for lagged solves: the swap is exact
        # (tests/test_ema.py pins vs jax.linearize) and measured
        # +15%/+6%/+13% steps/s at 120k/1.9M/cavity3d-860k on the real
        # chip (BENCH_NOTES chain-16). FLOW_LAGGED_EMA=0 restores the
        # per-matvec quadrature chain.
        ema_env = _os0.environ.get("FLOW_LAGGED_EMA", "auto")
        self._lagged_ema = (
            self.lagged
            and not self.winkernel
            and self._lagmom_graph is None
            and ema_env in ("1", "auto")
        )
        # FLOW_EMA_PREC=bf16: store the per-solve scalar element tensor S
        # and the gathered Krylov vectors in bfloat16 — the tangent matvec
        # is HBM-bandwidth-bound (measured gather/einsum split, BENCH_NOTES
        # chain-8), so halving the operator's resident bytes attacks the
        # measured bound directly, and bf16 inputs are the MXU's native
        # mode. The OUTER residual (and therefore the converged answer)
        # stays f32: a low-precision tangent is classic defect correction —
        # it can only change iteration counts, not the fixed point
        # (tests/test_ema.py pins solution parity). Opt-in pending an
        # on-chip A/B.
        self._ema_bf16 = (
            self._lagged_ema
            and _os0.environ.get("FLOW_EMA_PREC", "f32") == "bf16"
        )

        # lane-packed hot path (fem/packed.py): component-major flat state
        # [2n] + 1-D tables; removes the 10-60x TPU tile-padding overhead
        # measured on the [n,2]/[nc,small] layouts (BENCH_NOTES round 3).
        # "auto" enables it for the 2-D Taylor-Hood case when there is no
        # body force / divergence probe (the packed kernels cover exactly
        # the projection-step surface); packed=False forces the einsum path.
        can_pack = (
            getattr(V.mesh, "dim", 2) == 2
            and V.degree == 2
            and Q.degree == 1
            and not divergence_probe
            and _os0.environ.get("FLOW_NO_PACKED", "") != "1"
        )
        # measured on the real chip (BENCH_NOTES r03 packed A/B): the
        # packed kernels are 20-35% SLOWER on wall clock at 120k-1.9M DoF
        # (XLA fuses the einsum path's gathers well enough), but they are
        # what makes >=4M DoF fit at all (tile padding OOMs the einsum
        # path's [nc,small] intermediates). "auto" = packed only where
        # memory forces it.
        big = (2 * V.n_dofs + Q.n_dofs) >= int(
            _os0.environ.get("FLOW_PACKED_MIN_DOFS", "3000000")
        )
        # winkernel IS the tile-friendly layout (blocked [rows, C] tables
        # pad ~1.2x) — with it, auto-packing has nothing to fix and the
        # packed granular path would silently bypass the window kernels
        if self.winkernel and packed == "auto":
            big = False
        self.packed = (
            (can_pack and big) if packed == "auto" else (packed and can_pack)
        )
        if packed is True and not can_pack:
            raise ValueError("packed mode unavailable for this configuration")
        if self.packed:
            from ..fem.packed import PackedContext

            self.pctx = PackedContext(V, Q, conv_rule=CONV_RULE)
            self.mask_uf = self.pctx.pack(self.mask_u)
            self.val_uf = self.pctx.pack(self.val_u)
            self.mass_diag_f = self.pctx.pack(self.ctx.mass_diag_V)
            self.stiff_diag_f = self.pctx.pack(self.ctx.stiff_diag_V)
            if self._lagged_ema:
                # packed EMA: constant grad:grad scalar pairs as pad-free
                # [nc] lane vectors (the packed analog of _ema_kscal)
                from ..utils.hostsetup import setup_on_cpu

                with setup_on_cpu():
                    self._ema_kscal_pk = self.pctx.stiffness_scalar_pairs()
        if self._lagged_ema and not self.packed:
            # dense-layout EMA tables (flat [nc, nl*nl]; see _ema_Jv)
            from ..utils.hostsetup import setup_on_cpu

            dtp = V.mesh.dtype
            with setup_on_cpu():
                ks = np.asarray(
                    forms.stiffness_scalar_loc(V, self.ctx.geom, dtp)
                )
            nlv = ks.shape[1]
            self._ema_nl = nlv
            self._ema_kscal = jnp.asarray(
                ks.reshape(ks.shape[0], nlv * nlv), dtype=dtp
            )
            Mref = np.asarray(
                assembly.ref_mass(V.degree, assembly._dim(V)),
                dtype=np.float64,
            )
            self._ema_mref = jnp.asarray(Mref.reshape(-1), dtype=dtp)

        # vertex-correction momentum preconditioner (momentum_precond=
        # "vertex"): additive two-level with a diagonal-only coarse solve,
        #   M(r) = D^-1 r + P [ R r / d1 ]
        # where R/P are the exact P2<->P1 transfer on the same mesh (P2 dof
        # order is [vertices; edges], fem/transfer.py) and d1 is the P1
        # diagonal of mass + s(rho conv + 2 mu stiff) PLUS an SUPG
        # streamline term tau (u.grad phi)^2 with tau = h/(2|u|) — the
        # upwind weighting is what makes the vertex block effective in the
        # convection-dominated CFL~1 regime (measured: BiCGStab 15 -> 9
        # iterations at the bench tolerance; a full P1 coarse SOLVE with
        # centered convection measured WORSE than Jacobi, 25 its). All
        # gathers, no scatter: R uses a padded vertex->incident-edge table.
        self.momentum_precond = momentum_precond
        if momentum_precond == "vertex":
            self._build_vertex_precond()
        else:
            assert momentum_precond is None
        self.step = jax.jit(self._step_impl)
        # run: the scan program. Default path hoists every closed-over
        # constant (mesh index tables, ELL values, boundary tabs, geometry
        # factors) into jit ARGUMENTS (utils/hoist.py): at refine-6+ the
        # embedded-constant program exceeds the remote-compile request cap
        # (HTTP 413, BENCH_NOTES round-2), and hoisting also removes
        # per-program constant re-uploads. FLOW_NO_HOIST=1 or
        # hoist_constants=False restores plain jit.
        import os as _os

        self._hoist_cache = {}
        self.hoist_constants = (
            hoist_constants and _os.environ.get("FLOW_NO_HOIST", "") != "1"
        )
        self._run_jit = jax.jit(self._run_impl, static_argnames=("n_steps",))
        self.run = self._run_hoisted if self.hoist_constants else self._run_jit
        if self.bdf2:
            self.step_bdf2 = jax.jit(self._step_impl_bdf2)

    def _ssq(self, r):
        """Squared residual norm: replica-weighted in patch mode (equal to
        the un-replicated norm), plain sum otherwise."""
        if self._pdot is not None:
            return self._pdot(r, r)
        return jnp.sum(r * r)

    def _lagged_mom_solve(self, Jv, r0, M, warm, free):
        """One affine (lagged) momentum solve, optionally warm-started with
        a seed increment (FLOW_MOM_WARMSTART: the dt-scaled previous
        velocity increment, threaded through the fused scan carry). The
        affine residual updates algebraically (r_w = r0 + J d0) and the
        stopping target stays relative to the TRUE initial residual at
        the transport state either way, so the converged answer is
        unchanged — only the Krylov iteration count moves."""
        if warm is None:
            return self._mom_krylov(Jv, -r0, M, self.newton_rtol)
        d0 = free * warm
        rw = r0 + Jv(d0)
        tgt = jnp.maximum(
            self.newton_rtol * jnp.sqrt(self._ssq(r0)),
            0.05 * self.newton_tol,
        )
        dx, sinfo = self._mom_krylov(Jv, -rw, M, 0.0, atol=tgt)
        return d0 + dx, sinfo

    def _mom_krylov(self, A, b, M, rtol, maxiter=300, atol=None):
        """Momentum-solve Krylov dispatch (see mom_solver in __init__)."""
        if atol is None:
            atol = 0.05 * self.newton_tol
        if self.mom_solver == "gmres":
            # FLOW_GMRES_BASIS=bf16: Arnoldi basis in bfloat16 — the
            # batched-MGS basis reads are the solve's dominant HBM
            # traffic at large n (2 x [m+1, N] per iteration, more than
            # the EMA matvec itself); ~1e-3 orthogonality is ample for
            # the momentum forcing tolerances. Opt-in pending on-chip A/B.
            import os as _os

            bd = (
                jnp.bfloat16
                if _os.environ.get("FLOW_GMRES_BASIS", "") == "bf16"
                else None
            )
            # clamp the restart to the iteration budget: the inner Arnoldi
            # cycle runs up to `restart` matvecs regardless of maxiter, and
            # granular mode's maxiter IS the watchdog budget per execution
            if self._sqrtw_V is not None:
                # weighted-metric GMRES by sqrt(W) conjugation (see
                # _build_setup): standard-dot internals then reproduce the
                # un-replicated iteration exactly
                sw = self._sqrtw_V
                A_, M_, b_ = A, M, b

                def A2(v):
                    return sw * A_(v / sw)

                def M2(v):
                    return sw * M_(v / sw)

                x2, sinfo = krylov.gmres(
                    A2, sw * b_, M=M2, rtol=rtol, atol=atol,
                    maxiter=maxiter,
                    restart=min(self.gmres_restart, maxiter),
                    basis_dtype=bd,
                )
                return x2 / sw, sinfo
            return krylov.gmres(
                A, b, M=M, rtol=rtol, atol=atol, maxiter=maxiter,
                restart=min(self.gmres_restart, maxiter),
                basis_dtype=bd, dot=self._pdot,
            )
        return krylov.bicgstab(
            A, b, M=M, rtol=rtol, atol=atol, maxiter=maxiter, dot=self._pdot
        )

    def _run_hoisted(
        self, U, P, dt0, n_steps, Fq=None, Um1=None, dtp0=None,
        dt_max=None, cfl_target=None,
    ):
        from ..utils.hoist import HoistedFunction

        opt = {
            "Fq": Fq, "Um1": Um1, "dtp0": dtp0,
            "dt_max": dt_max, "cfl_target": cfl_target,
        }
        names = tuple(k for k, v in opt.items() if v is not None)
        args = (U, P, dt0) + tuple(opt[k] for k in names)
        sig = tuple(
            (jnp.shape(a), str(jnp.result_type(a))) for a in jax.tree.leaves(args)
        )
        key = (n_steps, names, sig)
        hf = self._hoist_cache.get(key)
        if hf is None:

            def g(U, P, dt0, *rest):
                return self._run_impl(
                    U, P, dt0, n_steps, **dict(zip(names, rest))
                )

            hf = HoistedFunction(g, args)
            self._hoist_cache[key] = hf
        return hf(*args)

    def _build_vertex_precond(self):
        import numpy as np

        from ..fem.spaces import FunctionSpace as _FS
        from .pressure_correction import CONV_RULE

        V = self.V
        mesh = V.mesh
        assert getattr(mesh, "dim", 2) == 2 and V.degree == 2, (
            "vertex momentum preconditioner: 2-D P2 only (P2 dof order "
            "[vertices; edges] is the transfer structure)"
        )
        assert V.n_dofs == mesh.n_points + mesh.n_edges
        S1 = _FS(mesh, 1)
        geom = self.ctx.geom
        dtp = mesh.dtype
        self._vp_S1 = S1
        self._vp_npts = mesh.n_points
        self._vp_mass_diag = S1.dof_sum(
            jnp.einsum("eii->ei", assembly.mass_local(S1, geom))
        )
        self._vp_stiff_diag = S1.dof_sum(
            jnp.einsum("eii->ei", assembly.stiffness_local(S1, geom))
        )
        tab1 = assembly.tabulation(S1, CONV_RULE)
        self._vp_phi1 = jnp.asarray(tab1.phi, dtype=dtp)
        self._vp_gph1 = jnp.einsum(
            "qjk,edk->eqjd", jnp.asarray(tab1.dphi, dtype=dtp), geom.G
        )
        self._vp_wd1 = (
            jnp.asarray(tab1.w, dtype=dtp)[None, :] * geom.detJ[:, None]
        )
        self._vp_hel = jnp.sqrt(2.0 * jnp.abs(geom.detJ))
        self._vp_tabV = assembly.tabulation(V, CONV_RULE)

        # vertex -> incident-edge padded gather table (restriction without
        # any scatter in the compiled graph; pad rows point at a zero row)
        e = mesh.edges_np
        n_edges = len(e)
        n_pts = mesh.n_points
        vv = np.concatenate([e[:, 0], e[:, 1]])
        ee = np.concatenate(
            [np.arange(n_edges), np.arange(n_edges)]
        ).astype(np.int32)
        cnt = np.bincount(vv, minlength=n_pts)
        kmax = int(cnt.max())
        tabv = np.full((n_pts, kmax), n_edges, dtype=np.int32)
        order = np.argsort(vv, kind="stable")
        vv_s, ee_s = vv[order], ee[order]
        starts = np.concatenate([[0], np.cumsum(cnt)])
        rowpos = np.arange(len(vv_s)) - starts[vv_s]
        tabv[vv_s, rowpos] = ee_s
        self._vp_v2e = jnp.asarray(tabv)

    def _ema_Jv(self, x0, dt, free_u):
        """Element-matrix tangent of the LAGGED momentum residual at frozen
        transport x0 (FLOW_LAGGED_EMA=1). The volume operator decomposes as
        SCALAR[e,i,j] x delta_ab — mass + component-viscous + lagged skew
        convection, built ONCE here by quadrature and stored flat
        [nc, nl*nl] (the [nc,nl,nl] layout tile-pads ~21x on TPU) — plus
        the constant factored grad-transpose stress coupling and the
        O(surface) ds tangents. Each Krylov matvec is then one gather +
        nl small contractions + one dof-sum: the per-matvec quadrature
        einsum chain (measured ~half the 82 ms matvec at 1.9M DoF) is paid
        once per solve instead of once per matvec. Exactness vs
        jax.linearize pinned in tests/test_ema.py."""
        S = self._ema_S(x0, dt)
        return self._ema_Jv_fromS(S, x0, dt, free_u)

    def _ema_S(self, x0, dt):
        """The dense-layout EMA scalar element tensor at frozen transport
        x0 (the once-per-solve quadrature build split out of _ema_Jv so the
        granular lagged fast path can amortize it across Krylov segment
        executions)."""
        ctx = self.ctx
        rho, mu = self.rho, self.mu
        nl = self._ema_nl
        s = (dt / rho) * self.theta[1]
        conv_s = forms.conv_lagged_jacobian_loc(
            ctx.V, ctx.geom, ctx.V.gather(x0), rule_degree=CONV_RULE
        )
        nc = conv_s.shape[0]
        S = (
            ctx.geom.detJ[:, None] * self._ema_mref[None, :]
            + (s * mu) * self._ema_kscal
            + (s * rho) * conv_s.reshape(nc, nl * nl)
        )
        if self._ema_bf16:
            S = S.astype(jnp.bfloat16)
        return S

    def _ema_Jv_fromS(self, S, x0, dt, free_u):
        """Apply-only half of _ema_Jv: the tangent closure over a
        prebuilt scalar tensor S (x0 enters only through the O(surface)
        ds-term tangents)."""
        ctx = self.ctx
        rho, mu = self.rho, self.mu
        nl = self._ema_nl
        s = (dt / rho) * self.theta[1]
        bt = ctx.btab
        tnp_ = None
        if bt is not None and ctx._ds_dn:
            tb = bt.values(x0)
            tn = jnp.einsum("bqm,bm->bq", tb, bt.normals)
            tnp_ = jnp.maximum(tn, 0.0)

        def bnd_t(v):
            # tangent of the x-dependent ds-terms (stress linear,
            # do-nothing with frozen transport)
            if bt is None:
                return None
            val = None
            if ctx._ds_stress:
                gw = bt.grads(v, ctx.geom)
                val = mu * jnp.einsum("bqma,bm->bqa", gw, bt.normals)
            if tnp_ is not None:
                t = -0.5 * rho * tnp_[:, :, None] * bt.values(v)
                val = t if val is None else val + t
            if val is None:
                return None
            return bt.integrate_rhs(val)

        def Jv(v):
            vg = v.astype(jnp.bfloat16) if self._ema_bf16 else v
            vloc = ctx.V.gather(vg)
            loc = jnp.stack(
                [
                    jnp.einsum(
                        "ej,eja->ea", S[:, i * nl:(i + 1) * nl], vloc,
                        preferred_element_type=v.dtype,
                    )
                    for i in range(nl)
                ],
                axis=1,
            )
            loc = loc + (s * mu) * forms.sym_grad_transpose_loc(
                ctx.V, ctx.geom, vloc
            ).astype(v.dtype)
            av = ctx.V.dof_sum(loc)
            b = bnd_t(v)
            if b is not None:
                av = av - s * b
            return free_u * av + self.mask_u * v

        return Jv

    def _ema_Jv_pk(self, x0f, dt, free):
        """Packed-layout EMA lagged tangent (see _ema_Jv): flat [2n]
        states, scalar tensor S as nlV x nlV pad-free [nc] lane vectors
        (fem/packed.py lagged_scalar_tensor). This is the >=3M-DoF memory
        layout, so the 7.6M/10M momentum solves get the same
        one-quadrature-build-per-solve amortization."""
        S = self._ema_S_pk(x0f, dt)
        return self._ema_Jv_pk_fromS(S, x0f, dt, free)

    def _ema_S_pk(self, x0f, dt):
        """Packed-layout EMA scalar tensor at frozen transport x0f (the
        once-per-solve quadrature build; see _ema_S)."""
        pc = self.pctx
        rho, mu = self.rho, self.mu
        s = (dt / rho) * self.theta[1]
        T = pc.comps(x0f)
        Tl = [pc.gatherV(T[0]), pc.gatherV(T[1])]
        S = pc.lagged_scalar_tensor(
            Tl, 1.0, s * mu, s * rho, self._ema_kscal_pk
        )
        if self._ema_bf16:
            S = [[sij.astype(jnp.bfloat16) for sij in row] for row in S]
        return S

    def _ema_Jv_pk_fromS(self, S, x0f, dt, free):
        """Apply-only half of _ema_Jv_pk over a prebuilt scalar tensor."""
        pc, ctx = self.pctx, self.ctx
        rho, mu = self.rho, self.mu
        s = (dt / rho) * self.theta[1]
        zQ = jnp.zeros(self.Q.n_dofs, dtype=x0f.dtype)

        def Jv(vf):
            vg = vf.astype(jnp.bfloat16) if self._ema_bf16 else vf
            v = pc.comps(vg)
            Vl = [pc.gatherV(v[0]), pc.gatherV(v[1])]
            loc = pc._zero_loc(vf)
            loc = pc.ema_scalar_apply(loc, S, Vl)
            loc = pc.sym_grad_transpose_loc_acc(loc, Vl, mu=s * mu)
            av = pc.dof_sum_V2(loc)
            if ctx.btab is not None and (ctx._ds_stress or ctx._ds_dn):
                # Pf = 0 makes boundary_rhs exactly the ds tangent
                # (stress linear; do-nothing with frozen transport)
                b = pc.boundary_rhs(
                    ctx.btab, ctx.btabQ, vf, zQ, rho, mu,
                    ds_stress=ctx._ds_stress, ds_dn=ctx._ds_dn, Tf=x0f,
                )
                av = av - s * b
            return free * av + self.mask_uf * vf

        return Jv

    def _vertex_precond_M(self, U, dt, free, diag):
        """Lagged-diagonal vertex-correction preconditioner at (U, dt):
        one extra quadrature pass per STEP; each application is two small
        gathers + elementwise (~0.3x one tangent apply).

        Accepts the velocity state in either layout: [n, 2] (dense path)
        or flat [2n] (packed path) — the returned M matches the layout."""
        V = self.V
        rho, mu = self.rho, self.mu
        s = (dt / rho) * self.theta[1]
        pk = U.ndim == 1
        if pk:
            U2 = self.pctx.unpack(U)  # diag build only: once per step
        else:
            U2 = U
        Wq = assembly.values_at_qp(self._vp_tabV, V.gather(U2))  # [e,q,2]
        ugph = jnp.einsum("eqd,eqjd->eqj", Wq, self._vp_gph1)
        conv_d = jnp.einsum("eq,qj,eqj->ej", self._vp_wd1, self._vp_phi1, ugph)
        umag = jnp.sqrt(jnp.sum(Wq * Wq, axis=-1))
        tau = self._vp_hel[:, None] / (2.0 * jnp.maximum(umag, 1e-10))
        supg_d = jnp.einsum("eq,eq,eqj,eqj->ej", self._vp_wd1, tau, ugph, ugph)
        S1 = self._vp_S1
        d1 = (
            self._vp_mass_diag
            + s * (2.0 * mu) * self._vp_stiff_diag
            + s * rho * S1.dof_sum(conv_d + supg_d)
        )
        n_pts = self._vp_npts
        vmask = self.mask_u[:n_pts]
        dd = (1.0 - vmask) * d1[:, None] + vmask
        edges = V.mesh.edges
        v2e = self._vp_v2e

        def M_dense(r):
            rf = free * r
            rv, rm = rf[:n_pts], rf[n_pts:]
            rmp = jnp.concatenate(
                [rm, jnp.zeros((1, rm.shape[1]), dtype=rm.dtype)], axis=0
            )
            rc = rv + 0.5 * jnp.sum(rmp[v2e], axis=1)
            z = rc / dd
            zm = 0.5 * (z[edges[:, 0]] + z[edges[:, 1]])
            return r / diag + free * jnp.concatenate([z, zm], axis=0)

        if not pk:
            return M_dense

        # packed layout: same correction per component on 1-D arrays
        n = self.V.n_dofs
        zpad = None

        def M_packed(r):
            rf = free * r
            out = []
            for c in range(2):
                rc_full = rf[c * n:(c + 1) * n]
                rv, rm = rc_full[:n_pts], rc_full[n_pts:]
                rmp = jnp.concatenate(
                    [rm, jnp.zeros((1,), dtype=rm.dtype)]
                )
                rc = rv + 0.5 * jnp.sum(rmp[v2e], axis=1)
                z = rc / dd[:, c]
                zm = 0.5 * (z[edges[:, 0]] + z[edges[:, 1]])
                out.append(jnp.concatenate([z, zm]))
            return r / diag + free * jnp.concatenate(out)

        return M_packed

    # -- BDF2 as a backward-Euler step from a modified state ---------------
    @staticmethod
    def _bdf2_hat(U, Um1, dt, dtp):
        r = dt / dtp
        uhat = ((1.0 + r) ** 2 * U - r * r * Um1) / (1.0 + 2.0 * r)
        dt_eff = dt * (1.0 + r) / (1.0 + 2.0 * r)
        return uhat, dt_eff, r

    def _step_impl_bdf2(self, U, Um1, P, dt, dtp, Fq=None):
        uhat, dt_eff, r = self._bdf2_hat(U, Um1, dt, dtp)
        # second-order extrapolated Newton initial guess
        x0 = (1.0 + r) * U - r * Um1
        return self._step_impl(uhat, P, dt_eff, Fq, x0=x0)

    # -- packed-path substeps (flat [2n] velocity state) ---------------------
    def _step_impl_pk(self, Uf, Pf, dt, Fq=None, x0=None, warm=None):
        assert Fq is None, "packed path covers the zero-body-force surface"
        pc = self.pctx
        ctx = self.ctx
        rho, mu = self.rho, self.mu
        w_im = self.theta[1]
        free = 1.0 - self.mask_uf

        def res_bc(x):
            r = pc.residual_volume(x, Uf, Pf, rho, mu, dt, w_im)
            b = pc.boundary_rhs(
                ctx.btab, ctx.btabQ, x, Pf, rho, mu,
                ds_stress=ctx._ds_stress, ds_dn=ctx._ds_dn,
            )
            r = r - (dt / rho) * w_im * b
            return free * r + self.mask_uf * (x - self.val_uf)

        diag = self.mass_diag_f + (dt / rho) * w_im * (2.0 * mu) * self.stiff_diag_f
        diag = free * diag + self.mask_uf
        if self.momentum_precond == "vertex":
            M_mom = self._vertex_precond_M(Uf, dt, free, diag)
        else:
            M_mom = lambda t: t / diag
        if x0 is None:
            x0 = Uf
        x0 = free * x0 + self.mask_uf * self.val_uf
        eta0 = jnp.asarray(self.linear_rtol, dtype=Uf.dtype)

        if self.lagged:
            # semi-implicit: affine residual with transport x0; one solve
            def res_lag(x):
                r = pc.residual_volume(x, Uf, Pf, rho, mu, dt, w_im, Tf=x0)
                b = pc.boundary_rhs(
                    ctx.btab, ctx.btabQ, x, Pf, rho, mu,
                    ds_stress=ctx._ds_stress, ds_dn=ctx._ds_dn, Tf=x0,
                )
                r = r - (dt / rho) * w_im * b
                return free * r + self.mask_uf * (x - self.val_uf)

            r0 = res_lag(x0)
            if self._lagged_ema:
                Jv = self._ema_Jv_pk(x0, dt, free)
            else:
                _, Jv = jax.linearize(res_lag, x0)
            dx, sinfo = self._lagged_mom_solve(Jv, r0, M_mom, warm, free)
            Uif = x0 + dx
            # affine residual: res_lag(x0 + dx) = r0 + J dx, which is
            # exactly the Krylov solver's tracked residual — no extra
            # residual evaluation for telemetry
            nres = sinfo.resnorm
            P1, piters = self._pressure_solve_pk(Uif, Pf, dt)
            U1f, citers = self._correction_pk(Uif, P1, Pf, dt)
            return U1f, P1, StepStats(
                jnp.array(1), nres, sinfo.iters, piters, citers
            )

        def newton_body(state):
            x, rnorm, k, lin, eta = state
            if self.tangent_mode == "jvp":
                r = res_bc(x)

                def Jv(v):
                    return jax.jvp(res_bc, (x,), (v,))[1]

            else:
                r, Jv = jax.linearize(res_bc, x)
            dx, sinfo = self._mom_krylov(Jv, -r, M_mom, eta)
            x = x + dx
            rn = res_bc(x)
            rnorm_new = jnp.sqrt(self._ssq(rn))
            if self.ew_forcing:
                gamma = 0.9
                eta_new = gamma * (rnorm_new / rnorm) ** 2
                guard = gamma * eta * eta
                eta_new = jnp.where(guard > 0.1, jnp.maximum(eta_new, guard), eta_new)
                eta = jnp.clip(eta_new, 1.0e-4, 0.5)
            return (x, rnorm_new, k + 1, lin + sinfo.iters, eta)

        r0 = res_bc(x0)
        rnorm0 = jnp.sqrt(self._ssq(r0))
        newton_target = jnp.maximum(self.newton_tol, self.newton_rtol * rnorm0)

        def newton_cond(state):
            _, rnorm, k, _, _ = state
            return jnp.logical_and(rnorm > newton_target, k < self.newton_maxiter)

        Uif, nres, niters, lin_iters, _ = jax.lax.while_loop(
            newton_cond, newton_body,
            (x0, rnorm0, jnp.array(0), jnp.array(0), eta0),
        )

        P1, piters = self._pressure_solve_pk(Uif, Pf, dt)
        U1f, citers = self._correction_pk(Uif, P1, Pf, dt)
        return U1f, P1, StepStats(niters, nres, lin_iters, piters, citers)

    def _pressure_solve_pk(self, Uif, Pf, dt):
        pc = self.pctx
        ctx = self.ctx
        L2 = -(self.rho / dt) * pc.div_rhs(Uif)
        if self.rotational:
            L2 = L2 - self.mu * pc.grad_div_rhs(Uif)

        mask, gvals = self.mask_p, self.val_p
        diagq = jnp.where(ctx.stiff_diag_Q > 0, ctx.stiff_diag_Q, 1.0)
        M = self.pressure_precond or (lambda r: r / diagq)
        # increment form phi = p1 - p0 (see _pressure_solve_mg docstring)
        if not self.has_p_bcs:

            def K(p):
                return self._KQ_apply(p)

            if not self.increment_form:
                L2 = L2 + K(Pf)
            p1, sinfo = krylov.cg(
                K, L2, M=M, rtol=self.pressure_rtol,
                maxiter=self.pressure_maxiter, nullspace=[ctx.ones_Q],
            )
            if self.increment_form:
                p1 = Pf + p1
        else:
            free = 1.0 - mask

            def K_bc(p):
                return free * self._KQ_apply(free * p) + mask * p

            if self.increment_form:
                pin = mask * (gvals - Pf)
                rhs = free * (L2 - self._KQ_apply(pin)) + pin
            else:
                L2 = L2 + self._KQ_apply(Pf)
                rhs = (
                    free * (L2 - self._KQ_apply(mask * gvals))
                    + mask * gvals
                )
            p1, sinfo = krylov.cg(
                K_bc, rhs, M=M, rtol=self.pressure_rtol,
                maxiter=self.pressure_maxiter,
            )
            if self.increment_form:
                p1 = Pf + p1
        return p1, sinfo.iters

    def _correction_pk(self, Uif, P1, Pf, dt):
        pc = self.pctx
        phi = P1 - Pf
        div_part = None
        if self.rotational:
            v = pc.grad_div_cell(Uif)
            div_part = [self.mu * v[0], self.mu * v[1]]
        free = 1.0 - self.mask_uf

        def M_bc(u):
            return free * pc.mass_apply(free * u) + self.mask_uf * u

        diag = free * self.mass_diag_f + self.mask_uf
        if self.increment_form:
            # solve for d = u1 - u*: M d = -(dt/rho) grad(phi); the CG
            # stopping rtol*|b| then measures the correction INCREMENT, not
            # the full velocity field (see _pressure_solve_mg docstring)
            L3 = -(dt / self.rho) * pc.grad_phi_rhs(phi, div_part=div_part)
            dmask = self.mask_uf * (self.val_uf - Uif)
            rhs = free * (L3 - pc.mass_apply(dmask)) + dmask
            d, sinfo = krylov.cg(
                M_bc, rhs, M=lambda r: r / diag, rtol=self.correction_rtol,
                maxiter=500,
            )
            return Uif + d, sinfo.iters
        L3 = pc.mass_apply(Uif) - (dt / self.rho) * pc.grad_phi_rhs(
            phi, div_part=div_part
        )
        rhs = (
            free * (L3 - pc.mass_apply(self.mask_uf * self.val_uf))
            + self.mask_uf * self.val_uf
        )
        u1, sinfo = krylov.cg(
            M_bc, rhs, M=lambda r: r / diag, rtol=self.correction_rtol,
            maxiter=500,
        )
        return u1, sinfo.iters

    # -- one projection step (all substeps fused into one XLA program) ------
    def _step_impl(self, U, P, dt, Fq=None, x0=None, warm=None):
        if self.patch and U.shape[0] == self.V_real.n_dofs:
            # global-layout API convenience: convert at the seam (setup-cost
            # gathers; the scan path stays patch-resident)
            Vp, Qp = self.V, self.Q
            conv = lambda a, sp: None if a is None else sp.to_patch(a)
            U1, P1, stats = self._step_impl_dense(
                Vp.to_patch(U), Qp.to_patch(P), dt, Fq,
                conv(x0, Vp), conv(warm, Vp),
            )
            return Vp.from_patch(U1), Qp.from_patch(P1), stats
        if self.packed and Fq is None:
            if U.ndim == 2:  # public [n, 2] API — convert at the seam
                x0f = None if x0 is None else self.pctx.pack(x0)
                wf = None if warm is None else self.pctx.pack(warm)
                U1f, P1, stats = self._step_impl_pk(
                    self.pctx.pack(U), P, dt, None, x0f, wf
                )
                return self.pctx.unpack(U1f), P1, stats
            return self._step_impl_pk(U, P, dt, None, x0, warm)
        return self._step_impl_dense(U, P, dt, Fq, x0, warm)

    def _step_impl_dense(self, U, P, dt, Fq=None, x0=None, warm=None):
        # Fq None means f == 0: the force integral is skipped entirely
        # (saves one dof summation per residual evaluation)
        ctx = self.ctx
        rho, mu = self.rho, self.mu
        free_u = 1.0 - self.mask_u

        # substep 1: tentative velocity (Newton, jvp-based Jacobian)
        def res_bc(x):
            r = ctx._residual(x, U, Fq, Fq, P, rho, mu, dt, self.theta)
            return free_u * r + self.mask_u * (x - self.val_u)

        w_im = self.theta[1]
        diag = ctx.mass_diag_V + (dt / rho) * w_im * (2.0 * mu) * ctx.stiff_diag_V
        diag = free_u * diag + self.mask_u
        if x0 is None:
            x0 = U
        x0 = free_u * x0 + self.mask_u * self.val_u
        eta0 = jnp.asarray(self.linear_rtol, dtype=U.dtype)
        if self.momentum_precond == "vertex":
            M_mom = self._vertex_precond_M(U, dt, free_u, diag)
        else:
            M_mom = lambda t: t / diag

        if self.lagged:
            # semi-implicit: transport with x0 (= u^n for theta methods,
            # the second-order extrapolation for BDF2 — _step_impl_bdf2
            # passes it as the initial guess). res_lag is AFFINE in x, so
            # one linear solve to the Newton target replaces the loop.
            def res_lag(x):
                r = ctx._residual(
                    x, U, Fq, Fq, P, rho, mu, dt, self.theta, transport=x0
                )
                return free_u * r + self.mask_u * (x - self.val_u)

            r0 = res_lag(x0)
            if self.winkernel:
                # gather-free window kernel for the volume matvec
                # (fem/winmom.py), with the WHOLE solve in permuted row
                # coordinates — zero per-apply permutes. Boundary ds-terms
                # (O(surface)) use permuted-index facet tables; BC identity
                # rows via the permuted mask.
                op = self._winmom
                Tq = op.transport_qp(x0)
                s = (dt / rho) * self.theta[1]
                permi = op.perm
                inv = op.inv
                maskp = self.mask_u[permi]
                freep = 1.0 - maskp
                diagp = diag[permi]
                bt = ctx.btab
                btp = self._btab_perm
                # transport factor of the do-nothing term, once per step
                if ctx._ds_dn and bt is not None:
                    tb = bt.values(x0)
                    tnp_ = jnp.einsum("bqm,bm->bq", tb, bt.normals)
                    tnp_ = jnp.maximum(tnp_, 0.0)

                def bnd_p(vp):
                    # x-dependent ds-terms of _rhs_weak_bnd in permuted rows
                    if bt is None:
                        return None
                    val = None
                    if ctx._ds_stress:
                        gw = btp.grads(vp, ctx.geom)
                        val = mu * jnp.einsum(
                            "bqma,bm->bqa", gw, bt.normals
                        )
                    if ctx._ds_dn:
                        wb = btp.values(vp)
                        t = -0.5 * rho * tnp_[:, :, None] * wb
                        val = t if val is None else val + t
                    if val is None:
                        return None
                    return btp.integrate_rhs(val)

                def Jv_p(vp):
                    av = op.apply_perm_rows(vp, Tq, 1.0, s * rho, s * mu)
                    b = bnd_p(vp)
                    if b is not None:
                        av = av - s * b
                    return freep * av + maskp * vp

                r0p = r0[permi]
                dxp, sinfo = self._mom_krylov(
                    Jv_p, -r0p, lambda t: t / diagp, self.newton_rtol
                )
                dx = dxp[inv]
                Ui = x0 + dx
                nres = sinfo.resnorm  # affine: r0 + J dx = Krylov residual
                return self._finish_substeps(
                    Ui, U, P, dt, jnp.array(1), nres, sinfo.iters
                )

            if self._lagmom_graph is not None:
                # assembled-ELL operator: scalar part rebuilt once per step
                # (mass + viscous delta_ab + lagged skew convection + the
                # do-nothing ds term), constant grad-transpose/stress block
                # kept separate so nothing block-sized is written per step.
                # Exact (matches jax.linearize(res_lag) to roundoff), so
                # solve semantics are identical to the matrix-free branch.
                g = self._lagmom_graph
                s = (dt / rho) * w_im
                conv_el = forms.conv_lagged_jacobian_loc(
                    ctx.V, ctx.geom, ctx.V.gather(x0), rule_degree=CONV_RULE
                )
                scal = (
                    self._lagmom_mass
                    + (s * mu) * self._lagmom_visc1
                    + (s * rho) * g.assemble(conv_el)
                )
                if self._lagmom_fm is not None:
                    tb = ctx.btab.values(x0)
                    tn = jnp.einsum("bqm,bm->bq", tb, ctx.btab.normals)
                    scal = scal + (s * 0.5 * rho) * self._lagmom_fm.assemble(
                        jnp.maximum(tn, 0.0)
                    )
                visc2B = self._lagmom_visc2
                smu = s * mu
                nv, we, W = g.n_vert, g.w_edge, g.width

                def _av(sc, bl, cols, v):
                    xg = v[cols]  # [rows, w, d] — scal and block share it
                    return jnp.einsum(
                        "nk,nkm->nm", sc, xg
                    ) + smu * jnp.einsum("nkab,nkb->na", bl, xg)

                def Jv(v):
                    if 0 < we < W and nv < g.n:
                        av = jnp.concatenate(
                            [
                                _av(scal[:nv], visc2B[:nv], g.cols[:nv], v),
                                _av(
                                    scal[nv:, :we],
                                    visc2B[nv:, :we],
                                    g.cols[nv:, :we],
                                    v,
                                ),
                            ],
                            axis=0,
                        )
                    else:
                        av = _av(scal, visc2B, g.cols, v)
                    return free_u * av + self.mask_u * v

                dex = g.diag(scal)[:, None] + smu * self._lagmom_dvisc2
                dex = free_u * dex + self.mask_u
                dx, sinfo = self._mom_krylov(
                    Jv, -r0, lambda t: t / dex, self.newton_rtol
                )
                Ui = x0 + dx
                nres = sinfo.resnorm  # affine: r0 + J dx = Krylov residual
                return self._finish_substeps(
                    Ui, U, P, dt, jnp.array(1), nres, sinfo.iters
                )

            if self._lagged_ema:
                # element-matrix apply: one per-step scalar tensor build
                # (quadrature, amortized over every Krylov matvec) — see
                # _ema_Jv; exactness pinned in tests/test_ema.py
                Jv = self._ema_Jv(x0, dt, free_u)
                dx, sinfo = self._lagged_mom_solve(
                    Jv, r0, M_mom, warm, free_u
                )
                Ui = x0 + dx
                nres = sinfo.resnorm  # affine: r0 + J dx = Krylov residual
                return self._finish_substeps(
                    Ui, U, P, dt, jnp.array(1), nres, sinfo.iters
                )

            if self.tangent_mode == "jvp":
                # no linearize storage (the [nc,nq,...] quadrature
                # intermediates OOM large 3-D problems); ~2x tangent cost
                def Jv(v):
                    return jax.jvp(res_lag, (x0,), (v,))[1]

            else:
                _, Jv = jax.linearize(res_lag, x0)
            # the solve IS the step: stop on the Newton target semantics
            # (rtol on |r0| / absolute newton_tol), not the inexact-Newton
            # inner linear_rtol
            dx, sinfo = self._lagged_mom_solve(Jv, r0, M_mom, warm, free_u)
            Ui = x0 + dx
            nres = sinfo.resnorm  # affine: r0 + J dx = Krylov residual
            niters = jnp.array(1)
            lin_iters = sinfo.iters
            return self._finish_substeps(Ui, U, P, dt, niters, nres, lin_iters)

        def newton_body_win(state):
            # gather-free Newton: the tangent matvec (the measured ~80% of
            # a step) runs as the window kernel WITH the reaction term
            # c(v; x) (fem/winmom.py newton mode) — the exact volume
            # tangent — plus the exact ds-term tangents; the whole Krylov
            # solve lives in permuted row coordinates (zero per-apply
            # permutes, one permute per Newton iteration).
            op = self._winmom
            s = (dt / rho) * w_im
            permi, inv = op.perm, op.inv
            maskp = self.mask_u[permi]
            freep = 1.0 - maskp
            diagp = diag[permi]
            bt = ctx.btab
            btp = self._btab_perm

            x, rnorm, k, lin, eta = state
            r = res_bc(x)
            Tq, Uq, Gu = op.state_qp(x)
            if ctx._ds_dn and bt is not None:
                tb = bt.values(x)
                tn = jnp.einsum("bqm,bm->bq", tb, bt.normals)
                tnp_ = jnp.maximum(tn, 0.0)
                pos = (tn > 0.0).astype(tb.dtype)

            def bnd_p(vp):
                # exact tangent of the x-dependent ds-terms: stress is
                # linear; do-nothing -(rho/2)(x.n)+ x differentiates into
                # (x.n)+ v + H(x.n)(v.n) x
                if bt is None:
                    return None
                val = None
                if ctx._ds_stress:
                    gw = btp.grads(vp, ctx.geom)
                    val = mu * jnp.einsum("bqma,bm->bqa", gw, bt.normals)
                if ctx._ds_dn:
                    wb = btp.values(vp)
                    wn = jnp.einsum("bqm,bm->bq", wb, bt.normals)
                    t = -0.5 * rho * (
                        tnp_[:, :, None] * wb + (pos * wn)[:, :, None] * tb
                    )
                    val = t if val is None else val + t
                if val is None:
                    return None
                return btp.integrate_rhs(val)

            def Jv_p(vp):
                av = op.apply_perm_rows(vp, Tq, 1.0, s * rho, s * mu, Uq, Gu)
                b = bnd_p(vp)
                if b is not None:
                    av = av - s * b
                return freep * av + maskp * vp

            dxp, sinfo = self._mom_krylov(
                Jv_p, -r[permi], lambda t: t / diagp, eta
            )
            x = x + dxp[inv]
            rn = res_bc(x)
            rnorm_new = jnp.sqrt(self._ssq(rn))
            if self.ew_forcing:
                gamma = 0.9
                eta_new = gamma * (rnorm_new / rnorm) ** 2
                guard = gamma * eta * eta
                eta_new = jnp.where(
                    guard > 0.1, jnp.maximum(eta_new, guard), eta_new
                )
                eta = jnp.clip(eta_new, 1.0e-4, 0.5)
            return (x, rnorm_new, k + 1, lin + sinfo.iters, eta)

        def newton_body(state):
            x, rnorm, k, lin, eta = state
            if self._mom_graph is not None:
                # assembled-Jacobian path: one residual + one quadrature
                # pass (convection element Jacobian) + one scatter-add per
                # Newton iteration; every Krylov matvec is then an ELL
                # row-gather apply
                g = self._mom_graph
                r = res_bc(x)
                conv_el = forms.conv_jacobian_loc(
                    ctx.V, ctx.geom, ctx.V.gather(x), rule_degree=CONV_RULE
                )
                s = (dt / rho) * w_im
                vals = (s * rho) * g.assemble(conv_el)
                vals = vals + (s * mu) * self._mom_visc2
                sc = self._mom_mass + (s * mu) * self._mom_visc1
                eye = jnp.eye(vals.shape[-1], dtype=vals.dtype)
                vals = vals + sc[:, :, None, None] * eye

                def Jv(v):
                    return free_u * g.apply(vals, v) + self.mask_u * v

            elif self.tangent_mode == "jvp":
                # huge-size mode: no linearize storage (see _gran_newton_iter)
                r = res_bc(x)

                def Jv(v):
                    return jax.jvp(res_bc, (x,), (v,))[1]

            else:
                # linearize once per Newton iteration: Krylov then evaluates
                # the tangent only (jvp would recompute the full primal
                # every matvec)
                r, Jv = jax.linearize(res_bc, x)

            dx, sinfo = self._mom_krylov(Jv, -r, M_mom, eta)
            x = x + dx
            rn = res_bc(x)
            rnorm_new = jnp.sqrt(self._ssq(rn))
            if self.ew_forcing:
                # Eisenstat-Walker choice 2: eta ~ gamma (|r_k|/|r_{k-1}|)^2,
                # with the standard over-solving safeguard; replaces the
                # fixed linear_rtol (PETSc -snes_ksp_ew semantics)
                gamma = 0.9
                eta_new = gamma * (rnorm_new / rnorm) ** 2
                guard = gamma * eta * eta
                eta_new = jnp.where(guard > 0.1, jnp.maximum(eta_new, guard), eta_new)
                eta = jnp.clip(eta_new, 1.0e-4, 0.5)
            return (x, rnorm_new, k + 1, lin + sinfo.iters, eta)

        if self.winkernel:
            newton_body = newton_body_win

        r0 = res_bc(x0)
        rnorm0 = jnp.sqrt(self._ssq(r0))
        # absolute (reference semantics, :228-254) OR relative (the f32
        # benchmark path, where dt/rho scales the residual below f32 noise)
        newton_target = jnp.maximum(self.newton_tol, self.newton_rtol * rnorm0)

        def newton_cond(state):
            _, rnorm, k, _, _ = state
            return jnp.logical_and(rnorm > newton_target, k < self.newton_maxiter)

        Ui, nres, niters, lin_iters, _ = jax.lax.while_loop(
            newton_cond, newton_body, (x0, rnorm0, jnp.array(0), jnp.array(0), eta0)
        )
        return self._finish_substeps(Ui, U, P, dt, niters, nres, lin_iters)

    def _finish_substeps(self, Ui, U, P, dt, niters, nres, lin_iters):
        """Substeps 2+3 (pressure Poisson, velocity correction) shared by
        the Newton and lagged momentum branches of the einsum path."""
        ctx = self.ctx
        rho, mu = self.rho, self.mu
        # substep 2: pressure Poisson (optionally GMG-preconditioned)
        if self.pressure_precond is None:
            P1, piters, _ = ctx._pressure_solve_impl(
                Ui,
                P,
                1.0,
                rho,
                dt,
                mu,
                self.mask_p,
                self.val_p,
                self.pressure_rtol,
                neumann=not self.has_p_bcs,
                rotational=self.rotational,
            )
        else:
            P1, piters = self._pressure_solve_mg(Ui, P, dt)

        # substep 3: velocity correction
        if self.winkernel:
            # gather-free mass matvec (winmom with zero conv/stress weights)
            from ..fem import forms as _forms

            V, Q, geom = self.V, self.Q, ctx.geom
            op = self._winmom
            phi = P1 - P
            div_part = None
            if self.rotational:
                div_part = mu * _forms.grad_div_ustar(V, geom, Ui)
            mask = self.mask_u
            free = 1.0 - mask
            Tq0 = jnp.zeros_like(self._win_Tq_zero)

            def M_bc(u):
                y = op.apply(free * u, Tq0, 1.0, 0.0, 0.0)
                return free * y + mask * u

            diag = free * ctx.mass_diag_V + mask
            L3 = -(dt / rho) * _forms.grad_phi_rhs(
                V, Q, geom, phi, div_part=div_part, rule_degree=4
            )
            dmask = mask * (self.val_u - Ui)
            rhs = free * (L3 - op.apply(dmask, Tq0, 1.0, 0.0, 0.0)) + dmask
            d, sinfo = krylov.cg(
                M_bc, rhs, M=lambda r: r / diag,
                rtol=self.correction_rtol, maxiter=500,
            )
            U1, citers = Ui + d, sinfo.iters
        else:
            U1, citers, _ = ctx._velocity_correction_impl(
                Ui,
                P1,
                P,
                rho,
                mu,
                dt,
                self.mask_u,
                self.val_u,
                self.correction_rtol,
                rotational=self.rotational,
            )
        return U1, P1, StepStats(niters, nres, lin_iters, piters, citers)

    def _pressure_solve_mg(self, Ui, P, dt):
        """Pressure Poisson with a user-supplied (e.g. multigrid) SPD
        preconditioner — the hot solve of the benchmark path.

        Increment form (default): solve K phi = -(rho/dt) div(u*) - [rot]
        for phi = p1 - p0 instead of K p1 = same + K p0. Algebraically
        identical, but the CG stopping test rtol*|b| then measures the
        INCREMENT scale: the full-field form's truncation floor
        (rtol x |K p0|) acts as a per-step linear filter on small dynamics
        — measured at refine-2 it damps the physical Hopf shedding mode by
        ~4.7/s (its growth is only +2.57/s) and froze the wake on the
        steady branch (BENCH_NOTES round 3, exact step-map analysis).
        FLOW_ABS_SOLVES=1 restores the full-field form for A/B."""
        ctx = self.ctx
        V, Q, geom = self.V, self.Q, ctx.geom

        mask, gvals = self.mask_p, self.val_p

        L2 = -(self.rho / dt) * forms.div_rhs(V, Q, geom, Ui)
        if self.rotational:
            L2 = L2 - self.mu * forms.grad_div_ustar_rhs(V, Q, geom, Ui)

        if not self.has_p_bcs:

            def K(p):
                return self._KQ_apply(p)

            if self.increment_form:
                phi, sinfo = krylov.cg(
                    K,
                    L2,
                    M=self.pressure_precond,
                    rtol=self.pressure_rtol,
                    maxiter=self.pressure_maxiter,
                    nullspace=[ctx.ones_Q],
                    dot=self._pdot,
                )
                p1 = P + phi
            else:
                L2 = L2 + K(P)
                p1, sinfo = krylov.cg(
                    K,
                    L2,
                    M=self.pressure_precond,
                    rtol=self.pressure_rtol,
                    maxiter=self.pressure_maxiter,
                    nullspace=[ctx.ones_Q],
                    dot=self._pdot,
                )
        else:
            free = 1.0 - mask

            def K_bc(p):
                return free * self._KQ_apply(free * p) + mask * p

            def K_raw(p):
                return self._KQ_apply(p)

            if self.increment_form:
                pin = mask * (gvals - P)
                rhs = free * (L2 - K_raw(pin)) + pin
                phi, sinfo = krylov.cg(
                    K_bc,
                    rhs,
                    M=self.pressure_precond,
                    rtol=self.pressure_rtol,
                    maxiter=self.pressure_maxiter,
                    dot=self._pdot,
                )
                p1 = P + phi
            else:
                L2 = L2 + K_raw(P)
                rhs = free * (L2 - K_raw(mask * gvals)) + mask * gvals
                p1, sinfo = krylov.cg(
                    K_bc,
                    rhs,
                    M=self.pressure_precond,
                    rtol=self.pressure_rtol,
                    maxiter=self.pressure_maxiter,
                    dot=self._pdot,
                )
        return p1, sinfo.iters

    # -- granular (host-orchestrated) stepping -------------------------------
    # One device execution per Newton iteration / pressure solve / velocity
    # correction, with bounded inner Krylov iteration caps. At >=7.6M DoF a
    # single fused step exceeds the remote worker's ~10 s execution watchdog
    # (a 13 s execution is killed); splitting at substep granularity keeps
    # every execution under the cap at ~1 ms/call host dispatch cost —
    # negligible against multi-second kernels. Also the preemption-friendly
    # serving mode: state is host-visible between substeps.
    def _gran_cached(self, name, fn, *args):
        from ..utils.hoist import HoistedFunction

        key = (name,) + tuple(
            (jnp.shape(a), str(jnp.result_type(a))) for a in jax.tree.leaves(args)
        )
        hf = self._hoist_cache.get(key)
        if hf is None:
            hf = HoistedFunction(fn, args)
            self._hoist_cache[key] = hf
        return hf(*args)

    def _gran_newton_iter(self, x, U, P, dt, kry_maxiter):
        ctx = self.ctx
        rho, mu = self.rho, self.mu
        free_u = 1.0 - self.mask_u

        T = None
        if self.lagged:
            T = (1.0 - self.mask_u) * U + self.mask_u * self.val_u

        def res_bc(z):
            r = ctx._residual(
                z, U, None, None, P, rho, mu, dt, self.theta, transport=T
            )
            return free_u * r + self.mask_u * (z - self.val_u)

        w_im = self.theta[1]
        diag = ctx.mass_diag_V + (dt / rho) * w_im * (2.0 * mu) * ctx.stiff_diag_V
        diag = free_u * diag + self.mask_u
        if self.momentum_precond == "vertex":
            M_mom = self._vertex_precond_M(U, dt, free_u, diag)
        else:
            M_mom = lambda t: t / diag
        if self.winkernel:
            # gather-free window-kernel tangent (fem/winmom.py) — also the
            # tile-friendly memory layout at huge sizes: the blocked
            # [rows, C] tables pad ~1.2x where the einsum path's
            # [nc, small] intermediates padded 20-60x (round-3 OOM)
            op = self._winmom
            s = (dt / rho) * w_im
            permi, inv = op.perm, op.inv
            maskp = self.mask_u[permi]
            freep = 1.0 - maskp
            diagp = diag[permi]
            bt = ctx.btab
            btp = self._btab_perm
            r = res_bc(x)
            if self.lagged:
                Tq = op.transport_qp(T)
                Uq = Gu = None
                tsrc = T
            else:
                Tq, Uq, Gu = op.state_qp(x)
                tsrc = x
            if ctx._ds_dn and bt is not None:
                tb = bt.values(tsrc)
                tn = jnp.einsum("bqm,bm->bq", tb, bt.normals)
                tnp_ = jnp.maximum(tn, 0.0)
                pos = (tn > 0.0).astype(tb.dtype)

            def bnd_p(vp):
                if bt is None:
                    return None
                val = None
                if ctx._ds_stress:
                    gw = btp.grads(vp, ctx.geom)
                    val = mu * jnp.einsum("bqma,bm->bqa", gw, bt.normals)
                if ctx._ds_dn:
                    wb = btp.values(vp)
                    t = -0.5 * rho * tnp_[:, :, None] * wb
                    if not self.lagged:
                        # tangent of -(rho/2)(x.n)+ x also has the
                        # H(x.n)(v.n) x piece; lagged freezes the transport
                        wn = jnp.einsum("bqm,bm->bq", wb, bt.normals)
                        t = t - 0.5 * rho * (pos * wn)[:, :, None] * tb
                    val = t if val is None else val + t
                if val is None:
                    return None
                return btp.integrate_rhs(val)

            def Jv_p(vp):
                av = op.apply_perm_rows(vp, Tq, 1.0, s * rho, s * mu, Uq, Gu)
                b = bnd_p(vp)
                if b is not None:
                    av = av - s * b
                return freep * av + maskp * vp

            dxp, sinfo = self._mom_krylov(
                Jv_p, -r[permi], lambda t: t / diagp, self.linear_rtol,
                maxiter=kry_maxiter,
            )
            x1 = x + dxp[inv]
            r1 = res_bc(x1)
            return x1, jnp.sqrt(self._ssq(r1)), sinfo.iters
        if self._lagged_ema and T is not None:
            # element-matrix tangent (see _ema_Jv): rebuilt per granular
            # sweep (transport is fixed for the whole step, so the extra
            # quadrature builds across sweeps are redundant but exact)
            r = res_bc(x)
            Jv = self._ema_Jv(T, dt, free_u)
        elif self.tangent_mode == "jvp":
            # huge-size mode: linearize STORES the [nc, nq, ...]
            # quadrature intermediates, which TPU tile-padding inflates
            # 20-60x (measured OOM at 7.6M DoF: 29.4G demanded of 15.75G
            # HBM); jvp recomputes the primal inside every matvec instead
            # — ~2x tangent cost, O(state) memory
            r = res_bc(x)

            def Jv(v):
                return jax.jvp(res_bc, (x,), (v,))[1]

        else:
            r, Jv = jax.linearize(res_bc, x)
        dx, sinfo = self._mom_krylov(
            Jv, -r, M_mom, self.linear_rtol, maxiter=kry_maxiter
        )
        x1 = x + dx
        r1 = res_bc(x1)
        return x1, jnp.sqrt(self._ssq(r1)), sinfo.iters

    def _gran_newton_iter_pk(self, x, Uf, Pf, dt, kry_maxiter):
        pc = self.pctx
        ctx = self.ctx
        rho, mu = self.rho, self.mu
        w_im = self.theta[1]
        free = 1.0 - self.mask_uf
        # lagged mode (granular is the BE path): transport with u^n; the
        # residual is then affine, so the segmented Krylov continuation the
        # granular loop performs converges the single linear solve
        Tf = (
            free * Uf + self.mask_uf * self.val_uf if self.lagged else None
        )

        def res_bc(z):
            r = pc.residual_volume(z, Uf, Pf, rho, mu, dt, w_im, Tf=Tf)
            b = pc.boundary_rhs(
                ctx.btab, ctx.btabQ, z, Pf, rho, mu,
                ds_stress=ctx._ds_stress, ds_dn=ctx._ds_dn, Tf=Tf,
            )
            r = r - (dt / rho) * w_im * b
            return free * r + self.mask_uf * (z - self.val_uf)

        diag = self.mass_diag_f + (dt / rho) * w_im * (2.0 * mu) * self.stiff_diag_f
        diag = free * diag + self.mask_uf
        if self.momentum_precond == "vertex":
            M_mom = self._vertex_precond_M(Uf, dt, free, diag)
        else:
            M_mom = lambda t: t / diag
        if self._lagged_ema and Tf is not None:
            # packed element-matrix tangent (see _ema_Jv_pk)
            r = res_bc(x)
            Jv = self._ema_Jv_pk(Tf, dt, free)
        elif self.tangent_mode == "jvp":
            r = res_bc(x)

            def Jv(v):
                return jax.jvp(res_bc, (x,), (v,))[1]

        else:
            r, Jv = jax.linearize(res_bc, x)
        dx, sinfo = self._mom_krylov(
            Jv, -r, M_mom, self.linear_rtol, maxiter=kry_maxiter
        )
        x1 = x + dx
        r1 = res_bc(x1)
        return x1, jnp.sqrt(self._ssq(r1)), sinfo.iters

    # -- granular lagged-linear fast path ------------------------------------
    # With frozen (lagged) transport the momentum residual is AFFINE in the
    # iterate, so the granular "Newton" sweeps are segments of ONE linear
    # solve. The generic sweeps (_gran_newton_iter*) rebuild the EMA scalar
    # tensor (a full quadrature pass over all cells) and evaluate the
    # residual by quadrature TWICE in every segment execution; here the
    # tensor and the initial residual are built once per step and each
    # segment updates the residual algebraically (r1 = r + J dx, one extra
    # matvec — exact for an affine residual). Stopping semantics match the
    # FUSED path (_step_impl): relative to the true initial residual (the
    # generic granular loop used the first post-update residual as a
    # conservative stand-in, one execution cheaper — here the initial
    # residual is free in the setup execution). FLOW_GRAN_LINFAST=0
    # restores the generic sweeps.
    @property
    def _gran_fast_ok(self):
        # _ema_bf16 is excluded: its granular guarantee (defect correction
        # to the f32 fixed point) depends on the generic sweeps recomputing
        # the TRUE residual by quadrature; the algebraic update here would
        # converge to the bf16 operator's fixed point instead.
        return (
            self.lagged
            and self._lagged_ema
            and not self._ema_bf16
            and self.momentum_precond is None
            and not self.winkernel
            and self.gran_linfast
        )

    def _gran_lagged_setup(self, U, P, dt):
        ctx = self.ctx
        rho, mu = self.rho, self.mu
        free_u = 1.0 - self.mask_u
        T = free_u * U + self.mask_u * self.val_u
        r0 = ctx._residual(
            U, U, None, None, P, rho, mu, dt, self.theta, transport=T
        )
        r0 = free_u * r0 + self.mask_u * (U - self.val_u)
        S = self._ema_S(T, dt)
        return r0, jnp.sqrt(self._ssq(r0)), S

    def _gran_lagged_segment(self, x, r, S, U, dt, kry_maxiter):
        rho = self.rho
        free_u = 1.0 - self.mask_u
        T = free_u * U + self.mask_u * self.val_u
        w_im = self.theta[1]
        diag = self.ctx.mass_diag_V + (dt / rho) * w_im * (
            2.0 * self.mu
        ) * self.ctx.stiff_diag_V
        diag = free_u * diag + self.mask_u
        Jv = self._ema_Jv_fromS(S, T, dt, free_u)
        dx, sinfo = self._mom_krylov(
            Jv, -r, lambda t: t / diag, self.linear_rtol, maxiter=kry_maxiter
        )
        x1 = x + dx
        r1 = r + Jv(dx)
        return x1, r1, jnp.sqrt(self._ssq(r1)), sinfo.iters

    def _gran_lagged_setup_pk(self, Uf, Pf, dt):
        pc, ctx = self.pctx, self.ctx
        rho, mu = self.rho, self.mu
        w_im = self.theta[1]
        free = 1.0 - self.mask_uf
        Tf = free * Uf + self.mask_uf * self.val_uf
        r0 = pc.residual_volume(Uf, Uf, Pf, rho, mu, dt, w_im, Tf=Tf)
        b = pc.boundary_rhs(
            ctx.btab, ctx.btabQ, Uf, Pf, rho, mu,
            ds_stress=ctx._ds_stress, ds_dn=ctx._ds_dn, Tf=Tf,
        )
        r0 = r0 - (dt / rho) * w_im * b
        r0 = free * r0 + self.mask_uf * (Uf - self.val_uf)
        S = self._ema_S_pk(Tf, dt)
        return r0, jnp.sqrt(self._ssq(r0)), S

    def _gran_lagged_segment_pk(self, x, r, S, Uf, dt, kry_maxiter):
        rho = self.rho
        w_im = self.theta[1]
        free = 1.0 - self.mask_uf
        Tf = free * Uf + self.mask_uf * self.val_uf
        diag = self.mass_diag_f + (dt / rho) * w_im * (
            2.0 * self.mu
        ) * self.stiff_diag_f
        diag = free * diag + self.mask_uf
        Jv = self._ema_Jv_pk_fromS(S, Tf, dt, free)
        dx, sinfo = self._mom_krylov(
            Jv, -r, lambda t: t / diag, self.linear_rtol, maxiter=kry_maxiter
        )
        x1 = x + dx
        r1 = r + Jv(dx)
        return x1, r1, jnp.sqrt(self._ssq(r1)), sinfo.iters

    def _gran_lagged_warm(self, r, S, Uf, xp, Up, alpha, dt, packed):
        """Warm-start execution: seed the affine solve with the previous
        step's increment d = xp - Up scaled by alpha = dt/dt_prev. Exact
        residual update (affine): r_ws = r + alpha J d."""
        if packed:
            free = 1.0 - self.mask_uf
            Tf = free * Uf + self.mask_uf * self.val_uf
            Jv = self._ema_Jv_pk_fromS(S, Tf, dt, free)
        else:
            free = 1.0 - self.mask_u
            T = free * Uf + self.mask_u * self.val_u
            Jv = self._ema_Jv_fromS(S, T, dt, free)
        d = alpha * (xp - Up)
        x = Uf + d
        r_ws = r + Jv(d)
        return x, r_ws, jnp.sqrt(self._ssq(r_ws))

    def _gran_lagged_solve(self, Uf, Pf, dt, kry_maxiter, packed):
        """Segmented lagged momentum solve; returns (x, n_segments,
        linear_iters_total). Layout-agnostic via the packed flag."""
        setup = self._gran_lagged_setup_pk if packed else self._gran_lagged_setup
        seg = (
            self._gran_lagged_segment_pk if packed else self._gran_lagged_segment
        )
        tag = "pk" if packed else ""
        r, rn0, S = self._gran_cached(
            f"lag_setup{tag}",
            lambda Uf, Pf, dt: setup(Uf, Pf, dt),
            Uf, Pf, dt,
        )
        rnorm0 = float(rn0)
        target = max(self.newton_tol, self.newton_rtol * rnorm0)
        x = Uf
        rn = rnorm0
        ws = self._ws_prev
        if (
            self.mom_warmstart
            and ws is not None
            and jnp.shape(ws[0]) == jnp.shape(Uf)
        ):
            xp, Up, dtp = ws
            alpha = jnp.asarray(float(dt) / dtp, dtype=Uf.dtype)
            x, r, rn_w = self._gran_cached(
                f"lag_warm{tag}",
                lambda r, S, Uf, xp, Up, a, dt: self._gran_lagged_warm(
                    r, S, Uf, xp, Up, a, dt, packed
                ),
                r, S, Uf, xp, Up, alpha, dt,
            )
            rn = float(rn_w)
        n_seg = 0
        lin_total = 0
        while rn > target and n_seg < self.newton_maxiter:
            x, r, rn_a, li = self._gran_cached(
                f"lag_seg{tag}{kry_maxiter}",
                lambda x, r, S, Uf, dt: seg(x, r, S, Uf, dt, kry_maxiter),
                x, r, S, Uf, dt,
            )
            n_seg += 1
            lin_total += int(li)
            rn = float(rn_a)
        if self.mom_warmstart:
            self._ws_prev = (x, Uf, float(dt))
        return x, n_seg, lin_total

    def step_granular(self, U, P, dt, kry_maxiter=10):
        """One projection step as a sequence of watchdog-sized executions.
        Returns (U1, P1, stats-dict of host ints). Accepts [n,2] or (when
        packed) flat [2n] velocity state; output layout matches input."""
        if self.packed:
            was2d = U.ndim == 2
            Uf = self.pctx.pack(U) if was2d else U
            if self._gran_fast_ok:
                x, n_newton, lin_total = self._gran_lagged_solve(
                    Uf, P, dt, kry_maxiter, packed=True
                )
            else:
                x = Uf
                rnorm0 = None
                n_newton = 0
                lin_total = 0
                for _ in range(self.newton_maxiter):
                    x, rnorm, li = self._gran_cached(
                        f"newton_pk{kry_maxiter}",
                        lambda x, Uf, Pf, dt: self._gran_newton_iter_pk(
                            x, Uf, Pf, dt, kry_maxiter
                        ),
                        x, Uf, P, dt,
                    )
                    n_newton += 1
                    lin_total += int(li)
                    rn = float(rnorm)
                    if rnorm0 is None:
                        rnorm0 = rn
                    if rn <= max(self.newton_tol, self.newton_rtol * rnorm0):
                        break
            P1, piters = self._gran_cached(
                "pressure_pk",
                lambda Ui, P, dt: self._pressure_solve_pk(Ui, P, dt),
                x, P, dt,
            )
            def _corr_umax_pk(Ui, P1, P, dt):
                # fold the CFL readback into the correction execution (one
                # fewer granular dispatch per step)
                U1f, ci = self._correction_pk(Ui, P1, P, dt)
                a, b = self.pctx.comps(U1f)
                return U1f, ci, jnp.sqrt(jnp.max(a * a + b * b))

            U1f, citers, umax = self._gran_cached(
                "correction_pk", _corr_umax_pk, x, P1, P, dt
            )
            U1 = self.pctx.unpack(U1f) if was2d else U1f
            return U1, P1, {
                "newton_iters": n_newton,
                "linear_iters": lin_total,
                "pressure_iters": int(piters),
                "correction_iters": int(citers),
                "umax": float(umax),
            }
        if self._gran_fast_ok:
            x, n_newton, lin_total = self._gran_lagged_solve(
                U, P, dt, kry_maxiter, packed=False
            )
        else:
            x = U
            rnorm0 = None
            n_newton = 0
            lin_total = 0
            for _ in range(self.newton_maxiter):
                x, rnorm, li = self._gran_cached(
                    f"newton{kry_maxiter}",
                    lambda x, U, P, dt: self._gran_newton_iter(
                        x, U, P, dt, kry_maxiter
                    ),
                    x, U, P, dt,
                )
                n_newton += 1
                lin_total += int(li)
                rn = float(rnorm)
                if rnorm0 is None:
                    # the target mirrors _step_impl: absolute OR relative to
                    # the FIRST post-update residual (a conservative stand-in
                    # for the initial residual, which the generic granular
                    # loop never evaluates separately — one fewer execution)
                    rnorm0 = rn
                if rn <= max(self.newton_tol, self.newton_rtol * rnorm0):
                    break
        Ui = x
        P1, piters = self._gran_cached(
            "pressure",
            lambda Ui, P, dt: self._pressure_solve_mg(Ui, P, dt)
            if self.pressure_precond is not None
            else self.ctx._pressure_solve_impl(
                Ui, P, 1.0, self.rho, dt, self.mu, self.mask_p, self.val_p,
                self.pressure_rtol, neumann=not self.has_p_bcs,
                rotational=self.rotational,
            )[:2],
            Ui, P, dt,
        )
        def _corr_umax(Ui, P1, P, dt):
            # fold the CFL readback into the correction execution (one
            # fewer granular dispatch per step)
            U1, ci, _ = self.ctx._velocity_correction_impl(
                Ui, P1, P, self.rho, self.mu, dt, self.mask_u, self.val_u,
                self.correction_rtol, rotational=self.rotational,
            )
            return U1, ci, jnp.sqrt(jnp.max(jnp.sum(U1 * U1, axis=1)))

        U1, citers, umax = self._gran_cached(
            "correction", _corr_umax, Ui, P1, P, dt
        )
        return U1, P1, {
            "newton_iters": n_newton,
            "linear_iters": lin_total,
            "pressure_iters": int(piters),
            "correction_iters": int(citers),
            "umax": float(umax),
        }

    def run_granular(self, U, P, dt0, n_steps, kry_maxiter=10):
        """Host-orchestrated time loop (the huge-size twin of run): CFL
        controller on host, telemetry as numpy arrays."""
        import numpy as np

        pk = self.packed
        if pk and U.ndim == 2:
            U = self.pctx.pack(U)

        import os as _os
        import sys as _sys
        import time as _time

        verbose = _os.environ.get("FLOW_GRANULAR_VERBOSE", "1") == "1"
        dt = float(dt0)
        tel = {k: [] for k in (
            "t", "dt", "newton_iters", "linear_iters", "pressure_iters",
            "correction_iters",
        )}
        t = 0.0
        for _k in range(n_steps):
            _t0 = _time.perf_counter()
            U, P, stats = self.step_granular(
                U, P, jnp.asarray(dt, dtype=U.dtype), kry_maxiter
            )
            t += dt
            if verbose:
                # granular runs are HOURS at 10M DoF — an opaque silent
                # process is indistinguishable from a wedge; one line per
                # step to stderr
                print(
                    f"granular step {_k + 1}/{n_steps}: "
                    f"{_time.perf_counter() - _t0:.1f}s dt={dt:.3e} "
                    f"newton={stats['newton_iters']} "
                    f"linear={stats['linear_iters']}",
                    file=_sys.stderr,
                    flush=True,
                )
            umax = stats["umax"]
            target_dt = self.cfl_target * self.hmax / max(umax, 1e-30)
            dt = min(
                self.dt_max, dt * min(2.0, 1.0 + 0.5 * (target_dt - dt) / dt)
            )
            tel["t"].append(t)
            tel["dt"].append(dt)
            for k in ("newton_iters", "linear_iters", "pressure_iters",
                      "correction_iters"):
                tel[k].append(stats[k])
        if pk:
            U = self.pctx.unpack(U)
        return U, P, dt, {k: np.asarray(v) for k, v in tel.items()}

    # -- scan loop with on-device CFL dt controller --------------------------
    def _run_impl(
        self, U, P, dt0, n_steps, Fq=None, Um1=None, dtp0=None,
        dt_max=None, cfl_target=None,
    ):
        """n_steps fused steps. For BDF2 the carry additionally holds the
        previous state/step (Um1, dtp); pass them to chain checkpointed
        segments at full second order (defaults re-bootstrap: Um1=U, dtp=dt0
        makes the first step a backward-Euler-like consistent step). BDF2
        returns a 5th element (Um1, dtp) for the next segment.

        dt_max/cfl_target override the constructor values as TRACED scalars
        — changing them between runs does not recompile the scan program."""
        glob = self.patch and U.shape[0] == self.V_real.n_dofs
        if glob:
            U = self.V.to_patch(U)
            P = self.Q.to_patch(P)
            if Um1 is not None:
                Um1 = self.V.to_patch(Um1)
            out = self._run_impl(
                U, P, dt0, n_steps, Fq, Um1, dtp0, dt_max, cfl_target
            )
            U1, P1 = self.V.from_patch(out[0]), self.Q.from_patch(out[1])
            return (U1, P1) + tuple(out[2:])
        if self.bdf2:
            return self._run_impl_bdf2(
                U, P, dt0, n_steps, Fq, Um1, dtp0, dt_max, cfl_target
            )
        dt_cap = jnp.asarray(
            self.dt_max if dt_max is None else dt_max, dtype=U.dtype
        )
        cfl = jnp.asarray(
            self.cfl_target if cfl_target is None else cfl_target, dtype=U.dtype
        )
        pk = self.packed and Fq is None
        if pk:
            U = self.pctx.pack(U)

        def _umax2(U1):
            if pk:
                a, b = self.pctx.comps(U1)
                return jnp.max(a * a + b * b)
            return jnp.max(jnp.sum(U1 * U1, axis=1))

        ws = self.mom_warmstart and self.lagged

        def body(carry, _):
            if ws:
                U, P, dt, t, Um1, dtp = carry
                # warm seed: previous full-step velocity increment scaled
                # to the current dt (zero on the first step: Um1 == U)
                warm = (dt / dtp) * (U - Um1)
                U1, P1, stats = self._step_impl(U, P, dt, Fq, warm=warm)
            else:
                U, P, dt, t = carry
                U1, P1, stats = self._step_impl(U, P, dt, Fq)
            t = t + dt
            # smooth CFL-style controller (mirrors the host-side logic of
            # /root/reference/tests/test_karman_vortex_street.py:261-287,
            # computed on device)
            umax = jnp.sqrt(_umax2(U1))
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
                U1p = self.pctx.unpack(U1) if pk else U1
                P1p = P1
                if self.patch:
                    U1p = self.V.from_patch(U1)
                    P1p = self.Q.from_patch(P1)
                if getattr(self.forces_probe, "needs_history", False):
                    # consistent force functional: gets the scheme's own
                    # time-derivative stencil (here BE/CN endpoint form)
                    Up = self.pctx.unpack(U) if pk else U
                    if self.patch:
                        Up = self.V.from_patch(U)
                    out["forces"] = self.forces_probe(U1p, P1p, Up, dt)
                else:
                    out["forces"] = self.forces_probe(U1p, P1p)
            if self.divergence_probe:
                # ||div u||_L2 — the projection splitting-error monitor
                ctx = self.ctx
                tab = assembly.tabulation(self.V, 2 * self.V.degree)
                gU = assembly.grads_at_qp(tab, ctx.geom, self.V.gather(U1))
                divq = jnp.trace(gU, axis1=2, axis2=3)
                out["div_norm"] = jnp.sqrt(
                    jnp.einsum("eq,q,e->", divq * divq, tab.w, ctx.geom.detJ)
                )
            if ws:
                return (U1, P1, dt_new, t, U, dt), out
            return (U1, P1, dt_new, t), out

        t0 = jnp.asarray(0.0, dtype=U.dtype)
        carry0 = (U, P, dt0, t0, U, dt0) if ws else (U, P, dt0, t0)
        carry, telemetry = jax.lax.scan(body, carry0, None, length=n_steps)
        U, P, dt = carry[0], carry[1], carry[2]
        if pk:
            U = self.pctx.unpack(U)
        return U, P, dt, telemetry

    def _run_impl_bdf2(
        self, U, P, dt0, n_steps, Fq=None, Um1=None, dtp0=None,
        dt_max=None, cfl_target=None,
    ):
        if Um1 is None:
            Um1 = U
        if dtp0 is None:
            dtp0 = dt0
        dt_cap = jnp.asarray(
            self.dt_max if dt_max is None else dt_max, dtype=U.dtype
        )
        cfl = jnp.asarray(
            self.cfl_target if cfl_target is None else cfl_target, dtype=U.dtype
        )
        pk = self.packed and Fq is None
        if pk:
            U = self.pctx.pack(U)
            Um1 = self.pctx.pack(Um1)

        def _umax2(U1):
            if pk:
                a, b = self.pctx.comps(U1)
                return jnp.max(a * a + b * b)
            return jnp.max(jnp.sum(U1 * U1, axis=1))

        def body(carry, _):
            U, Um1, P, dt, dtp, t = carry
            U1, P1, stats = self._step_impl_bdf2(U, Um1, P, dt, dtp, Fq)
            t = t + dt
            umax = jnp.sqrt(_umax2(U1))
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
                U1p = self.pctx.unpack(U1) if pk else U1
                P1p = P1
                if self.patch:
                    U1p = self.V.from_patch(U1)
                    P1p = self.Q.from_patch(P1)
                if getattr(self.forces_probe, "needs_history", False):
                    # (u_hat, dt_eff) make (U1 - u_hat)/dt_eff exactly the
                    # variable-step BDF2 derivative
                    uhat, dt_eff, _ = self._bdf2_hat(U, Um1, dt, dtp)
                    uhatp = self.pctx.unpack(uhat) if pk else uhat
                    if self.patch:
                        uhatp = self.V.from_patch(uhat)
                    out["forces"] = self.forces_probe(U1p, P1p, uhatp, dt_eff)
                else:
                    out["forces"] = self.forces_probe(U1p, P1p)
            if self.divergence_probe:
                ctx = self.ctx
                tab = assembly.tabulation(self.V, 2 * self.V.degree)
                gU = assembly.grads_at_qp(tab, ctx.geom, self.V.gather(U1))
                divq = jnp.trace(gU, axis1=2, axis2=3)
                out["div_norm"] = jnp.sqrt(
                    jnp.einsum("eq,q,e->", divq * divq, tab.w, ctx.geom.detJ)
                )
            return (U1, U, P1, dt_new, dt, t), out

        (U, Um1, P, dt, dtp, t), telemetry = jax.lax.scan(
            body,
            (U, Um1, P, dt0, dtp0, jnp.asarray(0.0, dtype=U.dtype)),
            None,
            length=n_steps,
        )
        if pk:
            U = self.pctx.unpack(U)
            Um1 = self.pctx.unpack(Um1)
        return U, P, dt, telemetry, (Um1, dtp)
