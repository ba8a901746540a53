# Pressure-correction (projection) schemes for unsteady incompressible
# Navier-Stokes:
#
#     rho (u' + (u.grad)u) = -grad p + mu Lap(u) + f,   div u = 0.
#
# API-parity rebuild of
# /root/reference/flow/navier_stokes/pressure_correction.py (Chorin :521,
# IPCS :555, Rotational :587; orchestrated by _step :468) with the same
# discrete equations:
#
#   1. tentative velocity (:147): Newton on
#        (ui - u0, v) = dt/rho * rhs_weak(u_theta, v, f_theta, rho, mu, p0)
#      where rhs_weak (:30-144) uses the energy-conserving skew-symmetric
#      convection, the stress form sigma(u,p0) = 2 mu eps(u) - p0 I, and the
#      boundary terms -int p0 n.v ds + mu int (grad u)^T n . v ds;
#   2. pressure Poisson (:258): grad(p).grad(q) = -alpha rho/dt div(u*) q
#        + grad(p0).grad(q) [- mu grad(div u*).grad(q) in rotational form],
#      Dirichlet or singular-consistent pure-Neumann (:366-432);
#   3. velocity correction (:436): (u,v) = (u*,v) - dt/rho (grad phi, v),
#        phi = p1 - p0 (+ mu div u* in rotational form).
#
# TPU-native backend: every substep is a jit-compiled composition of
# batched-einsum assembly (fem/forms.py, fused: one gather + one dof
# summation per residual) and matrix-free Krylov (solvers/krylov.py); Newton
# Jacobian-vector products come from jax.linearize of the residual
# (replacing UFL `derivative(F1, ui)`, reference :202).
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fem import assembly, forms
from ..fem.assembly import geometry, tabulation, BoundaryTab
from ..fem.spaces import FunctionSpace, Function
from ..fem.bc import combine_bcs
from ..fem.interpolate import eval_callable
from ..solvers import krylov
from ..message import Message, info

__all__ = ["Chorin", "IPCS", "Rotational"]

CONV_RULE = assembly.CONV_RULE  # canonical home: fem/assembly.py
F_RULE = 6  # quadrature degree for external force integrals


class _GeomView(NamedTuple):
    """Pytree view of the per-cell Geometry fields the volume forms read
    (detJ [nc], G [nc,d,d], C [nc,d,d]) — lax.map-able chunk slices."""

    detJ: jnp.ndarray
    G: jnp.ndarray
    C: jnp.ndarray


def _increment_form():
    """Pressure/correction solves in increment form (default ON).

    Solving for the increments (phi = p1 - p0, d = u1 - u*) is
    algebraically identical to the full-field systems but makes the
    Krylov stopping test rtol*|b| increment-relative: the full-field
    form's truncation-error floor (rtol x |full field|) acts as a linear
    per-step filter on small-amplitude dynamics — at refine-2 it damped
    the DFG 2D-2 Hopf mode by ~4.7/s (growth +2.57/s), freezing the
    vortex shedding (BENCH_NOTES round-3 exact step-map analysis).
    FLOW_ABS_SOLVES=1 restores the full-field form (A/B)."""
    import os

    return os.environ.get("FLOW_ABS_SOLVES", "") != "1"


def _get_ctx(V: FunctionSpace, Q: FunctionSpace):
    # cached on the velocity space (id()-keyed dicts break after GC)
    ctx = getattr(V, "_ns_ctx", None)
    if ctx is None or ctx.Q is not Q:
        ctx = _Context(V, Q)
        V._ns_ctx = ctx
    return ctx


class _Context:
    """Per-(V, Q) jitted substep solvers (compile once, reuse every step)."""

    # inner-product override for the Krylov solves (None = plain sum-dot);
    # the patch-layout context (navier_stokes/patchctx.py) sets its
    # replica-weighted dot here so the inherited substep solvers run the
    # exact un-replicated iteration
    _cg_dot = None

    def __init__(self, V: FunctionSpace, Q: FunctionSpace):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(V, Q)

    def _build(self, V: FunctionSpace, Q: FunctionSpace):
        self.V = V
        self.Q = Q
        mesh = V.mesh
        self.dim = getattr(mesh, "dim", 2)
        self.geom = geometry(mesh)
        if self.dim == 2:
            self.btab = BoundaryTab(V, rule_degree=6)
            self.btabQ = BoundaryTab(Q, rule_degree=6)
        else:
            from ..fem.assembly import BoundaryFaceTab

            self.btab = BoundaryFaceTab(V, rule_degree=6)
            self.btabQ = BoundaryFaceTab(Q, rule_degree=6)
        dtype = mesh.dtype

        # Diagnostic ablation knobs (scripts/stability_probe.py): drop
        # individual ds-terms of rhs_weak to isolate their effect on the
        # discrete stability of the Schafer-Turek base flow. Default: all on.
        import os

        self._ds_stress = os.environ.get("FLOW_ABLATE_BND_STRESS", "") != "1"
        self._ds_dn = os.environ.get("FLOW_ABLATE_DN", "") != "1"

        geom = self.geom
        ncomp = V.n_components
        # diagonals for Jacobi preconditioning
        self.mass_diag_V = assembly.mass_diag(V, geom)[:, None] * jnp.ones(
            (1, ncomp), dtype=dtype
        )
        self.stiff_diag_V = assembly.stiffness_diag(V, geom)[:, None] * jnp.ones(
            (1, ncomp), dtype=dtype
        )
        self.stiff_diag_Q = assembly.stiffness_diag(Q, geom)
        self.ones_Q = jnp.ones(Q.n_dofs, dtype=dtype)

        # jitted substep drivers
        self._tentative_newton = jax.jit(
            self._tentative_newton_impl,
            static_argnames=("theta_explicit", "maxiter"),
        )
        self._pressure_solve = jax.jit(
            self._pressure_solve_impl, static_argnames=("neumann", "rotational")
        )
        self._velocity_correction = jax.jit(
            self._velocity_correction_impl, static_argnames=("rotational",)
        )

    # ------------------------------------------------------------------
    # Substep 1: tentative velocity (reference :147-255)
    # ------------------------------------------------------------------
    def _rhs_weak_loc(self, Wloc, Fq, rho, mu, Ploc, Tloc=None, geom=None):
        """Local (pre-dof-sum) rhs_weak volume contributions [nc, nl, m].

        Tloc (optional): fixed transport field for the convection term —
        the semi-implicit/lagged linearization (see
        forms.skew_convection_lagged_loc). Default: transport = Wloc
        (full skew nonlinearity, the reference's Newton semantics).

        geom (optional): per-cell geometry view — the cell-chunked
        evaluation passes chunk slices here (default: the full mesh)."""
        V, Q = self.V, self.Q
        if geom is None:
            geom = self.geom
        if Tloc is None:
            loc = -rho * forms.skew_convection_combined_loc(
                V, geom, Wloc, rule_degree=CONV_RULE
            )
        else:
            loc = -rho * forms.skew_convection_lagged_loc(
                V, geom, Tloc, Wloc, rule_degree=CONV_RULE
            )
        loc = loc - forms.sym_grad_loc(V, geom, Wloc, mu)
        loc = loc + forms.pressure_grad_loc(V, Q, geom, Ploc)
        if Fq is not None:
            loc = loc + forms.body_force_loc(V, geom, Fq, rule_degree=F_RULE)
        return loc

    def _rhs_weak_bnd(self, W, P0, rho, mu, T=None):
        """Boundary (ds) contributions of rhs_weak at the dof level.

        T (optional): fixed transport for the directional do-nothing term
        (lagged mode: -0.5 rho (T.n)+ u stays linear in u)."""
        if self.btab is None:
            return None
        bt = self.btab
        geom = self.geom
        p0b = self.btabQ.values(P0)
        val = -p0b[:, :, None] * bt.normals[:, None, :]
        # + mu (grad u)^T n: out_a = sum_m du_m/dx_a n_m
        # (/root/reference/flow/navier_stokes/pressure_correction.py:143,
        # `mu*inner(grad(u).T*normal, v)*ds`)
        if self._ds_stress:
            gw = bt.grads(W, geom)  # [b,q,a,d] = du_a/dx_d
            val = val + mu * jnp.einsum("bqma,bm->bqa", gw, bt.normals)
        # directional do-nothing (Braack & Mucha): the skew-symmetric
        # convection form is the true convective term MINUS the boundary
        # flux 0.5 (w.n)(w.v) ds; restore it where the flow LEAVES
        # ((w.n)+ only), which (a) makes the discrete equations consistent
        # on open outflow boundaries — without it the outlet develops a
        # spurious accelerated layer that grows under refinement (|u| 4.8
        # vs physical 2.2 on DFG 2D-2 at refine-2, and it suppressed the
        # vortex shedding entirely) — and (b) stays energy-stable under
        # backflow by NOT injecting the incoming flux. On Dirichlet facets
        # every facet test dof is masked downstream, so applying it on all
        # facets only acts on open boundaries.
        if self._ds_dn:
            wb = bt.values(W)  # [b,q,m]
            tb = wb if T is None else bt.values(T)
            tn = jnp.einsum("bqm,bm->bq", tb, bt.normals)
            val = val - 0.5 * rho * jnp.maximum(tn, 0.0)[:, :, None] * wb
        return bt.integrate_rhs(val)

    def _volume_loc(
        self, geom, Uiloc, U0loc, Ploc, Tloc, Fq_expl, Fq_impl, rho, mu, dt,
        theta_explicit,
    ):
        """Volume local contributions [nc, nl, m] of the momentum residual:
        mass term + theta-weighted rhs_weak. geom is passed explicitly so
        the chunked path can feed per-chunk geometry slices."""
        V = self.V
        w_ex, w_im = theta_explicit
        loc = forms.mass_loc(V, geom, Uiloc - U0loc)
        if w_ex:
            loc = loc - (dt / rho) * w_ex * self._rhs_weak_loc(
                U0loc, Fq_expl, rho, mu, Ploc, geom=geom
            )
        if w_im:
            loc = loc - (dt / rho) * w_im * self._rhs_weak_loc(
                Uiloc, Fq_impl, rho, mu, Ploc, Tloc=Tloc, geom=geom
            )
        return loc

    def _volume_loc_dispatch(
        self, Uiloc, U0loc, Ploc, Tloc, Fq_expl, Fq_impl, rho, mu, dt,
        theta_explicit,
    ):
        """Whole-mesh or cell-chunked volume evaluation.

        FLOW_CELL_CHUNK=<cells> bounds the quadrature intermediates to one
        chunk at a time via a sequential lax.map — the fix for the 3-D
        large-size HBM OOM: the (nc, nq, dim, nl)-class temps (plus their
        jvp tangent duplicates) dominate HBM at ~1M+ tet cells (measured:
        cavity3d N=48 OOM'd 17.6 G on [663552,3,10] temps, BENCH_NOTES r3
        chain-4/6). Use with FLOW_TANGENT_MODE=jvp: forward-mode
        differentiates the scan chunk-by-chunk, so tangent temps stay
        chunk-sized too (reverse/linearize would store per-chunk primals
        across all chunks and win nothing)."""
        import os

        chunk = int(os.environ.get("FLOW_CELL_CHUNK", "0"))
        nc = Uiloc.shape[0]
        if not chunk or nc <= chunk:
            return self._volume_loc(
                self.geom, Uiloc, U0loc, Ploc, Tloc, Fq_expl, Fq_impl,
                rho, mu, dt, theta_explicit,
            )
        k = -(-nc // chunk)
        pad = k * chunk - nc
        geom = self.geom

        def prep(a):
            if a is None:
                return None
            if pad:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])],
                    axis=0,
                )
            return a.reshape((k, chunk) + a.shape[1:])

        gv = _GeomView(detJ=prep(geom.detJ), G=prep(geom.G), C=prep(geom.C))
        xs = (
            gv, prep(Uiloc), prep(U0loc), prep(Ploc), prep(Tloc),
            prep(Fq_expl), prep(Fq_impl),
        )

        def body(t):
            gvc, ui, u0, p, tl, fe, fi = t
            return self._volume_loc(
                gvc, ui, u0, p, tl, fe, fi, rho, mu, dt, theta_explicit
            )

        loc = jax.lax.map(body, xs)
        loc = loc.reshape((k * chunk,) + loc.shape[2:])
        return loc[:nc] if pad else loc

    def _residual(
        self, Ui, U0, Fq_expl, Fq_impl, P0, rho, mu, dt, theta_explicit,
        transport=None,
    ):
        """F1(ui) = (ui - u0, v) - dt/rho * [theta-weighted rhs_weak].

        Fused evaluation: ONE velocity gather and ONE dof summation cover the
        mass term and every volume term of rhs_weak (the gathers/summations
        are the measured hot-path cost on TPU); the O(surface) boundary terms
        are added at the dof level.

        transport (optional): fixed convection transport field for the
        IMPLICIT terms — the semi-implicit/lagged linearization that makes
        F1 affine in Ui (one linear solve per step, no Newton loop). The
        explicit terms always transport with U0 (already known)."""
        V, Q = self.V, self.Q
        w_ex, w_im = theta_explicit

        Uiloc = V.gather(Ui)
        U0loc = V.gather(U0)
        Ploc = Q.gather(P0)
        Tloc = None if transport is None else V.gather(transport)

        loc = self._volume_loc_dispatch(
            Uiloc, U0loc, Ploc, Tloc, Fq_expl, Fq_impl, rho, mu, dt,
            theta_explicit,
        )
        r = V.dof_sum(loc)

        bnd = None
        if w_ex:
            b = self._rhs_weak_bnd(U0, P0, rho, mu)
            if b is not None:
                bnd = (dt / rho) * w_ex * b
        if w_im:
            b = self._rhs_weak_bnd(Ui, P0, rho, mu, T=transport)
            if b is not None:
                bnd = (bnd if bnd is not None else 0.0) + (dt / rho) * w_im * b
        if bnd is not None:
            r = r - bnd
        return r

    def _tentative_newton_impl(
        self, U0, Fq_expl, Fq_impl, P0, rho, mu, dt, mask, gvals, theta_explicit,
        tol, maxiter=10,
    ):
        free = 1.0 - mask

        def res_bc(x):
            r = self._residual(x, U0, Fq_expl, Fq_impl, P0, rho, mu, dt, theta_explicit)
            return free * r + mask * (x - gvals)

        # Jacobi preconditioner from the mass + viscous diagonal
        w_im = theta_explicit[1]
        diag = self.mass_diag_V + (dt / rho) * w_im * (2.0 * mu) * self.stiff_diag_V
        diag = free * diag + mask

        x0 = free * U0 + mask * gvals  # initial guess u0 with BCs applied (:220)

        def newton_body(state):
            x, rnorm, k = state
            # linearize once per Newton iteration (tangent-only matvecs)
            r, Jv = jax.linearize(res_bc, x)

            dx, _ = krylov.bicgstab(
                Jv, -r, M=lambda t: t / diag, rtol=1e-7, atol=0.05 * tol,
                maxiter=400,
            )
            x = x + dx
            r_new = res_bc(x)
            rnorm = jnp.sqrt(jnp.sum(r_new * r_new))
            return (x, rnorm, k + 1)

        def newton_cond(state):
            _, rnorm, k = state
            return jnp.logical_and(rnorm > tol, k < maxiter)

        r0 = res_bc(x0)
        rnorm0 = jnp.sqrt(jnp.sum(r0 * r0))
        x, rnorm, iters = jax.lax.while_loop(
            newton_cond, newton_body, (x0, rnorm0, jnp.array(0))
        )
        return x, rnorm, iters

    # ------------------------------------------------------------------
    # Substep 2: pressure Poisson (reference :258-433)
    # ------------------------------------------------------------------
    def _pressure_solve_impl(
        self, Ui, P0, alpha, rho, dt, mu, mask, gvals, tol, neumann, rotational
    ):
        V, Q, geom = self.V, self.Q, self.geom
        incr = _increment_form()

        def K(p):
            return assembly.stiffness_apply(Q, geom, p)

        # increment form (default): solve K phi = RHS for phi = p1 - p0
        # instead of K p1 = RHS + K p0 — algebraically identical, but the
        # CG stopping rtol*|b| then measures the increment scale rather
        # than the full field (the full-field truncation floor acts as a
        # per-step filter that damps small-amplitude dynamics — it froze
        # the refine-2 vortex shedding; BENCH_NOTES round-3 step-map
        # analysis). FLOW_ABS_SOLVES=1 restores the full-field form.
        L2 = -(alpha * rho / dt) * forms.div_rhs(V, Q, geom, Ui)
        if not incr:
            L2 = L2 + K(P0)
        if rotational:
            L2 = L2 - mu * forms.grad_div_ustar_rhs(V, Q, geom, Ui)

        diag = jnp.where(self.stiff_diag_Q > 0, self.stiff_diag_Q, 1.0)
        if neumann:
            # singular-consistent pure-Neumann system (:366-432): CG with the
            # constant nullspace projected (replaces BoomerAMG w/ Jacobi
            # coarse relaxation, :414-418)
            p1, sinfo = krylov.cg(
                K,
                L2,
                M=lambda r: r / diag,
                rtol=tol,
                maxiter=1000,
                nullspace=[self.ones_Q],
                dot=self._cg_dot,
            )
        else:
            free = 1.0 - mask

            def K_bc(p):
                return free * K(free * p) + mask * p

            pin = mask * (gvals - P0) if incr else mask * gvals
            rhs = free * (L2 - K(pin)) + pin
            p1, sinfo = krylov.cg(
                K_bc, rhs, M=lambda r: r / (free * diag + mask), rtol=tol,
                maxiter=1000, dot=self._cg_dot,
            )
        if incr:
            p1 = P0 + p1
        return p1, sinfo.iters, sinfo.converged

    # ------------------------------------------------------------------
    # Substep 3: velocity correction (reference :436-465)
    # ------------------------------------------------------------------
    def _velocity_correction_impl(
        self, Ui, P1, P0, rho, mu, dt, mask, gvals, tol, rotational
    ):
        V, Q, geom = self.V, self.Q, self.geom
        phi = P1 - P0
        div_part = None
        if rotational:
            div_part = mu * forms.grad_div_ustar(V, geom, Ui)

        free = 1.0 - mask

        def M_bc(u):
            y = assembly.mass_apply(V, geom, free * u)
            return free * y + mask * u

        diag = free * self.mass_diag_V + mask
        if _increment_form():
            # solve for d = u1 - u*: M d = -(dt/rho) grad(phi) — identical
            # algebra, increment-scale CG stopping (see _pressure_solve_impl)
            L3 = -(dt / rho) * forms.grad_phi_rhs(
                V, Q, geom, phi, div_part=div_part, rule_degree=4
            )
            dmask = mask * (gvals - Ui)
            rhs = free * (L3 - assembly.mass_apply(V, geom, dmask)) + dmask
            d, sinfo = krylov.cg(
                M_bc, rhs, M=lambda r: r / diag, rtol=tol, maxiter=500,
                dot=self._cg_dot,
            )
            return Ui + d, sinfo.iters, sinfo.converged
        L3 = assembly.mass_apply(V, geom, Ui) - (dt / rho) * forms.grad_phi_rhs(
            V, Q, geom, phi, div_part=div_part, rule_degree=4
        )
        rhs = free * (L3 - assembly.mass_apply(V, geom, mask * gvals)) + mask * gvals
        u1, sinfo = krylov.cg(
            M_bc, rhs, M=lambda r: r / diag, rtol=tol, maxiter=500,
            dot=self._cg_dot,
        )
        return u1, sinfo.iters, sinfo.converged


def _eval_f_at_qp(ctx: _Context, f):
    """Evaluate a body force (callable / tuple / Function / dict entry) at the
    F_RULE quadrature points -> [nc, nq, 2]."""
    geom = ctx.geom
    ftab = tabulation(ctx.V, F_RULE)
    if isinstance(f, Function):
        tab_f = tabulation(f.space, F_RULE)
        return assembly.values_at_qp(tab_f, f.space.gather(f.vector))
    xq = geom.physical_points(ftab.ref_pts)
    return eval_callable(f, xq)


def _step(
    dt,
    u,
    p0,
    u_bcs,
    p_bcs,
    rho,
    mu,
    time_step_method,
    f,
    rotational_form=False,
    verbose=True,
    tol=1.0e-10,
    scheme_config=None,
):
    """One projection step; mirrors reference _step (:468-518).

    u: {0: u0} or {-1: u_1, 0: u0} (dict of Functions); p0: Function;
    f: {0: f0, 1: f1}. Returns (u1, p1) Functions.

    scheme_config: optional utils.config.SchemeConfig overriding the Newton
    tolerances/iteration cap (the typed replacement for the reference's
    solver_parameters dicts, :228-254).
    """
    from ..utils.config import SchemeConfig

    cfg = scheme_config or SchemeConfig()
    dt = float(dt)
    rho = float(rho)
    mu = float(mu)
    assert dt > 0.0
    assert mu > 0.0

    u0 = u[0]
    V = u0.space
    Q = p0.space
    ctx = _get_ctx(V, Q)

    # BDF2 (the reference's commented-out scheme, :191-197, realized): with
    # constant dt, (3 u1 - 4 u0 + u_{-1})/(2 dt) = rhs(u1) is algebraically a
    # backward-Euler step from the modified state u_hat = (4 u0 - u_{-1})/3
    # with effective step dt* = 2 dt/3 — so the whole projection machinery
    # (pressure scaling rho/dt*, correction dt*/rho) is reused unchanged.
    # Bootstraps as plain backward Euler when no u[-1] history exists.
    if time_step_method == "bdf2":
        if -1 in u:
            u0 = Function(V, (4.0 * u[0].vector - u[-1].vector) / 3.0)
            dt = 2.0 * dt / 3.0
        time_step_method = "backward euler"

    mask_u, val_u = combine_bcs(V, u_bcs)
    has_p_bcs = bool(p_bcs)
    if has_p_bcs:
        mask_p, val_p = combine_bcs(Q, p_bcs)
    else:
        mask_p = jnp.zeros(Q.n_dofs, dtype=V.mesh.dtype)
        val_p = mask_p

    if time_step_method == "forward euler":
        theta = (1.0, 0.0)
    elif time_step_method == "backward euler":
        theta = (0.0, 1.0)
    else:
        assert time_step_method == "crank-nicolson"
        theta = (0.5, 0.5)
    alpha = 1.0

    Fq0 = _eval_f_at_qp(ctx, f[0]) if theta[0] else jnp.zeros(1)
    Fq1 = _eval_f_at_qp(ctx, f[1]) if theta[1] else jnp.zeros(1)
    if not theta[0]:
        Fq0 = Fq1
    if not theta[1]:
        Fq1 = Fq0

    with Message("Computing tentative velocity"):
        Ui, rnorm, n_newton = ctx._tentative_newton(
            u0.vector, Fq0, Fq1, p0.vector, rho, mu, dt, mask_u, val_u,
            theta_explicit=theta, tol=cfg.newton_tol,
            maxiter=cfg.newton_maxiter,
        )
        rnorm = float(rnorm)
        if verbose:
            info("newton: iters=%d, |r|=%.3e", int(n_newton), rnorm)
        # absolute tolerance (1e-10 default) with error_on_nonconvergence
        # semantics (reference :228-254, :499); small roundoff slack
        if rnorm > 10.0 * cfg.newton_tol:
            raise RuntimeError(
                f"Newton solver did not converge (residual {rnorm:.3e})"
            )

    with Message("Computing pressure"):
        P1, piters, pconv = ctx._pressure_solve(
            Ui,
            p0.vector,
            alpha,
            rho,
            dt,
            mu,
            mask_p,
            val_p,
            tol,
            neumann=not has_p_bcs,
            rotational=rotational_form,
        )
        if verbose:
            info("pressure cg: iters=%d", int(piters))
        if not bool(pconv):
            raise RuntimeError("Pressure Poisson solve did not converge")

    with Message("Computing velocity correction"):
        U1, citers, cconv = ctx._velocity_correction(
            Ui,
            P1,
            p0.vector,
            rho,
            mu,
            dt,
            mask_u,
            val_u,
            tol,
            rotational=rotational_form,
        )
        if verbose:
            info("mass cg: iters=%d", int(citers))
        if not bool(cconv):
            raise RuntimeError("Velocity correction solve did not converge")

    return Function(V, U1), Function(Q, P1)


class Chorin:
    """Non-incremental scheme (discards p0; reference :521-552)."""

    order = {"velocity": 1.0, "pressure": 0.5}

    def __init__(self, scheme_config=None):
        self.scheme_config = scheme_config

    def step(self, dt, u, p0, u_bcs, p_bcs, rho, mu, f, verbose=True, tol=1.0e-10):
        zero_p = Function(p0.space)
        return _step(
            dt, u, zero_p, u_bcs, p_bcs, rho, mu, "backward euler", f,
            verbose=verbose, tol=tol, scheme_config=self.scheme_config,
        )


class IPCS:
    """Incremental pressure-correction scheme (reference :555-584).

    backend: None (einsum context) | "packed" (route through the
    lane-packed patch stepper — needs a refine_uniform-built mesh; raises
    when not representable) | "auto" (packed when possible, else einsum).
    See navier_stokes/packedapi.py."""

    order = {"velocity": 2.0, "pressure": 1.0}

    def __init__(self, time_step_method="backward euler", scheme_config=None,
                 backend=None):
        self.time_step_method = time_step_method
        self.scheme_config = scheme_config
        self.backend = backend

    def step(self, dt, u, p0, u_bcs, p_bcs, rho, mu, f, verbose=True, tol=1.0e-10):
        if self.backend in ("packed", "auto"):
            from .packedapi import try_packed_step
            from ..utils.config import SchemeConfig

            out = try_packed_step(
                dt, u, p0, u_bcs, p_bcs, rho, mu, self.time_step_method, f,
                False, tol, self.scheme_config or SchemeConfig(),
                verbose=verbose, strict=self.backend == "packed",
            )
            if out is not None:
                return out
        return _step(
            dt, u, p0, u_bcs, p_bcs, rho, mu, self.time_step_method, f,
            verbose=verbose, tol=tol, scheme_config=self.scheme_config,
        )


class Rotational:
    """Incremental scheme in rotational form (reference :587-617).

    backend: None | "packed" | "auto" — see IPCS."""

    order = {"velocity": 2.0, "pressure": 1.5}

    def __init__(self, time_step_method="backward euler", scheme_config=None,
                 backend=None):
        self.time_step_method = time_step_method
        self.scheme_config = scheme_config
        self.backend = backend

    def step(self, dt, u, p0, u_bcs, p_bcs, rho, mu, f, verbose=True, tol=1.0e-10):
        if self.backend in ("packed", "auto"):
            from .packedapi import try_packed_step
            from ..utils.config import SchemeConfig

            out = try_packed_step(
                dt, u, p0, u_bcs, p_bcs, rho, mu, self.time_step_method, f,
                True, tol, self.scheme_config or SchemeConfig(),
                verbose=verbose, strict=self.backend == "packed",
            )
            if out is not None:
                return out
        return _step(
            dt, u, p0, u_bcs, p_bcs, rho, mu, self.time_step_method, f,
            rotational_form=True, verbose=verbose, tol=tol,
            scheme_config=self.scheme_config,
        )
