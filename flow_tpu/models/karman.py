# Karman vortex street: flow past a cylinder — the framework's flagship
# workload (the north-star benchmark of BASELINE.md).
#
# Rebuilds the application driver of
# /root/reference/tests/test_karman_vortex_street.py:56-289 as a reusable
# model: geometry (rectangle with slightly off-center circular obstacle,
# :35-45), parabolic in/outflow with an outlet pressure pin (:128-203),
# Stokes bootstrap (:171-179), Rotational time stepping with smooth CFL-style
# dt adaptation (:219-287) — plus what the reference lacks: drag/lift force
# probes on the cylinder and a Strouhal-number estimate (required by the
# BASELINE.json north-star metric).
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mesh import rectangle_with_hole_mesh, refine_uniform
from ..fem.spaces import VectorFunctionSpace, FunctionSpace, Function
from ..fem.bc import DirichletBC
from ..fem.assembly import geometry, BoundaryTab
from .. import stokes as stokes_mod
from .. import navier_stokes
from ..message import Message, info

__all__ = ["KarmanProblem", "schafer_turek_problem", "run_karman"]

X0, X1 = 0.0, 0.6
Y0, Y1 = -0.07, 0.07
OBSTACLE_DIAMETER = 0.04
OBSTACLE_CENTER = (0.1, 0.01)
ENTRANCE_VELOCITY = 0.01
MESH_EPS = 1.0e-12


class KarmanProblem:
    """Flow past a cylinder in a channel. Defaults reproduce the reference's
    geometry (test_karman_vortex_street.py:35-45); the geometry kwargs also
    express the Schaefer-Turek DFG benchmark (see schafer_turek_problem)."""

    def __init__(
        self,
        lcar=0.1,
        n_refine=0,
        mu=0.002,
        rho=None,
        dtype=None,
        x0=X0,
        x1=X1,
        y0=Y0,
        y1=Y1,
        center=OBSTACLE_CENTER,
        diameter=OBSTACLE_DIAMETER,
        u_in=ENTRANCE_VELOCITY,
        u_ref=None,
        outflow_velocity_bc=True,
        snap=True,
    ):
        self.x0, self.x1, self.y0, self.y1 = x0, x1, y0, y1
        self.center = center
        self.diameter = diameter
        self.u_in = u_in
        # reference velocity for force coefficients (DFG convention: the MEAN
        # inflow velocity; the reference geometry historically used the peak)
        self.u_ref = u_ref if u_ref is not None else u_in
        cx, cy = center
        r = 0.5 * diameter
        mesh = rectangle_with_hole_mesh(
            x0, x1, y0, y1, cx=cx, cy=cy, r=r, lcar=lcar, dtype=dtype
        )

        def snap_fn(p):
            th = np.arctan2(p[:, 1] - cy, p[:, 0] - cx)
            d = np.linalg.norm(p - [cx, cy], axis=1)
            on_circ = np.abs(d - r) < 0.3 * r
            out = p.copy()
            out[on_circ] = np.stack(
                [cx + r * np.cos(th[on_circ]), cy + r * np.sin(th[on_circ])], 1
            )
            return out

        # snap=False keeps refined boundary midpoints on the coarse polygon
        # (diagnostic: separates curved-geometry effects from the PDE
        # discretization under refinement — scripts/stability_probe.py)
        self.mesh_hierarchy = [mesh]
        for _ in range(n_refine):
            mesh = refine_uniform(mesh, snap_boundary=snap_fn if snap else None)
            self.mesh_hierarchy.append(mesh)

        self.mesh = mesh
        self.mu = mu
        from .. import materials

        self.rho = rho if rho is not None else float(
            materials.water.density(T=293.0)
        )
        self.V = VectorFunctionSpace(mesh, 2)
        self.Q = FunctionSpace(mesh, 1)
        self.WP = stokes_mod.TaylorHood(mesh, V=self.V, Q=self.Q)

        # boundary predicates (reference :70-97)
        left = lambda x: x[:, 0] < x0 + MESH_EPS
        right = lambda x: x[:, 0] > x1 - MESH_EPS
        lower = lambda x: x[:, 1] < y0 + MESH_EPS
        upper = lambda x: x[:, 1] > y1 - MESH_EPS
        obstacle = lambda x: (
            (x[:, 0] > x0 + MESH_EPS)
            & (x[:, 0] < x1 - MESH_EPS)
            & (x[:, 1] > y0 + MESH_EPS)
            & (x[:, 1] < y1 - MESH_EPS)
        )

        # parabolic in/outflow (reference :128-137); u_in is the PEAK value
        def profile(x):
            return (
                u_in
                * (y1 - x[:, 1])
                * (x[:, 1] - y0)
                / (0.5 * (y1 - y0)) ** 2
            )

        V = self.V
        self.u_bcs = [
            DirichletBC(V, (0.0, 0.0), upper),
            DirichletBC(V, (0.0, 0.0), lower),
            DirichletBC(V, (0.0, 0.0), obstacle),
            DirichletBC(V.sub(0), profile, left),
        ]
        if outflow_velocity_bc:
            # reference semantics: prescribe the parabolic profile at the
            # outlet too (:136-137). Schaefer-Turek uses an open outflow.
            self.u_bcs.append(DirichletBC(V.sub(0), profile, right))
        # outlet pressure pin for the projection steps (reference :201-203)
        self.p_bcs = [DirichletBC(self.Q, 0.0, right)]

        # probe machinery: obstacle facets of the boundary tabulations
        self.obstacle_predicate = obstacle
        self.btabV = BoundaryTab(self.V, rule_degree=4)
        self.btabQ = BoundaryTab(self.Q, rule_degree=4)
        mids = self.btabV.x_np.mean(axis=1)  # [nb, 2] facet qp centroid
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self.obstacle_facets = jnp.asarray(
                np.asarray(obstacle(mids), dtype=np.float64), dtype=mesh.dtype
            )

        self.reynolds = self.u_ref * diameter * self.rho / mu

    def stokes_bootstrap(self, tol=1.0e-13, max_iter=10000):
        """Initial (u0, p0) from steady Stokes (reference :171-179)."""
        u0, p0 = stokes_mod.solve(
            self.WP,
            self.u_bcs,  # p_bcs NOT pinned in the bootstrap, as in reference
            self.mu,
            f=(0.0, 0.0),
            verbose=False,
            tol=tol,
            max_iter=max_iter,
        )
        return u0, p0

    def forces(self, u: Function, p: Function):
        """Drag and lift: F = oint_cyl [ -p I + mu (grad u + grad u^T) ] n ds
        with n the body-outward normal (= minus the fluid-domain facet
        normal). Returns (F_x, F_y) as floats. (New capability beyond the
        reference — needed for the drag/lift/Strouhal north-star metric.)"""
        geom = geometry(self.mesh)
        bt = self.btabV
        gu = bt.grads(u.vector, geom)  # [nb, q, m, d]
        pb = self.btabQ.values(p.vector)  # [nb, q]
        n = -bt.normals  # body-outward [nb, 2]
        sig = self.mu * (gu + gu.transpose(0, 1, 3, 2))  # [nb,q,i,j]
        tvec = jnp.einsum("bqij,bj->bqi", sig, n) - pb[:, :, None] * n[:, None, :]
        F = jnp.einsum("bqi,bq,b->i", tvec, bt.wl, self.obstacle_facets)
        return float(F[0]), float(F[1])

    def consistent_force_probe(self):
        """Variationally-consistent (residual-functional) force probe on the
        cylinder — superconvergent and f32-robust, unlike the boundary
        traction integral whose gradient cancellation produced the round-1
        |Cd|>20 spikes at the reference geometry's u ~ 0.01 velocities."""
        from ..navier_stokes.forces import ConsistentForceProbe

        # FLOW_FORCE_RULE: quadrature-degree knob for the Cd_max audit
        # (VERDICT r04: the stage-3 +0.22% corridor offset is attributed to
        # probe/outflow discretization, not resolution)
        import os as _os

        rule = int(_os.environ.get("FLOW_FORCE_RULE", "5"))
        return ConsistentForceProbe(
            self.V, self.Q, self.obstacle_predicate, self.rho, self.mu,
            rule_degree=rule,
        )

    def drag_lift_coefficients(self, u, p):
        fx, fy = self.forces(u, p)
        scale = 0.5 * self.rho * self.u_ref**2 * self.diameter
        return fx / scale, fy / scale

    @property
    def force_scale(self):
        return 0.5 * self.rho * self.u_ref**2 * self.diameter


def schafer_turek_problem(lcar=0.03, n_refine=2, dtype=None, snap=True):
    """DFG 2D-2 benchmark (Schaefer & Turek 1996): channel 2.2 x 0.41,
    cylinder d=0.1 at (0.2, 0.2), parabolic inflow Um=1.5 (mean 1.0),
    mu=0.001, rho=1 -> Re=100. Published values: St ~ 0.300, Cd ~ 3.22-3.24,
    Cl amplitude ~ 1.0. Open outflow (pressure pinned at the outlet) —
    the quantitative validation target for the force/Strouhal probes."""
    Um = 1.5
    return KarmanProblem(
        lcar=lcar,
        n_refine=n_refine,
        mu=0.001,
        rho=1.0,
        dtype=dtype,
        x0=0.0,
        x1=2.2,
        y0=0.0,
        y1=0.41,
        center=(0.2, 0.2),
        diameter=0.1,
        u_in=Um,
        u_ref=2.0 * Um / 3.0,
        outflow_velocity_bc=False,
        snap=snap,
    )


def run_karman(
    num_steps=2,
    lcar=0.1,
    n_refine=0,
    mu=0.002,
    dt0=1.0e-5,
    dt_max=1.0,
    collect_forces=False,
    verbose=False,
    writer=None,
):
    """Time-stepping driver mirroring reference test_karman (:56-289):
    Stokes bootstrap -> Rotational steps with smooth CFL dt adaptation.

    Returns a dict with final state and time series (t, dt, forces)."""
    problem = KarmanProblem(lcar=lcar, n_refine=n_refine, mu=mu)
    if verbose:
        info("Reynolds number:  %e", problem.reynolds)

    with Message("Stokes bootstrap"):
        u0, p0 = problem.stokes_bootstrap()

    stepper = navier_stokes.Rotational()
    rho = problem.rho
    dt = dt0
    t = 0.0
    times, dts, forces = [], [], []

    for k in range(num_steps):
        u1, p1 = stepper.step(
            dt,
            {0: u0},
            p0,
            problem.u_bcs,
            problem.p_bcs,
            rho,
            problem.mu,
            f={0: (0.0, 0.0), 1: (0.0, 0.0)},
            verbose=False,
            tol=1.0e-10,
        )
        u0, p0 = u1, p1
        t += dt
        if collect_forces:
            forces.append(problem.forces(u0, p0))
        times.append(t)
        dts.append(dt)
        if writer is not None:
            writer.write(u0.rename("velocity"), t)
            writer.write(p0.rename("pressure"), t)

        # smooth CFL-style step-size adaptation (reference :261-287)
        umag = jnp.sqrt(jnp.sum(u0.vector**2, axis=1))
        unorm = float(jnp.max(umag))
        target_dt = 1.0 * problem.mesh.hmax / max(unorm, 1e-30)
        alpha = 0.5
        dt = min(dt_max, dt * min(2.0, 1.0 + alpha * (target_dt - dt) / dt))
        if verbose:
            info("step %d: t=%.4e dt->%.4e |u|_inf=%.4e", k + 1, t, dt, unorm)

    return {
        "problem": problem,
        "u": u0,
        "p": p0,
        "t": np.array(times),
        "dt": np.array(dts),
        "forces": np.array(forces) if forces else None,
    }


def run_karman_fast(
    num_steps=100,
    lcar=0.02,
    n_refine=2,
    mu=0.002,
    dt0=1.0e-4,
    dt_max=1.0,
    cfl_target=1.0,
    use_multigrid=True,
    newton_rtol=1.0e-3,
    newton_maxiter=3,
    linear_rtol=1.0e-4,
    ew_forcing=False,
    pressure_rtol=1.0e-4,
    correction_rtol=1.0e-5,
    from_rest=True,
    chunk_size=100,
    checkpoint_path=None,
    resume=False,
    progress=False,
    problem=None,
    initial_state=None,
    time_step_method="backward euler",
    force_probe="consistent",
    convection="newton",
    backend="fast",
):
    """High-throughput Karman driver: the whole simulation is ONE compiled
    lax.scan (FastStepper) with on-device CFL dt control, multigrid-
    preconditioned pressure solves and per-step drag/lift telemetry.

    This is the benchmark entry (bench.py) and the path for long
    vortex-shedding runs (Strouhal extraction). Pass `problem=` (e.g.
    schafer_turek_problem(...)) to run a different channel geometry."""
    from ..navier_stokes.fast import FastStepper

    if problem is None:
        problem = KarmanProblem(lcar=lcar, n_refine=n_refine, mu=mu)

    if force_probe == "consistent":
        # residual-functional probe: superconvergent, f32-robust (the
        # traction probe spikes at reference-geometry velocities)
        forces_probe = problem.consistent_force_probe()
    else:
        assert force_probe == "traction"

        def forces_probe(U, P):
            # boundary traction integral (jit-safe, returns a length-2 array)
            geom = geometry(problem.mesh)
            bt = problem.btabV
            gu = bt.grads(U, geom)
            pb = problem.btabQ.values(P)
            n = -bt.normals
            sig = problem.mu * (gu + gu.transpose(0, 1, 3, 2))
            tvec = jnp.einsum("bqij,bj->bqi", sig, n) - pb[:, :, None] * n[:, None, :]
            return jnp.einsum("bqi,bq,b->i", tvec, bt.wl, problem.obstacle_facets)

    packed = backend == "packed"
    if packed:
        # lane-packed patch stepper (navier_stokes/patchfast.py): the
        # round-4 hot path — lagged-convection BE/BDF2 only, needs the
        # refinement hierarchy; state lives packed for the whole run
        assert convection == "lagged", "packed backend is lagged-only"
        assert len(problem.mesh_hierarchy) > 1, "packed backend needs refine"
        from ..fem.patch import build_patch_info
        from ..navier_stokes.patchfast import PackedPatchStepper

        info = build_patch_info(problem.mesh_hierarchy)
        stepper = PackedPatchStepper(
            problem.V,
            problem.Q,
            problem.u_bcs,
            problem.p_bcs,
            problem.rho,
            problem.mu,
            info,
            time_step_method=time_step_method,
            newton_tol=0.0,
            newton_rtol=newton_rtol,
            linear_rtol=linear_rtol,
            pressure_rtol=pressure_rtol,
            correction_rtol=correction_rtol,
            cfl_target=cfl_target,
            dt_max=dt_max,
            forces_probe=forces_probe,
        )
    else:
        stepper = FastStepper(
            problem.V,
            problem.Q,
            problem.u_bcs,
            problem.p_bcs,
            problem.rho,
            problem.mu,
            time_step_method=time_step_method,
            rotational_form=True,
            convection=convection,
            newton_tol=0.0,
            newton_rtol=newton_rtol,
            newton_maxiter=newton_maxiter,
            linear_rtol=linear_rtol,
            ew_forcing=ew_forcing,
            pressure_rtol=pressure_rtol,
            correction_rtol=correction_rtol,
            cfl_target=cfl_target,
            dt_max=dt_max,
            forces_probe=forces_probe,
        )
    if not packed and use_multigrid and n_refine > 0:
        from ..solvers.multigrid import P1Hierarchy

        hier = P1Hierarchy(
            problem.mesh_hierarchy, bc_mask=stepper.mask_p, smoother_degree=3
        )
        stepper.pressure_precond = hier.v_cycle

    if initial_state is not None:
        U, P = initial_state  # e.g. a perturbed state to trigger shedding
        if packed and U.shape[0] == problem.V.n_dofs:
            U, P = stepper.to_packed_state(U, P)
    elif from_rest:
        if packed:
            U, P = stepper.zeros()
        else:
            U = problem.V.zeros()
            P = problem.Q.zeros()
    else:
        u0, p0 = problem.stokes_bootstrap(tol=1.0e-6, max_iter=2000)
        U, P = u0.vector, p0.vector
        if packed:
            U, P = stepper.to_packed_state(U, P)

    # checkpoint/resume of (U, P, dt) — SURVEY.md §5.4 (capability the
    # reference lacks entirely); written after every chunk. BDF2 segments
    # additionally carry (Um1, dt_prev) so chained runs stay second-order.
    Um1, dtp = None, None
    if resume and checkpoint_path:
        import os as _os

        if _os.path.exists(checkpoint_path):
            from ..io import load_checkpoint

            arrays, scalars = load_checkpoint(checkpoint_path, dtype=U.dtype)
            U, P = arrays["U"], arrays["P"]
            dt0 = scalars["dt"]
            if stepper.bdf2 and "Um1" in arrays:
                Um1 = arrays["Um1"]
                dtp = jnp.asarray(scalars["dtp"], dtype=U.dtype)
            if packed and U.shape[0] == problem.V.n_dofs:
                # resume a global-layout (einsum-era) checkpoint into the
                # packed run: one-time conversion gathers
                U, P = stepper.to_packed_state(U, P)
                if Um1 is not None:
                    Um1 = stepper.pack_vec(Um1)

    # chunked execution: one compiled scan program of `chunk` steps, reused
    # for arbitrarily long runs (scan length is a static shape; keep single
    # executions under ~10 s — longer on-device programs have tripped the
    # axon tunnel's worker watchdog)
    chunk = min(num_steps, chunk_size)
    n_chunks, rem = divmod(num_steps, chunk)
    dt = jnp.asarray(dt0, dtype=U.dtype)
    tels = []

    def _save():
        if checkpoint_path:
            from ..io import save_checkpoint

            if packed:
                # checkpoints stay GLOBAL-layout: backend-portable (seed
                # prolongation, einsum resumes, analysis scripts)
                Ug, Pg = stepper.from_packed_state(U, P)
                arrays = {"U": Ug, "P": Pg}
                scalars = {"dt": float(dt)}
                if stepper.bdf2 and Um1 is not None:
                    Um1g, _ = stepper.from_packed_state(Um1, P)
                    arrays["Um1"] = Um1g
                    scalars["dtp"] = float(dtp)
            else:
                arrays = {"U": U, "P": P}
                scalars = {"dt": float(dt)}
                if stepper.bdf2 and Um1 is not None:
                    arrays["Um1"] = Um1
                    scalars["dtp"] = float(dtp)
            save_checkpoint(checkpoint_path, arrays, scalars)

    def _run_chunk(n):
        nonlocal U, P, dt, Um1, dtp
        # dt_max rides along as a TRACED scalar: dt-cap sweeps (e.g. the
        # shedding dt-ladder) reuse the compiled scan program
        if stepper.bdf2:
            U, P, dt, tel, (Um1, dtp) = stepper.run(
                U, P, dt, n_steps=n, Um1=Um1, dtp0=dtp, dt_max=dt_max
            )
        else:
            U, P, dt, tel = stepper.run(U, P, dt, n_steps=n, dt_max=dt_max)
        return tel

    import time as _time

    _t0 = _time.time()
    for _ci in range(n_chunks):
        tel = _run_chunk(chunk)
        tels.append({k: np.asarray(v) for k, v in tel.items()})
        _save()
        if progress:
            done = (_ci + 1) * chunk
            print(
                f"  chunk {_ci + 1}/{n_chunks}: {done} steps, "
                f"{done / (_time.time() - _t0):.2f} steps/s, dt={float(dt):.4f}",
                flush=True,
            )
    if rem:
        tel = _run_chunk(rem)
        tels.append({k: np.asarray(v) for k, v in tel.items()})
        _save()
    telemetry = {
        k: np.concatenate([t[k] for t in tels]) for k in tels[0]
    }
    # the scan's time carry restarts at 0 in each chunk call; reconstruct
    # the global time axis from the per-step dt series
    telemetry["t"] = np.cumsum(telemetry["dt"])
    if packed:
        U, P = stepper.from_packed_state(U, P)
    return {
        "problem": problem,
        "stepper": stepper,
        "u": Function(problem.V, U).rename("velocity"),
        "p": Function(problem.Q, P).rename("pressure"),
        "dt": float(dt),
        "t": telemetry["t"],
        "forces": telemetry["forces"],
        "telemetry": telemetry,
    }


def strouhal_number(
    t, lift, min_periods=3, diameter=OBSTACLE_DIAMETER, u_ref=ENTRANCE_VELOCITY
):
    """Estimate the Strouhal number St = f d / U from a lift time series
    (uniformly resampled + dominant FFT frequency). diameter/u_ref default
    to the reference geometry; pass problem.diameter/problem.u_ref for
    other channels (e.g. Schaefer-Turek)."""
    t = np.asarray(t, dtype=float)
    lift = np.asarray(lift, dtype=float)
    tu = np.linspace(t[0], t[-1], 4 * len(t))
    lu = np.interp(tu, t, lift - lift.mean())
    freqs = np.fft.rfftfreq(len(tu), d=tu[1] - tu[0])
    amp = np.abs(np.fft.rfft(lu))
    amp[0] = 0.0
    f = freqs[int(np.argmax(amp))]
    if f * (t[-1] - t[0]) < min_periods:
        return None  # series too short to resolve shedding
    return f * diameter / u_ref
