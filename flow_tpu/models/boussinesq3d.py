# 3-D buoyancy-driven cavity (Rayleigh-Benard-style box) — the scaled-up
# target of BASELINE.json config 5 ("3-D buoyancy cavity, 50M DoF,
# mesh-partitioned"). New capability beyond the 2-D-only reference; the
# coupling loop mirrors the 2-D driver (models/boussinesq.py: Banach
# fixed-point over (u, theta), dt backoff on solver failure, Banach-count dt
# controller — /root/reference/tests/test_boussinesq.py:202-363).
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mesh3d import box_mesh
from ..fem.spaces import VectorFunctionSpace, FunctionSpace, Function
from ..fem.bc import DirichletBC
from ..fem.interpolate import project
from .. import navier_stokes, heat, parabolic, materials
from ..message import Message, info, begin, end

__all__ = ["compute_boussinesq_3d"]

X1, Y1, Z1 = 0.1, 0.1, 0.2
MESH_EPS = 1.0e-9


def _hot(x):
    # heated floor patch (center half of the bottom face)
    return (
        (x[:, 2] < MESH_EPS)
        & (np.abs(x[:, 0] - 0.5 * X1) < 0.25 * X1)
        & (np.abs(x[:, 1] - 0.5 * Y1) < 0.25 * Y1)
    )


def _cool(x):
    return x[:, 2] > Z1 - MESH_EPS


def compute_boussinesq_3d(
    target_time=0.1,
    n=(8, 8, 16),
    supg=False,
    dt0=1.0e-2,
    dt_max=1.0,
    heat_degree=2,
    n_refine=0,
    backend=None,
):
    """Run the coupled 3-D simulation; returns (u1, p1, theta1).

    n_refine > 0 builds the box as coarse(n) + refine_uniform_tet^r — the
    scaled configuration (BASELINE configs[4]); the chain feeds the
    on-device multigrid heat solve (flow_tpu.heat solver='mg').

    backend="packed": route the NS step through the box-packed stepper
    (navier_stokes/boxfast.py — constant-geometry window stencils; Picard
    to the public Newton contract; nodal buoyancy) — requires n_refine=0
    (the box grid itself) and heat_degree=2 (the buoyancy lives on V's
    scalar P2 numbering). Equivalence pinned in
    tests/test_boussinesq3d_packed.py."""
    use_packed = backend in ("packed", "auto") and n_refine == 0
    if backend == "packed":
        assert n_refine == 0 and heat_degree == 2, (
            "box-packed backend: n_refine=0 (the structured grid) and "
            "P2 temperature"
        )
    mesh = box_mesh((0.0, 0.0, 0.0), (X1, Y1, Z1), *n)
    mesh_hierarchy = [mesh]
    for _ in range(n_refine):
        from ..mesh3d import refine_uniform_tet

        mesh = refine_uniform_tet(mesh)
        mesh_hierarchy.append(mesh)
    heat_hierarchy = mesh_hierarchy if n_refine > 0 else None

    room_temp = 293.0
    max_heater_temp = 320.0
    g_const = -9.81

    rho = materials.water.density
    mu = float(materials.water.dynamic_viscosity(room_temp))
    cp = materials.water.specific_heat_capacity
    kappa = materials.water.thermal_conductivity

    V = VectorFunctionSpace(mesh, 2, n_components=3)
    P = FunctionSpace(mesh, 1)
    Q = FunctionSpace(mesh, heat_degree)

    theta0 = project(room_temp, Q).rename("temperature")
    u0 = project((0.0, 0.0, 0.0), V).rename("velocity")
    rho_room = float(rho(room_temp))
    p0 = project(lambda x: rho_room * g_const * x[..., 2], P).rename("pressure")

    u_bcs = [DirichletBC(V, (0.0, 0.0, 0.0), "on_boundary")]
    p_bcs = []

    t = 0.0
    dt = dt0
    u1, p1, theta1 = u0, p0, theta0

    while t < target_time + 1.0e-14:
        begin("3D time step %e -> %e..." % (t, t + dt))
        t1 = 30.0
        heater_temp = room_temp + min(1.0, t / t1) * (max_heater_temp - room_temp)

        u_prev = u0.copy()
        theta_prev = theta0.copy()
        banach_step = 0
        failed = False
        while True:
            banach_step += 1
            if banach_step > 10:
                info("Banach failed; dt %e -> %e" % (dt, 0.25 * dt))
                dt *= 0.25
                failed = True
                break
            with Message("heat step"):
                heat_bcs = [
                    DirichletBC(Q, heater_temp, _hot),
                    DirichletBC(Q, room_temp, _cool),
                ]
                op = heat.Heat(
                    Q,
                    u_prev,
                    float(kappa(room_temp)),
                    float(rho(room_temp)),
                    float(cp(room_temp)),
                    heat_bcs,
                    0.0,
                    supg_stabilization=supg,
                    mesh_hierarchy=heat_hierarchy,
                )
                theta1 = parabolic.ImplicitEuler(op).step(theta0, t, dt)

            with Message("navier-stokes step"):
                rho_vals = jnp.asarray(
                    np.asarray(rho(np.asarray(theta_prev.vector))),
                    dtype=theta_prev.vector.dtype,
                )
                rho_theta = Function(theta_prev.space, rho_vals)

                def buoy(x, rho_theta=rho_theta):
                    from ..fem import assembly
                    from ..navier_stokes.pressure_correction import F_RULE

                    tab = assembly.tabulation(rho_theta.space, F_RULE)
                    vals = assembly.values_at_qp(
                        tab, rho_theta.space.gather(rho_theta.vector)
                    )
                    zeros = jnp.zeros_like(vals)
                    return jnp.stack([zeros, zeros, vals * g_const], axis=-1)

                try:
                    if use_packed:
                        u1, p1 = _packed_ns_step(
                            V, P, u_bcs, float(rho(room_temp)), mu,
                            dt, u0, p0, rho_theta, g_const,
                        )
                    else:
                        u1, p1 = navier_stokes.Rotational().step(
                            dt, {0: u0}, p0, u_bcs, p_bcs,
                            float(rho(room_temp)), mu,
                            f={0: buoy, 1: buoy}, verbose=False,
                            tol=1.0e-10,
                        )
                except RuntimeError:
                    info("NS failed; dt %e -> %e" % (dt, 0.5 * dt))
                    dt *= 0.5
                    failed = True
                    break

            u_diff = float(jnp.max(jnp.sum(jnp.abs(u1.vector - u_prev.vector), axis=1)))
            th_diff = float(jnp.max(jnp.abs(theta1.vector - theta_prev.vector)))
            u_prev, theta_prev = u1.copy(), theta1.copy()
            if u_diff < 1.0e-1 and th_diff < 1.0e-1:
                break

        end()
        if failed:
            continue

        theta0, u0, p0 = theta1, u1, p1
        target_dt = dt * 5.0 / banach_step
        dt = min(dt_max, dt * min(2.0, 1.0 + 0.5 * (target_dt - dt) / dt))
        t += dt

    return u1, p1, theta1


def _packed_ns_step(V, P, u_bcs, rho_const, mu, dt, u0, p0, rho_theta,
                    g_const):
    """One Rotational projection step through the box-packed stepper with
    the nodal buoyancy rho(theta) g e_z (public Newton contract via
    Picard; RuntimeError semantics drive the caller's dt backoff)."""
    from ..navier_stokes.boxfast import BoxPackedStepper

    cache = getattr(V, "_box_b3d_cache", None)
    key = (id(P), tuple(id(b) for b in u_bcs), rho_const, mu)
    if cache is None or cache[0] != key:
        st = BoxPackedStepper(
            V, P, u_bcs, [], rho_const, mu,
            newton_tol=1.0e-10, picard_maxiter=10, picard_tol=1.0e-10,
            linear_rtol=1.0e-4, pressure_rtol=1.0e-10,
            correction_rtol=1.0e-10,
        )
        V._box_b3d_cache = (key, st)
    else:
        st = cache[1]
    f = jnp.stack(
        [
            jnp.zeros_like(rho_theta.vector),
            jnp.zeros_like(rho_theta.vector),
            rho_theta.vector * g_const,
        ],
        axis=-1,
    )
    Uf, Pf = st.to_packed_state(u0.vector, p0.vector)
    Ff = st.pack_vec(f)
    U1f, P1f, stats = st.step_api(Uf, Pf, dt, Ff)
    nres = float(stats.newton_res)
    if nres > 10.0 * 1.0e-10:
        raise RuntimeError(
            f"Newton solver did not converge (residual {nres:.3e})"
        )
    if not bool(stats.pressure_converged):
        raise RuntimeError("Pressure Poisson solve did not converge")
    if not bool(stats.correction_converged):
        raise RuntimeError("Velocity correction solve did not converge")
    U1, P1 = st.from_packed_state(U1f, P1f)
    return Function(V, U1), Function(P, P1)
