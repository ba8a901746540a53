# Full NS projection step over the dof-partitioned halo-exchange layout
# (parallel/halo_step.py) vs the single-chip reference path, on the 8-way
# virtual CPU mesh.
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import flow_tpu.navier_stokes as navsto
from flow_tpu import (
    unit_square_mesh,
    VectorFunctionSpace,
    FunctionSpace,
    DirichletBC,
    project,
)
from flow_tpu.parallel.halo_step import HaloProjection


@pytest.mark.parametrize("ndev", [2, 8])
def test_halo_step_matches_single_chip(ndev):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = unit_square_mesh(10, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    u0 = project((0.0, 0.0), V)
    p0 = project(0.0, Q)

    hp = HaloProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.1,
        devices=jax.devices()[:ndev], rotational_form=True,
    )
    Up = hp.Vh.to_partitioned(np.asarray(u0.vector))
    Pp = hp.Qh.to_partitioned(np.asarray(p0.vector))
    U1p, P1p = hp.step(Up, Pp, 1e-2)
    U1 = hp.Vh.from_partitioned(U1p)
    P1 = hp.Qh.from_partitioned(P1p)

    u1r, p1r = navsto.Rotational().step(
        1e-2, {0: u0}, p0, u_bcs, [], 1.0, 0.1,
        f={0: (0.0, 0.0), 1: (0.0, 0.0)}, verbose=False,
    )
    # pure-Neumann pressure is defined up to a constant; align means
    P1 = P1 - jnp.mean(P1)
    p1r_v = p1r.vector - jnp.mean(p1r.vector)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(u1r.vector), atol=1e-11)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(p1r_v), atol=1e-10)


@pytest.mark.slow
def test_halo_step_with_pressure_bc():
    mesh = unit_square_mesh(8, diagonal="right")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def inflow(x):
        return x[:, 1] * (1.0 - x[:, 1])

    right = lambda x: x[:, 0] > 1 - 1e-12
    u_bcs = [
        DirichletBC(V.sub(1), 0.0, "on_boundary"),
        DirichletBC(V.sub(0), inflow, lambda x: x[:, 0] < 1e-12),
        DirichletBC(V.sub(0), 0.0, lambda x: (x[:, 1] < 1e-12) | (x[:, 1] > 1 - 1e-12)),
    ]
    p_bcs = [DirichletBC(Q, 0.0, right)]
    u0 = project((0.0, 0.0), V)
    p0 = project(0.0, Q)

    hp = HaloProjection(
        V, Q, u_bcs, p_bcs, rho=1.0, mu=0.05,
        devices=jax.devices()[:4], rotational_form=True,
    )
    Up = hp.Vh.to_partitioned(np.asarray(u0.vector))
    Pp = hp.Qh.to_partitioned(np.asarray(p0.vector))
    U1p, P1p = hp.step(Up, Pp, 5e-3)
    U1 = hp.Vh.from_partitioned(U1p)
    P1 = hp.Qh.from_partitioned(P1p)

    u1r, p1r = navsto.Rotational().step(
        5e-3, {0: u0}, p0, u_bcs, p_bcs, 1.0, 0.05,
        f={0: (0.0, 0.0), 1: (0.0, 0.0)}, verbose=False,
    )
    np.testing.assert_allclose(np.asarray(U1), np.asarray(u1r.vector), atol=1e-11)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(p1r.vector), atol=1e-10)


@pytest.mark.slow
def test_halo_step_with_body_force():
    # stationary non-constant body force through the partitioned path:
    # matches the single-chip stepper to machine precision on 4 devices
    mesh = unit_square_mesh(8, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    u_bcs = [DirichletBC(V, (0.0, 0.0), "on_boundary")]

    fx = lambda x: jnp.sin(3.0 * x[..., 0]) * x[..., 1]
    fy = lambda x: -jnp.exp(-x[..., 1]) * (1.0 + x[..., 0])
    u0 = project((0.0, 0.0), V)
    p0 = project(0.0, Q)

    hp = HaloProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, f=(fx, fy),
        devices=jax.devices()[:4], rotational_form=True,
    )
    Up = hp.Vh.to_partitioned(np.asarray(u0.vector))
    Pp = hp.Qh.to_partitioned(np.asarray(p0.vector))
    U1p, P1p = hp.step(Up, Pp, 1e-2)
    U1 = hp.Vh.from_partitioned(U1p)
    P1 = hp.Qh.from_partitioned(P1p)

    u1r, p1r = navsto.Rotational().step(
        1e-2, {0: u0}, p0, u_bcs, [], 1.0, 0.1,
        f={0: (fx, fy), 1: (fx, fy)}, verbose=False,
    )
    P1 = P1 - jnp.mean(P1)
    p1r_v = p1r.vector - jnp.mean(p1r.vector)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(u1r.vector), atol=1e-11)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(p1r_v), atol=1e-10)


@pytest.mark.slow
def test_halo_lagged_matches_fast_stepper_lagged():
    # distributed semi-implicit (lagged) convection reproduces the
    # single-chip FastStepper(convection="lagged") step bit-near-exactly
    from flow_tpu.navier_stokes.fast import FastStepper

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    mesh = unit_square_mesh(10, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    u0 = project((0.0, 0.0), V)
    p0 = project(0.0, Q)

    hp = HaloProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.1,
        devices=jax.devices()[:4], rotational_form=True,
        convection="lagged", linear_rtol=1e-12, newton_tol=1e-12,
    )
    st = FastStepper(
        V, Q, u_bcs, [], 1.0, 0.1, rotational_form=True,
        convection="lagged", newton_rtol=1e-12, newton_tol=1e-12,
        linear_rtol=1e-12, pressure_rtol=1e-12, correction_rtol=1e-13,
        cfl_target=1e9, dt_max=1.0,
    )
    dt = 1e-2
    Up = hp.Vh.to_partitioned(np.asarray(u0.vector))
    Pp = hp.Qh.to_partitioned(np.asarray(p0.vector))
    # two steps so the second step's transport is a developed field
    for _ in range(2):
        Up, Pp = hp.step(Up, Pp, dt)
    U1 = hp.Vh.from_partitioned(Up)
    P1 = hp.Qh.from_partitioned(Pp)

    U, P = u0.vector, p0.vector
    for _ in range(2):
        U, P, _ = st.step(U, P, jnp.asarray(dt, U.dtype))
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U), atol=2e-10)
    np.testing.assert_allclose(
        np.asarray(P1 - jnp.mean(P1)), np.asarray(P - jnp.mean(P)), atol=2e-9
    )


@pytest.mark.parametrize("convection", ["lagged", "newton"])
def test_halo_winkernel_matches_einsum_halo(monkeypatch, convection):
    # FLOW_WINKERNEL=1: the distributed per-device window-kernel momentum
    # matvec (parallel/halo_win.py) must reproduce the einsum halo step
    # (f32 kernel internals: agreement at f32 accumulation level)
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    mesh = unit_square_mesh(10, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    u0 = project((0.0, 0.0), V)
    p0 = project(0.0, Q)
    kw = dict(
        rho=1.0, mu=0.1, devices=jax.devices()[:4], rotational_form=True,
        convection=convection, linear_rtol=1e-12, newton_tol=1e-10,
    )
    hpE = HaloProjection(V, Q, u_bcs, [], **kw)
    monkeypatch.setenv("FLOW_WINKERNEL", "1")
    hpW = HaloProjection(V, Q, u_bcs, [], **kw)
    assert hpW.winkernel and hpW._win_tabs is not None
    assert not hpE.winkernel

    dt = 1e-2
    UpE = hpE.Vh.to_partitioned(np.asarray(u0.vector))
    PpE = hpE.Qh.to_partitioned(np.asarray(p0.vector))
    UpW, PpW = UpE, PpE
    for _ in range(2):
        UpE, PpE = hpE.step(UpE, PpE, dt)
        UpW, PpW = hpW.step(UpW, PpW, dt)
    UE = hpE.Vh.from_partitioned(UpE)
    UW = hpW.Vh.from_partitioned(UpW)
    PE = hpE.Qh.from_partitioned(PpE)
    PW = hpW.Qh.from_partitioned(PpW)
    np.testing.assert_allclose(np.asarray(UW), np.asarray(UE), atol=3e-6)
    np.testing.assert_allclose(
        np.asarray(PW - jnp.mean(PW)), np.asarray(PE - jnp.mean(PE)),
        atol=2e-4,
    )
