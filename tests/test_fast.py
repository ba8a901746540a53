# FastStepper (fused one-program projection step + scan loop): equivalence
# with the reference-path stepper, scan telemetry, and vmap batching (the
# "batched-problem parallelism" of SURVEY.md §2.3 item 2).
import numpy as np
import jax
import jax.numpy as jnp

import flow_tpu
import flow_tpu.navier_stokes as navsto
from flow_tpu import (
    unit_square_mesh,
    VectorFunctionSpace,
    FunctionSpace,
    DirichletBC,
    project,
)
from flow_tpu.navier_stokes.fast import FastStepper


def _cavity(n=10):
    mesh = unit_square_mesh(n, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    return mesh, V, Q, u_bcs


def test_fast_step_matches_reference_path():
    mesh, V, Q, u_bcs = _cavity()
    u0 = project((0.0, 0.0), V)
    p0 = project(0.0, Q)
    st = FastStepper(V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=True)
    U1, P1, stats = st.step(u0.vector, p0.vector, jnp.asarray(1e-2))
    u1r, p1r = navsto.Rotational().step(
        1e-2, {0: u0}, p0, u_bcs, [], 1.0, 0.1,
        f={0: (0.0, 0.0), 1: (0.0, 0.0)}, verbose=False,
    )
    np.testing.assert_allclose(np.asarray(U1), np.asarray(u1r.vector), atol=1e-12)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(p1r.vector), atol=1e-11)


def test_fast_run_scan_telemetry():
    mesh, V, Q, u_bcs = _cavity(8)
    st = FastStepper(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=False,
        forces_probe=lambda U, P: jnp.sum(U * U),
    )
    U, P, dt, tel = st.run(V.zeros(), Q.zeros(), jnp.asarray(1e-3), n_steps=4)
    assert tel["t"].shape == (4,)
    assert np.all(np.diff(np.asarray(tel["t"])) > 0)
    assert np.isfinite(np.asarray(tel["forces"])).all()
    assert float(dt) > 0


def test_fast_step_vmap_batched_problems():
    # vmap the whole projection step over a batch of initial states: the
    # idiomatic-JAX replacement for the reference's serial (mesh x dt) sweep
    mesh, V, Q, u_bcs = _cavity(6)
    st = FastStepper(V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=True)

    rng = np.random.default_rng(0)
    batch = 3
    U0 = jnp.zeros((batch, V.n_dofs, 2))
    P0 = jnp.asarray(rng.standard_normal((batch, Q.n_dofs)) * 1e-3)
    dts = jnp.asarray([1e-3, 2e-3, 4e-3])

    batched = jax.jit(jax.vmap(st._step_impl, in_axes=(0, 0, 0)))
    U1, P1, stats = batched(U0, P0, dts)
    assert U1.shape == (batch, V.n_dofs, 2)

    # each batch element equals the corresponding unbatched solve
    for b in range(batch):
        U1b, P1b, _ = st.step(U0[b], P0[b], dts[b])
        np.testing.assert_allclose(np.asarray(U1[b]), np.asarray(U1b), atol=1e-10)


def test_fast_run_divergence_probe():
    mesh, V, Q, u_bcs = _cavity(6)
    st = FastStepper(
        V, Q, u_bcs, [], rho=1.0, mu=0.1, rotational_form=False,
        divergence_probe=True,
    )
    U, P, dt, tel = st.run(V.zeros(), Q.zeros(), jnp.asarray(1e-3), n_steps=3)
    dn = np.asarray(tel["div_norm"])
    assert dn.shape == (3,)
    assert np.isfinite(dn).all() and (dn >= 0).all()
