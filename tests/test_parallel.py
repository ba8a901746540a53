# Multi-device tests on the 8-way virtual CPU mesh (conftest sets
# xla_force_host_platform_device_count=8) — the sharded domain-decomposition
# step must agree with the single-chip path to machine precision.
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import flow_tpu
import flow_tpu.navier_stokes as navsto
from flow_tpu import (
    unit_square_mesh,
    VectorFunctionSpace,
    FunctionSpace,
    DirichletBC,
    project,
)
from flow_tpu.parallel import ShardedProjection, partition_cells


@pytest.mark.parametrize("ndev", [1, 4, 8])
def test_sharded_step_matches_single_chip(ndev):
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

    sp = ShardedProjection(
        V, Q, u_bcs, [], rho=1.0, mu=0.1,
        devices=jax.devices()[:ndev], rotational_form=True,
    )
    U1, P1, _ = sp(u0.vector, p0.vector, 1e-2)

    u1r, p1r = navsto.Rotational().step(
        1e-2, {0: u0}, p0, u_bcs, [], 1.0, 0.1,
        f={0: (0.0, 0.0), 1: (0.0, 0.0)}, verbose=False,
    )
    np.testing.assert_allclose(np.asarray(U1), np.asarray(u1r.vector), atol=5e-13)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(p1r.vector), atol=5e-12)


def test_partition_covers_all_cells():
    mesh = unit_square_mesh(7)
    order, n_local = partition_cells(mesh, 8)
    assert sorted(order.tolist()) == list(range(mesh.n_cells))
    assert n_local * 8 >= mesh.n_cells


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_sharded_step_with_body_force_matches_single_chip():
    # hydrostatic balance through the SHARDED step: f = (0, g), p0 = g*y
    from flow_tpu import project
    from flow_tpu.fem.assembly import geometry, tabulation

    mesh = unit_square_mesh(8, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    g = -9.81
    u0 = project((0.0, 0.0), V)
    p0 = project(lambda x: g * x[..., 1], Q)
    u_bcs = [DirichletBC(V, (0.0, 0.0), "on_boundary")]

    sp = ShardedProjection(
        V, Q, u_bcs, [], rho=1.0, mu=1e-3,
        devices=jax.devices()[:4], rotational_form=False, with_force=True,
    )
    geom = geometry(mesh)
    tab = tabulation(V, sp.force_rule)
    xq = geom.physical_points(tab.ref_pts)
    Fq_cells = np.zeros(xq.shape[:2] + (2,))
    Fq_cells[:, :, 1] = g
    Fq = sp.pack_force(Fq_cells)

    U1, P1, _ = sp(u0.vector, p0.vector, 1e-2, Fq=Fq)
    # exact hydrostatic balance preserved at machine precision
    assert float(jnp.abs(U1).max()) < 1e-12
