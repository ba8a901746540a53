# Distributed packed-patch stepper (parallel/packed_shard.py): the sharded
# step over 8 virtual CPU devices must be ITERATE-EXACT vs the
# single-device PackedPatchStepper (itself pinned vs the einsum path in
# test_patchfast.py) — same Krylov iteration counts, state parity to 1e-8.
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flow_tpu.mesh import unit_square_mesh, refine_uniform
from flow_tpu.fem.patch import build_patch_info
from flow_tpu.parallel.packed_shard import ShardedPackedStepper

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

TIGHT = dict(
    newton_tol=1e-12, newton_rtol=0.0, pressure_rtol=1e-11,
    correction_rtol=1e-11, momentum_solver="gmres", mg_smoother_degree=3,
)


def _parity(sh, U0, P0, dt, n_run=3):
    base = sh.base
    Uf, Pf = base.zeros()
    U1f, P1f, std = base.step(Uf, Pf, jnp.asarray(dt, dtype=U0.dtype))
    U1b, P1b = base.from_packed_state(U1f, P1f)

    Us, Ps = sh.to_sharded(U0, P0)
    U1s, P1s, sts = sh.step(Us, Ps, dt)
    U1g, P1g = sh.from_sharded(U1s, P1s)

    np.testing.assert_allclose(np.asarray(U1g), np.asarray(U1b), atol=1e-8)
    # pressure may carry a nullspace constant in the pure-Neumann case
    d = np.asarray(P1g) - np.asarray(P1b)
    d = d - d.mean()
    np.testing.assert_allclose(d, 0.0 * d, atol=1e-8)
    assert int(sts.linear_iters) == int(std.linear_iters)
    assert int(sts.pressure_iters) == int(std.pressure_iters)
    assert int(sts.correction_iters) == int(std.correction_iters)

    # fused scan loop with the CFL controller: dt trajectories must agree
    U3f, P3f, dtb, _ = base.run(Uf, Pf, 1e-3, n_steps=n_run)
    U3s, P3s, dts, tel = sh.run(Us, Ps, 1e-3, n_steps=n_run)
    U3b, _ = base.from_packed_state(U3f, P3f)
    U3g, _ = sh.from_sharded(U3s, P3s)
    np.testing.assert_allclose(np.asarray(U3g), np.asarray(U3b), atol=1e-8)
    assert abs(float(dtb) - float(dts)) < 1e-12
    assert np.asarray(tel["pressure_iters"]).shape == (n_run,)


def test_sharded_karman_dirichlet_pressure():
    """Kármán geometry: Dirichlet pressure path + ds (do-nothing) terms."""
    from flow_tpu.models.karman import KarmanProblem

    prob = KarmanProblem(lcar=0.1, n_refine=2)
    info = build_patch_info(prob.mesh_hierarchy)
    sh = ShardedPackedStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu, info,
        devices=jax.devices()[:8], **TIGHT
    )
    assert sh.seam_stats["remote_row_pairs"] > 0
    _parity(sh, prob.V.zeros(), prob.Q.zeros(), 1e-3)


def test_sharded_bdf2_run():
    """BDF2 sharded scan loop vs the single-device BDF2 stepper (the
    bench/physics integrator)."""
    from flow_tpu.fem.spaces import FunctionSpace, VectorFunctionSpace
    from flow_tpu.fem.bc import DirichletBC

    ms = [unit_square_mesh(4, diagonal="left")]
    for _ in range(2):
        ms.append(refine_uniform(ms[-1]))
    info = build_patch_info(ms)
    mesh = ms[-1]
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    sh = ShardedPackedStepper(
        V, Q, u_bcs, [], 1.0, 0.05, info, devices=jax.devices()[:8],
        time_step_method="bdf2", **TIGHT
    )
    base = sh.base
    Uf, Pf = base.zeros()
    U3f, P3f, dtb, _, _ = base.run(Uf, Pf, 1e-3, n_steps=3)
    Us, Ps = sh.to_sharded(V.zeros(), Q.zeros())
    U3s, P3s, dts, tel = sh.run(Us, Ps, 1e-3, n_steps=3)
    U3b, _ = base.from_packed_state(U3f, P3f)
    U3g, _ = sh.from_sharded(U3s, P3s)
    np.testing.assert_allclose(np.asarray(U3g), np.asarray(U3b), atol=1e-8)
    assert abs(float(dtb) - float(dts)) < 1e-12


def test_sharded_cavity_neumann():
    """Lid-driven square: pure-Neumann pressure (nullspace projection +
    psum-reduced coarse solve)."""
    from flow_tpu.fem.spaces import FunctionSpace, VectorFunctionSpace
    from flow_tpu.fem.bc import DirichletBC

    ms = [unit_square_mesh(4, diagonal="left")]
    for _ in range(2):
        ms.append(refine_uniform(ms[-1]))
    info = build_patch_info(ms)
    mesh = ms[-1]
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    sh = ShardedPackedStepper(
        V, Q, u_bcs, [], 1.0, 0.05, info, devices=jax.devices()[:8], **TIGHT
    )
    _parity(sh, V.zeros(), Q.zeros(), 1e-2)
