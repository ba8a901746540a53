# On-device heat solve at scale (VERDICT r03 missing #4): the multigrid-
# GMRES path must reproduce the host sparse-LU answer on a large
# convection-dominated system, with and without SUPG.
import numpy as np
import jax.numpy as jnp
import pytest

from flow_tpu.mesh import unit_square_mesh, refine_uniform
from flow_tpu.fem.spaces import FunctionSpace
from flow_tpu.fem.bc import DirichletBC
from flow_tpu import heat
from flow_tpu.fem.interpolate import project


def _hierarchy(k):
    ms = [unit_square_mesh(12, "crossed")]
    for _ in range(k):
        ms.append(refine_uniform(ms[-1]))
    return ms


def _conv(x):
    # rotating convection field (convection-dominated at kappa below)
    return np.stack(
        [x[..., 1] - 0.5, -(x[..., 0] - 0.5)], axis=-1
    ) * 2.0


@pytest.mark.parametrize("supg", [False, True])
def test_heat_mg_matches_splu_large(supg):
    ms = _hierarchy(3)
    mesh = ms[-1]
    Q = FunctionSpace(mesh, 2)  # P2, the Boussinesq temperature space
    assert Q.n_dofs > 50_000  # the at-scale regression clause

    bcs = [
        DirichletBC(Q, 1.0, lambda x: x[:, 1] < 1e-12),
        DirichletBC(Q, 0.0, lambda x: x[:, 1] > 1 - 1e-12),
    ]
    op = heat.Heat(
        Q, _conv, kappa=1e-3, rho=1.0, cp=1.0, bcs=bcs, source=0.0,
        supg_stabilization=supg, mesh_hierarchy=ms,
    )
    rng = np.random.default_rng(0)
    theta0 = project(lambda x: 0.5 + 0.1 * np.sin(4 * x[..., 0]), Q)
    dt = 0.05
    b = op.eval_alpha_M_beta_F(1.0 / dt, 0.0, theta0, 0.0)

    x_mg = op.solve_alpha_M_beta_F(1.0 / dt, -1.0, b, dt, solver="mg").vector
    x_lu = op.solve_alpha_M_beta_F(
        1.0 / dt, -1.0, b, dt, solver="direct"
    ).vector
    ref = float(jnp.max(jnp.abs(x_lu)))
    err = float(jnp.max(jnp.abs(x_mg - x_lu)))
    # 1e-6 relative: the golden-regression discipline of the suite
    # (residual rtol 1e-11 x measured cond ~6e3 lands well inside it)
    assert err < 1e-6 * ref, f"mg vs splu: {err} (ref {ref})"


def test_heat_auto_prefers_mg_with_hierarchy():
    ms = _hierarchy(3)
    Q = FunctionSpace(ms[-1], 2)
    bcs = [DirichletBC(Q, 0.0, lambda x: x[:, 1] < 1e-12)]
    op = heat.Heat(
        Q, None, kappa=1.0, rho=1.0, cp=1.0, bcs=bcs, source=0.0,
        mesh_hierarchy=ms,
    )
    theta0 = project(0.3, Q)
    b = op.eval_alpha_M_beta_F(10.0, 0.0, theta0, 0.0)
    # auto path (solver=None) must not touch scipy: no LU cache entries
    x = op.solve_alpha_M_beta_F(10.0, -1.0, b, 0.0).vector
    assert not op._lu_cache, "auto dispatched to the host LU despite MG"
    x_lu = op.solve_alpha_M_beta_F(10.0, -1.0, b, 0.0, solver="direct").vector
    err = float(jnp.max(jnp.abs(x - x_lu)))
    assert err < 1e-6 * float(jnp.max(jnp.abs(x_lu)))
