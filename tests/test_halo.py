# Halo-exchange dof-partitioned Poisson solve (parallel/halo.py) vs the
# single-chip CG, on the 8-way virtual CPU mesh: the scalable distributed
# path must reproduce the global solution.
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flow_tpu import unit_square_mesh, FunctionSpace
from flow_tpu.fem import assembly
from flow_tpu.fem.assembly import geometry
from flow_tpu.solvers import krylov
from flow_tpu.parallel.halo import HaloPoisson


@pytest.mark.parametrize("ndev", [2, 8])
@pytest.mark.parametrize("neumann", [True, False])
def test_halo_poisson_matches_global(ndev, neumann):
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = unit_square_mesh(24, diagonal="crossed")
    S = FunctionSpace(mesh, 1)
    geom = geometry(mesh)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(S.n_dofs))

    if neumann:
        b = b - b.mean()
        bc_mask = None
        ones = jnp.ones(S.n_dofs)
        x_ref, info = krylov.cg(
            lambda x: assembly.stiffness_apply(S, geom, x),
            b,
            rtol=1e-12,
            maxiter=5000,
            nullspace=[ones],
        )
        x_ref = x_ref - x_ref.mean()
    else:
        mask = np.zeros(S.n_dofs)
        mask[S.boundary_dofs()] = 1.0
        bc_mask = jnp.asarray(mask)
        free = 1.0 - bc_mask

        def K_bc(x):
            return free * assembly.stiffness_apply(S, geom, free * x) + bc_mask * x

        b = free * b
        x_ref, info = krylov.cg(K_bc, b, rtol=1e-12, maxiter=5000)

    hp = HaloPoisson(mesh, bc_mask=bc_mask, devices=jax.devices()[:ndev])
    x, iters = hp.solve(b, rtol=1e-12, maxiter=5000)
    if neumann:
        x = x - jnp.mean(x)
    assert iters > 0
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=2e-10)
