# Structured-grid multigrid (conv ops + stencil transfers): iteration counts
# and solution agreement vs Jacobi-CG, 2-D and 3-D, Neumann and Dirichlet.
import numpy as np
import jax.numpy as jnp
import pytest

from flow_tpu import unit_square_mesh, FunctionSpace
from flow_tpu.mesh3d import box_mesh
from flow_tpu.fem import assembly
from flow_tpu.fem.assembly import geometry
from flow_tpu.solvers import krylov
from flow_tpu.solvers.structured_mg import StructuredHierarchy


@pytest.mark.parametrize(
    "mesh_fn,is3d",
    [
        (lambda: unit_square_mesh(32, diagonal="right"), False),
        (lambda: box_mesh((0, 0, 0), (1, 1, 1), 16, 16, 16), True),
    ],
)
@pytest.mark.parametrize("neumann", [True, False])
def test_structured_mg_preconditions(mesh_fn, is3d, neumann):
    mesh = mesh_fn()
    S = FunctionSpace(mesh, 1)
    geom = geometry(mesh)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(S.n_dofs))

    def K_raw(x):
        return assembly.stiffness_apply(S, geom, x)

    diag = assembly.stiffness_diag(S, geom)
    if neumann:
        b = b - b.mean()
        ones = jnp.ones(S.n_dofs)
        hier = StructuredHierarchy(mesh)
        x_j, i_j = krylov.cg(
            K_raw, b, M=lambda r: r / diag, rtol=1e-10, maxiter=5000,
            nullspace=[ones],
        )
        x_m, i_m = krylov.cg(
            K_raw, b, M=hier.v_cycle, rtol=1e-10, maxiter=200, nullspace=[ones]
        )
        x_j = x_j - x_j.mean()
        x_m = x_m - x_m.mean()
    else:
        mask = np.zeros(S.n_dofs)
        mask[S.boundary_dofs()] = 1.0
        mask = jnp.asarray(mask)
        free = 1.0 - mask

        def K_bc(x):
            return free * K_raw(free * x) + mask * x

        b = free * b
        hier = StructuredHierarchy(mesh, bc_mask=mask)
        x_j, i_j = krylov.cg(
            K_bc, b, M=lambda r: r / (free * diag + mask), rtol=1e-10, maxiter=5000
        )
        x_m, i_m = krylov.cg(K_bc, b, M=hier.v_cycle, rtol=1e-10, maxiter=200)

    assert int(i_m.iters) < 40, int(i_m.iters)
    assert int(i_m.iters) * 4 < int(i_j.iters)  # big speedup over Jacobi
    np.testing.assert_allclose(np.asarray(x_m), np.asarray(x_j), atol=2e-8)
