# Structured-grid convolution fast path (ops/structured.py) must match the
# general gather/einsum stiffness apply exactly, in 2-D and 3-D.
import numpy as np
import jax.numpy as jnp
import pytest

from flow_tpu import unit_square_mesh, rectangle_mesh, FunctionSpace
from flow_tpu.mesh3d import box_mesh
from flow_tpu.fem import assembly
from flow_tpu.fem.assembly import geometry
from flow_tpu.ops.structured import StructuredLaplacian, supports


@pytest.mark.parametrize(
    "mesh_fn",
    [
        lambda: unit_square_mesh(9, diagonal="right"),
        lambda: rectangle_mesh((0, 0), (2.0, 1.0), 10, 6, diagonal="left"),
        lambda: box_mesh((0, 0, 0), (1, 1, 1), 5, 5, 5),
        lambda: box_mesh((0, 0, 0), (0.1, 0.1, 0.2), 4, 5, 6),
    ],
)
def test_structured_matches_general(mesh_fn):
    mesh = mesh_fn()
    assert supports(mesh)
    S = FunctionSpace(mesh, 1)
    geom = geometry(mesh)
    op = StructuredLaplacian(mesh)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(S.n_dofs))
    y_ref = assembly.stiffness_apply(S, geom, x)
    y = op(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-12)


def test_unstructured_not_supported():
    from flow_tpu import rectangle_with_hole_mesh

    mesh = rectangle_with_hole_mesh(0, 1, 0, 1, 0.5, 0.5, 0.2, 0.2)
    assert not supports(mesh)
