# Gather-free window mass kernel vs the quadrature mass apply.
import numpy as np
import jax
import jax.numpy as jnp

from flow_tpu.models.karman import KarmanProblem
from flow_tpu.fem import assembly
from flow_tpu.fem.winkernel import WindowMassOperator


def test_window_mass_matches_assembly():
    prob = KarmanProblem(lcar=0.1, n_refine=1)
    V = prob.V
    geom = assembly.geometry(V.mesh)
    op = WindowMassOperator(V, S=128, interpret=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(V.n_dofs))
    ref = assembly.mass_apply(V, geom, x[:, None] * jnp.ones((1, 2)))[:, 0]
    got = op.apply(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=1e-7)


def test_window_stiffness_matches_assembly():
    from flow_tpu.fem.winkernel import WindowStiffnessOperator
    from flow_tpu import FunctionSpace

    prob = KarmanProblem(lcar=0.1, n_refine=1)
    Q = FunctionSpace(prob.V.mesh, 1)
    geom = assembly.geometry(Q.mesh)
    op = WindowStiffnessOperator(Q, S=128, interpret=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(Q.n_dofs))
    ref = assembly.stiffness_apply(Q, geom, x)
    got = op.apply(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=1e-5)
