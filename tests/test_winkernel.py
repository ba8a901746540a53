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


def test_window_ops_3d_tets():
    # mass and stiffness window kernels on a P1/P2 tet space (the 3-D
    # pressure-Poisson / correction operators)
    from flow_tpu.fem.winkernel import WindowMassOperator, WindowStiffnessOperator
    from flow_tpu.mesh3d import box_mesh
    from flow_tpu import FunctionSpace

    m = box_mesh((0, 0, 0), (1, 1, 1), 4, 4, 4)
    geom = assembly.geometry(m)
    rng = np.random.default_rng(5)
    for deg in (1, 2):
        Q = FunctionSpace(m, deg)
        x = jnp.asarray(rng.standard_normal(Q.n_dofs))
        mo = WindowMassOperator(Q, S=128, interpret=True)
        ref = assembly.mass_apply(Q, geom, x[:, None] * jnp.ones((1, 1)))[:, 0]
        np.testing.assert_allclose(np.asarray(mo.apply(x)), np.asarray(ref),
                                   rtol=3e-5, atol=1e-5)
        so = WindowStiffnessOperator(Q, S=128, interpret=True)
        np.testing.assert_allclose(
            np.asarray(so.apply(x)),
            np.asarray(assembly.stiffness_apply(Q, geom, x)),
            rtol=3e-5, atol=1e-5,
        )
