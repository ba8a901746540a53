# Variationally-consistent force probe (navier_stokes/forces.py).
#
# Exact-identity test: on an exactly-representable solution (plane
# Poiseuille, P2/P1-exact), the consistent functional must equal the
# boundary integral of the exact traction weighted by the discrete test
# field w_h, to machine precision — every volume term integrates by parts
# exactly (same mechanism as the residual-identity tests).
import numpy as np
import jax.numpy as jnp

from flow_tpu import (
    rectangle_mesh,
    VectorFunctionSpace,
    FunctionSpace,
    project,
)
from flow_tpu.fem.assembly import geometry, BoundaryTab, mass_apply
from flow_tpu.navier_stokes.forces import ConsistentForceProbe


def _poiseuille(nx=12, ny=8):
    mesh = rectangle_mesh((0.0, 0.0), (2.0, 1.0), nx, ny, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)
    u = project((lambda x: x[..., 1] * (1.0 - x[..., 1]),
                 lambda x: jnp.zeros(x.shape[:-1], dtype=x.dtype)), V)
    p = project(lambda x: 2.0 * (2.0 - x[..., 0]) + 1.0, Q)
    return mesh, V, Q, u, p


def _weighted_exact_traction(mesh, V, wvec):
    """oint_dOmega sigma_exact . n_fluid_out . (w_h e_d) ds, d = 0,1.

    sigma = mu(grad u + grad u^T) - p I of the exact Poiseuille fields,
    evaluated analytically at facet quadrature points; w_h is the P2 trace
    of the probe's test field."""
    bt = BoundaryTab(V, rule_degree=5)
    x = np.asarray(bt.x_np)  # [nb, nq, 2]
    mu = 1.0
    dudy = 1.0 - 2.0 * x[..., 1]
    p = 2.0 * (2.0 - x[..., 0]) + 1.0
    # sigma = [[-p, mu*dudy], [mu*dudy, -p]]
    n = np.asarray(bt.normals)  # fluid-outward [nb, 2]
    t0 = -p * n[:, None, 0] + mu * dudy * n[:, None, 1]
    t1 = mu * dudy * n[:, None, 0] - p * n[:, None, 1]
    wq = np.asarray(bt.values(wvec))  # [nb, nq] P2 trace of the mask
    wl = np.asarray(bt.wl)
    F0 = np.einsum("bq,bq,bq->", t0, wq, wl)
    F1 = np.einsum("bq,bq,bq->", t1, wq, wl)
    return np.array([F0, F1])


def test_consistent_force_exact_poiseuille():
    mesh, V, Q, u, p = _poiseuille()
    wall = lambda x: x[:, 1] < 1e-12

    probe = ConsistentForceProbe(V, Q, wall, rho=1.0, mu=1.0)
    F = np.asarray(probe(u.vector, p.vector))

    # expected: minus the fluid-outward weighted traction (w_h includes the
    # corner dofs, whose P2 trace extends one facet up the inlet/outlet)
    body = np.zeros(V.n_dofs)
    body[V.boundary_dofs(wall)] = 1.0
    expected = -_weighted_exact_traction(mesh, V, jnp.asarray(body))

    np.testing.assert_allclose(F, expected, rtol=1e-12, atol=1e-12)
    # physics sanity: drag is downstream (+x), wall pushed down by pressure
    assert F[0] > 0 and F[1] < 0


def test_consistent_force_time_derivative_term():
    mesh, V, Q, u, p = _poiseuille()
    wall = lambda x: x[:, 1] < 1e-12
    probe = ConsistentForceProbe(V, Q, wall, rho=2.5, mu=1.0)

    # U0 = U1 - dt*a with constant acceleration field a: the probe must gain
    # exactly -rho * (M a) . w relative to the steady functional
    a = jnp.ones((V.n_dofs, 2)) * jnp.asarray([0.3, -0.7])
    dt = 0.01
    F_steady = np.asarray(probe(u.vector, p.vector, Fq=None))
    F_unsteady = np.asarray(probe(u.vector, p.vector, u.vector - dt * a, dt))

    body = np.zeros(V.n_dofs)
    body[V.boundary_dofs(wall)] = 1.0
    Ma = mass_apply(V, geometry(mesh), a)
    expected_delta = -2.5 * np.einsum("nm,n->m", np.asarray(Ma), body)
    np.testing.assert_allclose(
        F_unsteady - F_steady, expected_delta, rtol=1e-11, atol=1e-12
    )
