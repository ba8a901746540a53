# Gather-free lagged momentum operator vs the einsum reference.
import numpy as np
import jax
import jax.numpy as jnp

from flow_tpu.models.karman import KarmanProblem
from flow_tpu.fem import assembly, forms
from flow_tpu.fem.winmom import WindowLaggedMomentum


def _reference_apply(V, geom, x, T, mass_w, s_rho, s_mu):
    Uloc = V.gather(x)
    Tloc = V.gather(T)
    loc = mass_w * forms.mass_loc(V, geom, Uloc)
    loc = loc + s_rho * forms.skew_convection_lagged_loc(
        V, geom, Tloc, Uloc, rule_degree=5
    )
    loc = loc + forms.sym_grad_loc(V, geom, Uloc, s_mu)
    return V.dof_sum(loc)


def test_window_lagged_momentum_matches_einsum():
    prob = KarmanProblem(lcar=0.1, n_refine=1)
    V = prob.V
    geom = assembly.geometry(V.mesh)
    op = WindowLaggedMomentum(V, S=128, interpret=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    T = jnp.asarray(rng.standard_normal((V.n_dofs, 2)))
    mass_w, s_rho, s_mu = 1.0, 0.37, 0.021

    ref = _reference_apply(V, geom, x, T, mass_w, s_rho, s_mu)
    Tq = op.transport_qp(T)
    got = op.apply(x, Tq, mass_w, s_rho, s_mu)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-5, atol=5e-6
    )
