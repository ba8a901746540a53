# Working AB2/TR monolithic integrator (the reference's experimental/ab2r.py
# is unrunnable dead code; this is the live equivalent). MMS accuracy check:
# one adaptive step on the guermond2 solution stays close to exact.
import numpy as np
import jax.numpy as jnp
import sympy

from helpers import lambdify_xt

import flow_tpu
from flow_tpu import (
    unit_square_mesh,
    VectorFunctionSpace,
    FunctionSpace,
    DirichletBC,
    project,
    errornorm,
)
from flow_tpu.experimental.ab2tr import AB2TR
import pytest


def _guermond2():
    x = sympy.DeferredVector("x")
    t = sympy.symbols("t")
    u = (
        sympy.sin(x[0] + t) * sympy.sin(x[1] + t),
        sympy.cos(x[0] + t) * sympy.cos(x[1] + t),
    )
    p = sympy.sin(x[0] - x[1] + t)
    mu_s, rho_s = sympy.symbols("mu, rho")
    f = []
    for i in range(2):
        fi = (
            1.0
            * (
                sympy.diff(u[i], t)
                + u[0] * sympy.diff(u[i], x[0])
                + u[1] * sympy.diff(u[i], x[1])
            )
            + sympy.diff(p, x[i])
            - 1.0 * (sympy.diff(u[i], x[0], 2) + sympy.diff(u[i], x[1], 2))
        )
        f.append(sympy.simplify(fi))
    return u, p, tuple(f)


@pytest.mark.slow
def test_ab2tr_step_accuracy():
    u_sym, p_sym, f_sym = _guermond2()
    mesh = unit_square_mesh(16, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    dt = 1.0e-2
    u_at = lambda tv: tuple(lambdify_xt(c, tv) for c in u_sym)
    f_at = lambda tv: tuple(lambdify_xt(c, tv) for c in f_sym)

    u0 = project(u_at(0.0), V)
    # freeze f at t=dt/2 (midpoint of the TR step) — second-order consistent
    u_bcs = [DirichletBC(V, u_at(dt), "on_boundary")]
    integ = AB2TR(V, Q, u_bcs, rho=1.0, mu=1.0, f=f_at(0.5 * dt))

    state = integ.bootstrap(u0)
    # the bootstrapped acceleration should be finite and nontrivial
    assert bool(jnp.isfinite(state["udot"]).all())
    assert float(jnp.abs(state["udot"]).max()) > 1e-3

    state, dt_next, lte = integ.step(state, dt)
    err = errornorm(u_at(dt), flow_tpu.Function(V, state["u"]))
    # one TR step from the exact projection: error = O(dt^3) LTE + spatial
    assert err < 5e-4, err
    assert dt_next > 0 and np.isfinite(lte)
