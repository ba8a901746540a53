# Increment-form pressure/correction solves (navier_stokes/fast.py,
# pressure_correction.py): solving K phi = rhs (phi = p1 - p0) and
# M d = rhs (d = u1 - u*) is algebraically identical to the full-field
# systems — these tests pin the equivalence at tight tolerances and the
# motivating property (increment-relative Krylov stopping; BENCH_NOTES
# round-3 step-map analysis: the full-field truncation floor damped the
# refine-2 DFG Hopf mode by ~4.7/s and froze the vortex shedding).
import os

import numpy as np
import jax.numpy as jnp
import pytest

from flow_tpu import (
    unit_square_mesh,
    VectorFunctionSpace,
    FunctionSpace,
    DirichletBC,
    project,
)
from flow_tpu.navier_stokes.fast import FastStepper


def _cavity(n=8):
    mesh = unit_square_mesh(n, diagonal="crossed")
    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    def lid(x):
        return np.where(x[:, 1] > 1 - 1e-12, 1.0, 0.0)

    u_bcs = [DirichletBC(V.sub(0), lid), DirichletBC(V.sub(1), 0.0)]
    return mesh, V, Q, u_bcs


def _run(n_steps, abs_solves, p_bcs, tol):
    os.environ["FLOW_ABS_SOLVES"] = "1" if abs_solves else ""
    try:
        mesh, V, Q, u_bcs = _cavity()
        if p_bcs:
            pbc = [DirichletBC(Q, 0.0, lambda x: x[:, 1] < 1e-12)]
        else:
            pbc = []
        st = FastStepper(
            V, Q, u_bcs, pbc, rho=1.0, mu=0.05, rotational_form=True,
            newton_tol=0.0, newton_rtol=1e-10, newton_maxiter=8,
            linear_rtol=1e-10, pressure_rtol=tol, correction_rtol=tol,
            cfl_target=1e9, dt_max=1.0,
        )
        assert st.increment_form is (not abs_solves)
        U = V.zeros()
        P = Q.zeros()
        dt = jnp.asarray(5e-3, dtype=U.dtype)
        for _ in range(n_steps):
            U, P, stats = st.step(U, P, dt)
        return np.asarray(U), np.asarray(P)
    finally:
        os.environ.pop("FLOW_ABS_SOLVES", None)


@pytest.mark.parametrize("p_bcs", [False, True])
def test_increment_matches_full_field(p_bcs):
    # at tight tolerances both forms solve the same systems
    U_i, P_i = _run(3, abs_solves=False, p_bcs=p_bcs, tol=1e-12)
    U_a, P_a = _run(3, abs_solves=True, p_bcs=p_bcs, tol=1e-12)
    assert np.linalg.norm(U_i - U_a) / np.linalg.norm(U_a) < 1e-8
    dP = np.linalg.norm(P_i - P_a) / max(np.linalg.norm(P_a), 1e-30)
    assert dP < 1e-7


def test_increment_stopping_is_increment_relative():
    # near a settled state the increment RHS norm collapses, so at a LOOSE
    # rtol the increment form keeps resolving small per-step updates while
    # the full-field form's error floor (rtol x |full field|) swamps them:
    # the increment solution must track the tight reference much better.
    ref_U, ref_P = _run(6, abs_solves=False, p_bcs=False, tol=1e-12)
    U_i, P_i = _run(6, abs_solves=False, p_bcs=False, tol=1e-2)
    U_a, P_a = _run(6, abs_solves=True, p_bcs=False, tol=1e-2)
    err_i = np.linalg.norm(U_i - ref_U)
    err_a = np.linalg.norm(U_a - ref_U)
    assert err_i < err_a, (err_i, err_a)
