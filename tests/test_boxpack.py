# Box-packed 3-D layout (fem/boxpack.py): kernel exactness vs the einsum
# assembly/forms path and step equivalence vs FastStepper — the same
# standard as tests/test_patchfast.py, on the structured Kuhn box.
import numpy as np
import jax.numpy as jnp
import pytest

from flow_tpu.mesh3d import box_mesh
from flow_tpu.fem.spaces import FunctionSpace, VectorFunctionSpace
from flow_tpu.fem import assembly, forms
from flow_tpu.fem.assembly import geometry
from flow_tpu.fem.boxpack import BoxPack


@pytest.fixture(scope="module")
def setup():
    # anisotropic in BOTH spacing and cell counts (the 3-D Boussinesq box
    # is 0.1 x 0.1 x 0.2 with n=(8,8,16))
    mesh = box_mesh((0, 0, 0), (1.0, 1.1, 0.9), 4, 5, 6)
    return mesh, BoxPack(mesh)


def _pack3(bp, X):
    return jnp.concatenate([bp.to_packed(X[:, c]) for c in range(3)])


def _un3(bp, Y):
    return jnp.stack([bp.from_packed(c) for c in bp.comps(Y)], axis=-1)


def test_box_kernels_exact(setup):
    mesh, bp = setup
    geomr = geometry(mesh)
    rng = np.random.default_rng(0)
    V = VectorFunctionSpace(mesh, 2, n_components=3)
    Q = FunctionSpace(mesh, 1)
    U = jnp.asarray(rng.standard_normal((V.n_dofs, 3)))
    T = jnp.asarray(rng.standard_normal((V.n_dofs, 3)))
    p = jnp.asarray(rng.standard_normal(Q.n_dofs))
    Uf, Tf = _pack3(bp, U), _pack3(bp, T)

    np.testing.assert_allclose(
        np.asarray(_un3(bp, bp.mass_apply_vec(Uf))),
        np.asarray(assembly.mass_apply(V, geomr, U)),
        atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(bp.div_rhs(Uf)),
        np.asarray(forms.div_rhs(V, Q, geomr, U)),
        atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(_un3(bp, bp.pressure_grad_rhs(p))),
        np.asarray(forms.pressure_grad_rhs(V, Q, geomr, p)),
        atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(bp.grad_div_rhs(Uf)),
        np.asarray(forms.grad_div_ustar_rhs(V, Q, geomr, U)),
        atol=1e-11,
    )
    # lagged momentum (mass + sym-grad stress + skew convection)
    s_mu, s_rho = 0.017, 0.6
    A = bp.conv_tables(Tf)
    y_ref = (
        assembly.mass_apply(V, geomr, U)
        + s_mu * forms.sym_grad_apply(V, geomr, U, 1.0)
        + s_rho
        * V.dof_sum(
            forms.skew_convection_lagged_loc(
                V, geomr, V.gather(T), V.gather(U)
            )
        )
    )
    np.testing.assert_allclose(
        np.asarray(_un3(bp, bp.momentum_apply(A, Uf, s_mu, s_rho))),
        np.asarray(y_ref),
        atol=1e-11,
    )


def test_box_stepper_matches_fast():
    # NOTE compile budget: the einsum FastStepper's fused 3-D scan takes
    # tens of minutes to compile on the 1-core CPU CI host, so parity runs
    # as a fixed-dt python loop over `.step` (same discrete map); the box
    # scan loop is then checked against its own python-stepped states with
    # the CFL controller pinned (dt_max = dt0 keeps dt constant).
    from flow_tpu.models.cavity3d import Cavity3DProblem
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.navier_stokes.boxfast import BoxPackedStepper
    from flow_tpu.solvers.structured_mg import StructuredHierarchy

    prob = Cavity3DProblem(n=4, mu=0.01)
    kw = dict(
        newton_tol=1e-12, newton_rtol=0.0, pressure_rtol=1e-11,
        correction_rtol=1e-11,
    )
    sd = FastStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        rotational_form=True, newton_maxiter=4, linear_rtol=1e-7,
        convection="lagged", momentum_solver="bicgstab", **kw
    )
    sd.pressure_precond = StructuredHierarchy(prob.mesh).v_cycle
    sp = BoxPackedStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        momentum_solver="bicgstab", dt_max=1e-3, cfl_target=1e9, **kw
    )
    U = prob.V.zeros()
    P = prob.Q.zeros()
    dt = jnp.asarray(1e-3, dtype=U.dtype)
    Uf, Pf = sp.zeros()
    for k in range(2):
        U, P, std = sd.step(U, P, dt)
        Uf, Pf, stp = sp.step(Uf, Pf, dt)
        Up, Pp = sp.from_packed_state(Uf, Pf)
        np.testing.assert_allclose(np.asarray(Up), np.asarray(U), atol=1e-10)
        d = np.asarray(Pp) - np.asarray(P)
        d = d - d.mean()
        np.testing.assert_allclose(d, 0.0 * d, atol=1e-8)
        assert int(stp.pressure_iters) == int(std.pressure_iters)
        assert int(stp.correction_iters) == int(std.correction_iters)

    # the fused scan loop reproduces the python-stepped states when the
    # CFL controller is pinned at dt0 (dt_max = dt0)
    U2f, P2f, dts, tel = sp.run(*sp.zeros(), 1e-3, n_steps=2)
    np.testing.assert_allclose(
        np.asarray(U2f), np.asarray(Uf), atol=1e-12
    )
    assert abs(float(dts) - 1e-3) < 1e-15
    assert np.asarray(tel["pressure_iters"]).shape == (2,)
