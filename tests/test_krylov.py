# Unit tests for the matrix-free Krylov solvers (solvers/krylov.py) — the
# PETSc KrylovSolver replacement (SURVEY.md §2.2). GMRES is first-class as
# of round 3 (previously a jax.scipy delegate reporting iters=-1,
# VERDICT r02 weak #8).
import numpy as np
import jax
import jax.numpy as jnp

from flow_tpu.solvers import krylov


def _spd(n, rng):
    Q = rng.standard_normal((n, n))
    return Q @ Q.T + n * np.eye(n)


def test_gmres_nonsymmetric_and_restarted():
    rng = np.random.default_rng(0)
    n = 200
    Am = np.eye(n) + 0.3 * rng.standard_normal((n, n)) / np.sqrt(n)
    b = jnp.asarray(rng.standard_normal(n))
    A = lambda x: jnp.asarray(Am) @ x
    xref = np.linalg.solve(Am, np.asarray(b))

    x, info = krylov.gmres(A, b, rtol=1e-10, restart=60)
    assert bool(info.converged) and int(info.iters) > 0
    np.testing.assert_allclose(np.asarray(x), xref, rtol=1e-6)

    # restart smaller than the iteration count: must still converge and
    # report the TOTAL inner iterations
    x2, info2 = krylov.gmres(A, b, rtol=1e-10, restart=8, maxiter=500)
    assert bool(info2.converged) and int(info2.iters) >= int(info.iters)
    np.testing.assert_allclose(np.asarray(x2), xref, rtol=1e-6)


def test_gmres_right_preconditioned_true_residual():
    rng = np.random.default_rng(1)
    n = 150
    D = np.diag(np.linspace(1.0, 1e4, n))
    Am = D + rng.standard_normal((n, n))
    b = jnp.asarray(rng.standard_normal(n))
    A = lambda x: jnp.asarray(Am) @ x
    M = lambda r: r / jnp.asarray(np.diag(Am))
    x, info = krylov.gmres(A, b, M=M, rtol=1e-10, restart=80, maxiter=800)
    assert bool(info.converged)
    # right preconditioning: the reported residual is the TRUE residual
    r = np.asarray(b) - Am @ np.asarray(x)
    np.testing.assert_allclose(
        float(info.resnorm), np.linalg.norm(r), rtol=1e-6, atol=1e-12
    )
    assert np.linalg.norm(r) <= 1e-10 * np.linalg.norm(np.asarray(b))


def test_gmres_matrix_shaped_vectors_and_jit():
    rng = np.random.default_rng(2)
    n = 120
    Am = np.eye(n) + 0.2 * rng.standard_normal((n, n)) / np.sqrt(n)
    A = lambda X: jnp.asarray(Am) @ X
    B = jnp.asarray(rng.standard_normal((n, 2)))
    f = jax.jit(lambda B: krylov.gmres(A, B, rtol=1e-9, restart=40, maxiter=200))
    X, info = f(B)
    assert bool(info.converged)
    R = np.asarray(B) - Am @ np.asarray(X)
    assert np.linalg.norm(R) <= 1e-8 * np.linalg.norm(np.asarray(B))


def test_gmres_maxiter_reports_nonconverged():
    rng = np.random.default_rng(3)
    n = 100
    Am = np.eye(n) + 0.5 * rng.standard_normal((n, n)) / np.sqrt(n)
    A = lambda x: jnp.asarray(Am) @ x
    b = jnp.asarray(rng.standard_normal(n))
    x, info = krylov.gmres(A, b, rtol=1e-14, restart=5, maxiter=5)
    assert not bool(info.converged)
    assert int(info.iters) >= 5


def test_cg_bicgstab_minres_agree_on_spd():
    rng = np.random.default_rng(4)
    n = 80
    Am = _spd(n, rng)
    A = lambda x: jnp.asarray(Am) @ x
    b = jnp.asarray(rng.standard_normal(n))
    xref = np.linalg.solve(Am, np.asarray(b))
    for solver in (krylov.cg, krylov.bicgstab, krylov.minres, krylov.gmres):
        x, info = solver(A, b, rtol=1e-12, maxiter=500)
        assert bool(info.converged), solver.__name__
        np.testing.assert_allclose(
            np.asarray(x), xref, rtol=1e-7, err_msg=solver.__name__
        )


def test_gmres_bf16_basis_converges_at_loose_tolerance():
    # basis_dtype=bfloat16 (the large-n HBM-traffic option): restarted
    # GMRES must still converge at the loose forcing tolerances it is
    # meant for, and the reported TRUE residual must satisfy the target
    rng = np.random.default_rng(5)
    n = 300
    Am = np.eye(n) + 0.3 * rng.standard_normal((n, n)) / np.sqrt(n)
    b = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    A = lambda x: jnp.asarray(Am, dtype=jnp.float32) @ x

    x16, info16 = krylov.gmres(
        A, b, rtol=1e-3, restart=10, maxiter=200,
        basis_dtype=jnp.bfloat16,
    )
    assert bool(info16.converged)
    r = np.asarray(b) - Am @ np.asarray(x16, dtype=np.float64)
    assert np.linalg.norm(r) <= 1.1e-3 * np.linalg.norm(np.asarray(b))
    # iteration count stays in the same regime as the f32 basis
    _, info32 = krylov.gmres(A, b, rtol=1e-3, restart=10, maxiter=200)
    assert int(info16.iters) <= 2 * int(info32.iters) + 5
