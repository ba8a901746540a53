# Matrix-free Krylov solvers under lax.while_loop — the TPU-native
# replacement for PETSc's KrylovSolver/PETScKrylovSolver (SURVEY.md §2.2).
#
# All solvers:
#   * take the operator A as a callable x -> A x (matrix-free; the operator
#     closes over assembled per-element data),
#   * are jit-traceable end-to-end (fixed-shape state, while_loop),
#   * return (x, SolveInfo) with iteration count, final residual norm and a
#     converged flag — the jit-compatible replacement for PETSc's
#     error_on_nonconvergence (host code can raise on info.converged == False,
#     cf. the dt-backoff pattern in /root/reference/tests/test_boussinesq.py:254).
#   * support an optional nullspace projection (the pure-Neumann pressure
#     Poisson system, /root/reference/flow/navier_stokes/pressure_correction.py:341-432).
#
# Norm/stopping convention: unpreconditioned residual 2-norm,
# ||r|| <= max(rtol * ||b||, atol)  (PETSc uses the preconditioned norm by
# default; tests assert on discretization error, not solver internals).
from __future__ import annotations

from typing import NamedTuple, Callable, Optional

import jax.numpy as jnp
from jax import lax

__all__ = ["SolveInfo", "cg", "bicgstab", "minres", "gmres"]


class SolveInfo(NamedTuple):
    iters: jnp.ndarray
    resnorm: jnp.ndarray
    converged: jnp.ndarray


def _dot(x, y):
    return jnp.sum(x * y)


def _identity(x):
    return x


def _make_project(nullspace):
    if nullspace is None:
        return _identity
    ns = [v / jnp.sqrt(_dot(v, v)) for v in nullspace]

    def proj(x):
        for v in ns:
            x = x - _dot(v, x) * v
        return x

    return proj


def cg(
    A: Callable,
    b,
    x0=None,
    M: Optional[Callable] = None,
    rtol=1e-10,
    atol=0.0,
    maxiter=1000,
    nullspace=None,
):
    """Preconditioned conjugate gradients for SPD (or consistent singular
    semidefinite) systems."""
    M = M or _identity
    proj = _make_project(nullspace)
    b = proj(b)
    x = jnp.zeros_like(b) if x0 is None else proj(x0)

    bnorm = jnp.sqrt(_dot(b, b))
    target = jnp.maximum(rtol * bnorm, atol)

    r = proj(b - A(x))
    z = proj(M(r))
    p = z
    rz = _dot(r, z)
    rnorm = jnp.sqrt(_dot(r, r))

    def cond(s):
        x, r, z, p, rz, rnorm, k = s
        return jnp.logical_and(rnorm > target, k < maxiter)

    def body(s):
        x, r, z, p, rz, rnorm, k = s
        Ap = proj(A(p))
        pAp = _dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = proj(M(r))
        rz_new = _dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, jnp.sqrt(_dot(r, r)), k + 1)

    x, r, z, p, rz, rnorm, k = lax.while_loop(
        cond, body, (x, r, z, p, rz, rnorm, jnp.array(0))
    )
    return x, SolveInfo(k, rnorm, rnorm <= target)


def bicgstab(
    A: Callable,
    b,
    x0=None,
    M: Optional[Callable] = None,
    rtol=1e-10,
    atol=0.0,
    maxiter=1000,
    dot: Optional[Callable] = None,
):
    """Preconditioned BiCGStab for nonsymmetric systems (momentum Jacobian).

    `dot` overrides the inner product — REQUIRED for SPMD-partitioned
    vectors (pass a psum-reducing dot so every device takes identical loop
    decisions; device-local dots deadlock the collectives)."""
    M = M or _identity
    _dot_ = dot or _dot
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.sqrt(_dot_(b, b))
    target = jnp.maximum(rtol * bnorm, atol)

    r = b - A(x)
    rhat = r
    rnorm = jnp.sqrt(_dot_(r, r))
    rho = jnp.array(1.0, dtype=r.dtype)
    alpha = jnp.array(1.0, dtype=r.dtype)
    omega = jnp.array(1.0, dtype=r.dtype)
    v = jnp.zeros_like(r)
    p = jnp.zeros_like(r)

    def cond(s):
        x, r, rho, alpha, omega, v, p, rnorm, k, stall = s
        return (rnorm > target) & (k < maxiter) & (~stall)

    def body(s):
        x, r, rho, alpha, omega, v, p, rnorm, k, stall = s
        rho_new = _dot_(rhat, r)
        beta = (rho_new / _nz(rho)) * (alpha / _nz(omega))
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = A(phat)
        denom = _dot_(rhat, v)
        alpha = rho_new / _nz(denom)
        s_vec = r - alpha * v
        shat = M(s_vec)
        t = A(shat)
        tt = _dot_(t, t)
        omega = _dot_(t, s_vec) / _nz(tt)
        x = x + alpha * phat + omega * shat
        r = s_vec - omega * t
        rnorm_new = jnp.sqrt(_dot_(r, r))
        tiny = jnp.finfo(jnp.result_type(r)).tiny
        stall = (jnp.abs(rho_new) < tiny) | (jnp.abs(omega) < tiny)
        return (x, r, rho_new, alpha, omega, v, p, rnorm_new, k + 1, stall)

    x, r, rho, alpha, omega, v, p, rnorm, k, stall = lax.while_loop(
        cond,
        body,
        (x, r, rho, alpha, omega, v, p, rnorm, jnp.array(0), jnp.array(False)),
    )
    return x, SolveInfo(k, rnorm, rnorm <= target)


def _nz(x):
    # guard divisions; finfo.tiny stays representable in f32 (1e-300 doesn't)
    tiny = jnp.finfo(jnp.result_type(x)).tiny
    return jnp.where(x == 0, jnp.asarray(tiny, dtype=x.dtype), x)


def minres(
    A: Callable,
    b,
    x0=None,
    M: Optional[Callable] = None,
    rtol=1e-10,
    atol=0.0,
    maxiter=1000,
    nullspace=None,
):
    """Preconditioned MINRES for symmetric (possibly indefinite) systems —
    the Stokes saddle point (replaces 'gmres'+'hypre_amg' in
    /root/reference/flow/stokes.py:59 with the textbook-correct choice for a
    symmetric indefinite operator). M must be SPD."""
    M = M or _identity
    proj = _make_project(nullspace)
    b = proj(b)
    x = jnp.zeros_like(b) if x0 is None else proj(x0)

    r1 = proj(b - A(x))
    y = proj(M(r1))
    beta1 = jnp.sqrt(jnp.maximum(_dot(r1, y), 0.0))
    bnorm = jnp.sqrt(_dot(b, b))
    target = jnp.maximum(rtol * bnorm, atol)

    dtype = b.dtype
    zero = jnp.array(0.0, dtype=dtype)

    # Lanczos + Givens state
    state = dict(
        x=x,
        r1=r1,
        r2=r1,
        y=y,
        w=jnp.zeros_like(b),
        w2=jnp.zeros_like(b),
        beta=beta1,
        betal=zero,
        c=jnp.array(-1.0, dtype=dtype),
        s=zero,
        dbar=zero,
        epsln=zero,
        phibar=beta1,
        rnorm=jnp.sqrt(_dot(r1, r1)),
        k=jnp.array(0),
    )
    keys = list(state.keys())

    def cond(vals):
        s = dict(zip(keys, vals))
        return jnp.logical_and(s["rnorm"] > target, s["k"] < maxiter)

    def body(vals):
        s = dict(zip(keys, vals))
        v = s["y"] / _nz(s["beta"])
        yv = proj(A(v))
        yv = jnp.where(s["k"] >= 1, yv - (s["beta"] / _nz(s["betal"])) * s["r1"], yv)
        alfa = _dot(v, yv)
        yv = yv - (alfa / _nz(s["beta"])) * s["r2"]
        r1n, r2n = s["r2"], yv
        yn = proj(M(yv))
        betal, beta = s["beta"], jnp.sqrt(jnp.maximum(_dot(yv, yn), 0.0))

        oldeps = s["epsln"]
        delta = s["c"] * s["dbar"] + s["s"] * alfa
        gbar = s["s"] * s["dbar"] - s["c"] * alfa
        epsln = s["s"] * beta
        dbar = -s["c"] * beta
        gamma = jnp.sqrt(gbar**2 + beta**2)
        gamma = _nz(gamma)
        c = gbar / gamma
        sg = beta / gamma
        phi = c * s["phibar"]
        phibar = sg * s["phibar"]

        w1 = s["w2"]
        w2 = s["w"]
        w = (v - oldeps * w1 - delta * w2) / gamma
        x = s["x"] + phi * w

        return tuple(
            dict(
                x=x,
                r1=r1n,
                r2=r2n,
                y=yn,
                w=w,
                w2=w2,
                beta=beta,
                betal=betal,
                c=c,
                s=sg,
                dbar=dbar,
                epsln=epsln,
                phibar=phibar,
                rnorm=jnp.abs(phibar),
                k=s["k"] + 1,
            )[key]
            for key in keys
        )

    out = lax.while_loop(cond, body, tuple(state[k] for k in keys))
    s = dict(zip(keys, out))
    # phibar tracks the preconditioned residual norm; recompute the true one
    rtrue = b - A(s["x"])
    rnorm = jnp.sqrt(_dot(rtrue, rtrue))
    return s["x"], SolveInfo(s["k"], rnorm, rnorm <= target)


def gmres(
    A: Callable,
    b,
    x0=None,
    M: Optional[Callable] = None,
    rtol=1e-10,
    atol=0.0,
    maxiter=1000,
    restart=40,
):
    """Restarted GMRES(m) with left preconditioning, via jax.scipy."""
    import jax.scipy.sparse.linalg as jsla

    x0 = jnp.zeros_like(b) if x0 is None else x0
    x, _ = jsla.gmres(
        A,
        b,
        x0=x0,
        tol=rtol,
        atol=atol,
        maxiter=maxiter,
        restart=restart,
        M=M,
        solve_method="batched",
    )
    r = b - A(x)
    rnorm = jnp.sqrt(_dot(r, r))
    bnorm = jnp.sqrt(_dot(b, b))
    target = jnp.maximum(rtol * bnorm, atol)
    return x, SolveInfo(jnp.array(-1), rnorm, rnorm <= target)
