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

import jax
import jax.numpy as jnp
import jax.scipy.linalg
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


def _make_project(nullspace, dot=None):
    if nullspace is None:
        return _identity
    _dot_ = dot or _dot
    ns = [v / jnp.sqrt(_dot_(v, v)) for v in nullspace]

    def proj(x):
        for v in ns:
            x = x - _dot_(v, x) * v
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
    dot: Optional[Callable] = None,
):
    """Preconditioned conjugate gradients for SPD (or consistent singular
    semidefinite) systems.

    `dot` overrides the inner product (norms, orthogonality, and the
    nullspace projection): required for SPMD-partitioned vectors (psum
    dot) and for replica-weighted layouts (fem/patch.py), where the
    weighted CG reproduces the un-replicated iteration exactly."""
    M = M or _identity
    _dot = dot or globals()["_dot"]
    proj = _make_project(nullspace, dot=dot)
    b = proj(b)

    bnorm = jnp.sqrt(_dot(b, b))
    target = jnp.maximum(rtol * bnorm, atol)

    # x0 None: r = b directly — one matvec saved, and the operator is
    # never applied to a literal zero (which XLA's CPU constant folder
    # chokes on for the large packed-patch kernels)
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = proj(x0)
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
    bnorm = jnp.sqrt(_dot_(b, b))
    target = jnp.maximum(rtol * bnorm, atol)

    if x0 is None:  # skip the initial matvec (see cg)
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
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
    dot: Optional[Callable] = None,
    basis_dtype=None,
    reduce: Optional[Callable] = None,
):
    """Restarted GMRES(m), first-class implementation (replaces the earlier
    jax.scipy delegate, which reported iters=-1).

    RIGHT preconditioning (A M z = b, x = M z): the Givens-rotation
    recurrence then tracks the TRUE residual norm, matching this module's
    unpreconditioned stopping convention. Arnoldi uses batched modified
    Gram-Schmidt — the basis lives as one [m+1, N] matrix so each
    orthogonalization is a single MXU matmul against the full (masked)
    basis rather than a j-term loop. Fixed shapes throughout; inner and
    outer loops are lax.while_loops. `dot` overrides the inner product for
    SPMD-partitioned vectors (psum-reducing, as in bicgstab).

    `basis_dtype` (e.g. jnp.bfloat16) stores the Arnoldi basis V in a
    reduced precision: the basis is read TWICE per iteration by the
    batched MGS matmuls ([m+1, N] each way), which at large N dominates
    the solve's HBM traffic — more than the operator apply itself. A
    bf16 basis halves that traffic; orthogonality and the solution
    update then hold to ~1e-3 relative, appropriate for loose forcing
    tolerances (the momentum solve), not for tight solves. Givens/H/g
    bookkeeping and all residual norms stay in the working dtype.

    `reduce` (SPMD): the batched-MGS projections are raw einsums over the
    vector axis; under shard_map each device sees only its shard, so the
    [m+1]-vector of basis dot products must be summed across devices. Pass
    `reduce=lambda h: lax.psum(h, axis)` together with a psum-reducing
    `dot` (parallel/packed_shard.py); identity otherwise."""
    M = M or _identity
    _dot_ = dot or _dot
    _red_ = reduce or (lambda h: h)
    x = jnp.zeros_like(b) if x0 is None else x0
    dtype = b.dtype
    shape = b.shape
    N = b.size
    m = int(restart)

    bnorm = jnp.sqrt(_dot_(b, b))
    target = jnp.maximum(rtol * bnorm, atol)

    def flat(v):
        return v.reshape(N)

    def unflat(v):
        return v.reshape(shape)

    def dotf(u, v):
        return _dot_(unflat(u), unflat(v))

    if x0 is None:  # skip the initial matvec (see cg)
        r0 = b
    else:
        r0 = b - A(x)
    rnorm0 = jnp.sqrt(_dot_(r0, r0))

    bd = basis_dtype or dtype

    def inner(x, r, beta):
        """One restart cycle from residual r (norm beta). Returns
        (x_new, rnorm, n_iters)."""
        V = jnp.zeros((m + 1, N), dtype=bd)
        V = V.at[0].set((flat(r) / _nz(beta)).astype(bd))
        H = jnp.zeros((m + 1, m), dtype=dtype)
        cs = jnp.zeros(m, dtype=dtype)
        sn = jnp.zeros(m, dtype=dtype)
        g = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)

        def cond(s):
            V, H, cs, sn, g, j, brk = s
            return (j < m) & (jnp.abs(g[j]) > target) & (~brk)

        def body(s):
            V, H, cs, sn, g, j, brk = s
            w = flat(A(M(unflat(V[j].astype(dtype)))))
            # batched MGS: project against the whole stored basis; rows
            # > j are zero so the mask is implicit in V itself
            h = _red_(jnp.einsum("ij,j->i", V, w.astype(bd),
                                 preferred_element_type=dtype))  # [m+1]
            rowmask = jnp.arange(m + 1) <= j
            h = jnp.where(rowmask, h, 0.0)
            w = w - jnp.einsum("i,ij->j", h.astype(bd), V,
                               preferred_element_type=dtype)
            # one re-orthogonalization pass (classical DGKS condition
            # skipped — fixed single pass keeps shapes/trace static and is
            # the standard practical choice)
            h2 = jnp.where(
                rowmask,
                _red_(jnp.einsum("ij,j->i", V, w.astype(bd),
                                 preferred_element_type=dtype)),
                0.0,
            )
            w = w - jnp.einsum("i,ij->j", h2.astype(bd), V,
                               preferred_element_type=dtype)
            h = h + h2
            hj1 = jnp.sqrt(dotf(w, w))
            brk = hj1 <= jnp.finfo(dtype).tiny * 10.0
            V = V.at[j + 1].set(
                jnp.where(brk, 0.0, w / _nz(hj1)).astype(bd)
            )

            # apply the accumulated Givens rotations to the new column
            col = h.at[j + 1].set(hj1)

            def rot(i, c):
                ci, si = cs[i], sn[i]
                hi, hi1 = c[i], c[i + 1]
                c = c.at[i].set(ci * hi + si * hi1)
                c = c.at[i + 1].set(-si * hi + ci * hi1)
                return c

            col = lax.fori_loop(0, j, rot, col)
            denom = _nz(jnp.sqrt(col[j] ** 2 + hj1**2))
            cj = col[j] / denom
            sj = hj1 / denom
            cs = cs.at[j].set(cj)
            sn = sn.at[j].set(sj)
            col = col.at[j].set(cj * col[j] + sj * hj1)
            col = col.at[j + 1].set(0.0)
            H = H.at[:, j].set(col)
            g = g.at[j + 1].set(-sj * g[j])
            g = g.at[j].set(cj * g[j])
            return (V, H, cs, sn, g, j + 1, brk)

        V, H, cs, sn, g, j, brk = lax.while_loop(
            cond, body, (V, H, cs, sn, g, jnp.array(0), jnp.array(False))
        )

        # solve the (padded) upper-triangular system H[:m,:m] y = g[:m]:
        # unused columns get unit diagonal and zero rhs so the dense solve
        # is exact for the first j unknowns
        colmask = jnp.arange(m) < j
        Hm = jnp.where(colmask[None, :] & colmask[:, None], H[:m, :m], 0.0)
        Hm = Hm + jnp.diag(jnp.where(colmask, 0.0, jnp.ones(m, dtype=dtype)))
        gm = jnp.where(colmask, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Hm, gm, lower=False)
        dx = jnp.einsum("i,ij->j", y.astype(bd), V[:m],
                        preferred_element_type=dtype)
        x = x + M(unflat(dx))
        return x, jnp.abs(g[j]), j

    def outer_cond(s):
        x, rnorm, k, it_prev = s
        return (rnorm > target) & (k < maxiter) & (it_prev != 0)

    def outer_body(s):
        x, rnorm, k, _ = s
        r = b - A(x)
        beta = jnp.sqrt(_dot_(r, r))
        x, rn, j = inner(x, r, beta)
        if bd != dtype:
            # the Givens estimate drifts with a reduced-precision basis
            # (it can read converged while the true residual is not):
            # re-measure before deciding to stop — one extra apply per
            # restart cycle, only on the reduced-precision path
            rt = b - A(x)
            rn = jnp.sqrt(_dot_(rt, rt))
        return (x, rn, k + j, j)

    x, rnorm, iters, _ = lax.while_loop(
        outer_cond, outer_body, (x, rnorm0, jnp.array(0), jnp.array(-1))
    )
    # true residual (the Givens estimate can drift over restarts)
    rtrue = b - A(x)
    rnorm = jnp.sqrt(_dot_(rtrue, rtrue))
    return x, SolveInfo(iters, rnorm, rnorm <= target)
