# Chebyshev polynomial preconditioning / smoothing.
#
# Part of the BoomerAMG replacement stack (SURVEY.md §2.2 "Hypre BoomerAMG"):
# a fixed-degree Chebyshev polynomial in the Jacobi-scaled operator is a
# *linear* SPD preconditioner (safe inside CG/MINRES) and the smoother of the
# geometric-multigrid hierarchy. Eigenvalue bounds come from a short power
# iteration at setup.
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["power_iteration_lmax", "chebyshev_preconditioner"]


def power_iteration_lmax(A, diag, n, iters=30, key=0, dtype=None):
    """Estimate lambda_max of diag^{-1} A by power iteration.

    `n` is the vector shape (int or tuple). Returns a python float.
    """
    shape = (n,) if isinstance(n, int) else tuple(n)
    x = jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype or diag.dtype)

    def body(_, x):
        y = A(x) / diag
        return y / jnp.sqrt(jnp.sum(y * y))

    x = jax.lax.fori_loop(0, iters, body, x)
    y = A(x) / diag
    return float(jnp.sum(x * y) / jnp.sum(x * x))


def chebyshev_preconditioner(A, diag, lmax, degree=5, lmin_ratio=0.25):
    """Return M(r) ~ A^{-1} r: `degree` Chebyshev iterations on the
    Jacobi-scaled operator, targeting [lmin_ratio*lmax, 1.05*lmax].

    Linear and symmetric w.r.t. the diag inner product — valid for CG/MINRES.
    """
    lmax_s = 1.05 * lmax
    lmin_s = lmin_ratio * lmax
    theta = 0.5 * (lmax_s + lmin_s)
    delta = 0.5 * (lmax_s - lmin_s)
    sigma = theta / delta

    def M(b):
        # x_0 = 0; standard Chebyshev semi-iteration (Adams et al. smoother)
        rho = 1.0 / sigma
        d = (b / diag) / theta
        x = d
        r = b - A(d)
        for _ in range(degree - 1):
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / delta) * (r / diag)
            x = x + d
            r = r - A(d)
            rho = rho_new
        return x

    return M
