# Helpers for PDE consistency tests: numerical convergence order and
# sympy -> jax-callable conversion (the lambdify analog of the reference's
# sympy -> C-code route, /root/reference/tests/helpers.py:10-19).
import numpy as np
import sympy
import jax.numpy as jnp


def compute_numerical_order_of_convergence(Dt, errors):
    Dt = np.asarray(Dt, dtype=float)
    errors = np.asarray(errors, dtype=float)
    return np.array(
        [
            np.log(errors[k] / errors[k + 1]) / np.log(Dt[k] / Dt[k + 1])
            for k in range(len(Dt) - 1)
        ]
    )


def lambdify_x(expr, x=None):
    """sympy expr in DeferredVector x -> callable f(pts[..., 2]) -> values."""
    x = x or sympy.DeferredVector("x")
    f = sympy.lambdify((x[0], x[1]), expr, modules=jnp)

    def fn(pts):
        return jnp.broadcast_to(
            jnp.asarray(f(pts[..., 0], pts[..., 1]), dtype=pts.dtype),
            pts.shape[:-1],
        )

    return fn


def lambdify_xt(expr, t_value, x=None, t=None, subs=None):
    """sympy expr in (x, t) -> callable of points at fixed time t_value."""
    x = x or sympy.DeferredVector("x")
    t = t or sympy.symbols("t")
    if subs:
        expr = expr.subs(subs)
    f = sympy.lambdify((x[0], x[1], t), expr, modules=jnp)

    def fn(pts):
        return jnp.broadcast_to(
            jnp.asarray(f(pts[..., 0], pts[..., 1], t_value), dtype=pts.dtype),
            pts.shape[:-1],
        )

    return fn
