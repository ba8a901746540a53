# Projection, interpolation and norms.
#
# Replaces dolfin's project/interpolate/errornorm/norm as used by the
# reference tests (/root/reference/tests/test_navier_stokes.py:296-304,333,360;
# test_boussinesq.py:85-87; test_sealed_box.py:134-141).
from __future__ import annotations

import jax.numpy as jnp

from . import assembly
from .spaces import FunctionSpace, Function
from ..solvers import krylov

__all__ = ["project", "interpolate", "errornorm", "norm", "eval_callable"]


def eval_callable(f, x):
    """Evaluate a user field at physical points.

    f may be: a python callable f(x[...,2]) -> values[...] or [..., m];
    a scalar; a tuple/list of per-component callables or scalars.
    """
    if isinstance(f, (tuple, list)):
        comps = [eval_callable(fi, x) for fi in f]
        return jnp.stack([jnp.broadcast_to(c, x.shape[:-1]) for c in comps], axis=-1)
    if callable(f):
        return f(x)
    return jnp.broadcast_to(jnp.asarray(f, dtype=x.dtype), x.shape[:-1])


def interpolate(f, space: FunctionSpace) -> Function:
    """Nodal interpolation: evaluate f at dof points."""
    vals = eval_callable(f, space.dof_points)
    return Function(space, vals)


def project(f, space: FunctionSpace, rtol=1e-14, maxiter=2000) -> Function:
    """L2 projection: solve M x = (f, phi_i) by Jacobi-preconditioned CG.

    Runs on the host CPU backend: projection is setup work (initial/boundary
    data), and its unique shapes would each cold-compile on the TPU tunnel.
    """
    from ..utils.hostsetup import setup_on_cpu

    with setup_on_cpu():
        return _project_impl(f, space, rtol, maxiter)


def _project_impl(f, space: FunctionSpace, rtol, maxiter) -> Function:
    geom = assembly.geometry(space.mesh)
    tab = assembly.tabulation(space, 2 * space.degree + 2)
    xq = geom.physical_points(tab.ref_pts)  # [nc,nq,2]
    if isinstance(f, Function):
        fq = assembly.values_at_qp(
            assembly.tabulation(f.space, 2 * space.degree + 2), f.space.gather(f.vector)
        )
    else:
        fq = eval_callable(f, xq)
    b = assembly.integrate_rhs(space, tab, geom, val=fq)

    diag = assembly.mass_diag(space, geom)
    if space.n_components > 1:
        diag = diag[:, None]

    def A(x):
        return assembly.mass_apply(space, geom, x)

    x, info = krylov.cg(A, b, M=lambda r: r / diag, rtol=rtol, maxiter=maxiter)
    return Function(space, x)


def _qp_values(u, space_hint, xq, tab_map):
    if isinstance(u, Function):
        tab = tab_map(u.space)
        return assembly.values_at_qp(tab, u.space.gather(u.vector))
    return eval_callable(u, xq)


def errornorm(exact, uh: Function, norm_type="L2", rule_degree=6):
    """|| exact - uh ||_{L2(Omega)} by high-order quadrature.

    `exact` is a callable (or tuple of callables) evaluated at physical
    quadrature points; uh is a FE Function. Mirrors dolfin.errornorm's
    "interpolate into a higher space" trick with direct fine quadrature.
    """
    space = uh.space
    geom = assembly.geometry(space.mesh)
    tab = assembly.tabulation(space, rule_degree)
    xq = geom.physical_points(tab.ref_pts)
    ue = eval_callable(exact, xq)
    uhq = assembly.values_at_qp(tab, space.gather(uh.vector))
    diff = ue - uhq
    if diff.ndim == 3:
        sq = jnp.sum(diff * diff, axis=-1)
    else:
        sq = diff * diff
    assert norm_type == "L2"
    val = jnp.einsum("eq,q,e->", sq, tab.w, geom.detJ)
    return float(jnp.sqrt(val))


def norm(u, norm_type="L2", rule_degree=6):
    """Norms of FE Functions / raw dof vectors.

    norm(u, 'L2'): true L2 function norm (dolfin norm(u, 'L2')).
    norm(vec, 'linf'): max-abs of a dof vector (dolfin norm(v, 'linf')).
    """
    if norm_type == "linf":
        v = u.vector if isinstance(u, Function) else u
        return float(jnp.max(jnp.abs(v)))
    assert norm_type in ("L2", "l2")
    if not isinstance(u, Function):
        return float(jnp.sqrt(jnp.sum(u * u)))
    space = u.space
    geom = assembly.geometry(space.mesh)
    tab = assembly.tabulation(space, rule_degree)
    uq = assembly.values_at_qp(tab, space.gather(u.vector))
    if uq.ndim == 3:
        sq = jnp.sum(uq * uq, axis=-1)
    else:
        sq = uq * uq
    return float(jnp.sqrt(jnp.einsum("eq,q,e->", sq, tab.w, geom.detJ)))
