# Packed-backend routing for the public scheme API (VERDICT r4 #7).
#
# `IPCS(backend="packed").step(...)` / `Rotational(backend="packed")`
# execute the reference step contract
# (/root/reference/flow/navier_stokes/pressure_correction.py:521-617:
# `step(dt, u, p0, u_bcs, p_bcs, rho, mu, f, ...) -> (u1, p1)`) through the
# lane-packed patch stepper (navier_stokes/patchfast.py) instead of the
# einsum context — the 29-47x operator architecture (round 4) behind the
# unchanged public surface. Requirements:
#   * the mesh carries refinement parentage (built by refine_uniform, which
#     stamps `mesh._coarse`) — the patch layout needs the hierarchy;
#   * backward-Euler or BDF2 stepping (CN/forward Euler stay einsum);
#   * a NODAL body force: a constant tuple or a (vector) Function whose
#     interpolant the packed mass kernel integrates exactly — equal to the
#     einsum path's quadrature integral of the same interpolant. General
#     callables evaluated at quadrature points are not representable.
# The momentum solve honors the public Newton contract by Picard iteration
# (patchfast.py picard_maxiter/picard_tol): the lagged residual at the
# iterate IS the nonlinear residual, so the ABS stopping + RuntimeError
# semantics match (reference error_on_nonconvergence, :228-254).
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fem.spaces import Function
from ..message import Message, info

__all__ = ["try_packed_step", "mesh_hierarchy_of"]


def mesh_hierarchy_of(mesh):
    """Walk the refine_uniform parentage chain; [] if the mesh has none."""
    chain = [mesh]
    while getattr(chain[0], "_coarse", None) is not None:
        chain.insert(0, chain[0]._coarse)
    return chain if len(chain) >= 2 else []


def _nodal_force(f1, V):
    """f[1] -> nodal [n, 2] array or None (zero) — or raise ValueError."""
    if f1 is None:
        return None
    if isinstance(f1, Function):
        v = np.asarray(f1.vector)
        if v.ndim == 2 and v.shape == (V.n_dofs, 2):
            if not v.any():
                return None
            return jnp.asarray(v, dtype=V.mesh.dtype)
        raise ValueError(
            "packed backend: body-force Function must live on the velocity "
            f"space ([{V.n_dofs}, 2] nodal values, got {v.shape})"
        )
    if isinstance(f1, (tuple, list)) and len(f1) == 2 and all(
        np.isscalar(c) for c in f1
    ):
        if float(f1[0]) == 0.0 and float(f1[1]) == 0.0:
            return None
        v = np.broadcast_to(
            np.asarray(f1, dtype=np.float64), (V.n_dofs, 2)
        ).copy()
        return jnp.asarray(v, dtype=V.mesh.dtype)
    raise ValueError(
        "packed backend supports constant-tuple or nodal-Function body "
        "forces (quadrature-point callables are not representable in the "
        "nodal layout); pass backend=None for the einsum path"
    )


def _get_stepper(V, Q, u_bcs, p_bcs, rho, mu, rotational, tol, cfg):
    key = (
        id(Q), tuple(id(b) for b in u_bcs), tuple(id(b) for b in p_bcs),
        float(rho), float(mu), bool(rotational), float(tol),
        float(cfg.newton_tol), int(cfg.newton_maxiter),
    )
    cache = getattr(V, "_packed_api_cache", None)
    if cache is None:
        cache = {}
        V._packed_api_cache = cache
    st = cache.get(key)
    if st is None:
        from ..fem.patch import build_patch_info, PatchInfo
        from .patchfast import PackedPatchStepper

        hier = mesh_hierarchy_of(V.mesh)
        if not hier:
            raise ValueError(
                "packed backend needs a refine_uniform-built mesh (the "
                "patch layout's hierarchy); build the fine mesh via "
                "flow_tpu.refine_uniform or use backend=None"
            )
        info_ = build_patch_info(hier)
        st = PackedPatchStepper(
            V, Q, u_bcs, p_bcs, rho, mu, info_,
            # the public contract: Newton ABS tol via Picard, tight inner
            # forcing, pressure/correction solves to the caller's tol
            newton_tol=cfg.newton_tol,
            picard_maxiter=max(2, int(cfg.newton_maxiter)),
            picard_tol=float(cfg.newton_tol),
            linear_rtol=1.0e-4,
            pressure_rtol=float(tol),
            pressure_maxiter=600,
            correction_rtol=float(tol),
            rotational_form=rotational,
            hoist_constants=False,
        )
        cache[key] = st
    return st


def try_packed_step(
    dt, u, p0, u_bcs, p_bcs, rho, mu, time_step_method, f,
    rotational_form, tol, cfg, verbose=True, strict=True,
):
    """Execute one public-contract projection step through the packed
    stepper; returns (u1, p1) Functions. strict=False returns None instead
    of raising when the configuration is not packed-representable
    (backend="auto")."""
    try:
        if time_step_method not in ("backward euler", "bdf2"):
            raise ValueError(
                f"packed backend: {time_step_method!r} not supported "
                "(backward euler / bdf2 only)"
            )
        dt = float(dt)
        rho = float(rho)
        mu = float(mu)
        assert dt > 0.0
        assert mu > 0.0
        u0 = u[0]
        V = u0.space
        Q = p0.space
        # BDF2 via the u_hat trick (same algebra as the einsum _step)
        u0vec = u0.vector
        dt_eff = dt
        if time_step_method == "bdf2" and -1 in u:
            u0vec = (4.0 * u[0].vector - u[-1].vector) / 3.0
            dt_eff = 2.0 * dt / 3.0
        Fn = _nodal_force(f[1] if isinstance(f, dict) else f, V)
        st = _get_stepper(
            V, Q, u_bcs, p_bcs, rho, mu, rotational_form, tol, cfg
        )
    except (ValueError, AssertionError):
        if strict:
            raise
        return None

    Uf, Pf = st.to_packed_state(u0vec, p0.vector)
    Ff = None if Fn is None else st.pack_vec(Fn)
    with Message("Computing projection step (packed backend)"):
        U1f, P1f, stats = st.step_api(Uf, Pf, dt_eff, Ff)
        nres = float(stats.newton_res)
        if verbose:
            info(
                "packed picard: iters=%d, |r|=%.3e; pressure cg: %d; "
                "mass cg: %d",
                int(stats.newton_iters), nres, int(stats.pressure_iters),
                int(stats.correction_iters),
            )
        if nres > 10.0 * cfg.newton_tol:
            raise RuntimeError(
                f"Newton solver did not converge (residual {nres:.3e})"
            )
        if not bool(stats.pressure_converged):
            raise RuntimeError("Pressure Poisson solve did not converge")
        if not bool(stats.correction_converged):
            raise RuntimeError("Velocity correction solve did not converge")
    U1, P1 = st.from_packed_state(U1f, P1f)
    return Function(V, U1), Function(Q, P1)
