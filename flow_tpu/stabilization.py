# SUPG stabilization for convection-dominated transport.
#
# Pure-JAX rebuild of the reference's JIT-compiled C++ SupgStab Expression
# (/root/reference/flow/stabilization.py:38-145): per-quadrature-point
#     tau = h^2 / (4 eps p) * xi(Pe),  Pe = ||b|| h / (2 p eps),
# with h the *directed* cell diameter along the convection b,
#     h = 4 ||b|| area / sum_edges |e x b|,
# and xi(Pe) = (1/tanh(Pe) - 1/Pe)/Pe, Taylor-expanded for small Pe
# (stabilization.py:119-125). Vectorized over all cells x quadrature points;
# branch-free (jnp.where replaces the early-exit and Taylor branches).
#
# Deviation from the reference: the tau > 1e3 sanity check (which throws from
# C++, stabilization.py:132-140) cannot raise inside jit — call `check_tau`
# on the host for the same guard.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["supg", "supg_tau", "check_tau"]


def check_tau(tau, limit=1.0e3):
    """Host-side equivalent of the reference's C++ sanity guard
    (stabilization.py:132-140): raise if any tau exceeds `limit`."""
    tmax = float(jnp.max(tau))
    if tmax > limit:
        raise RuntimeError(
            f"SUPG tau sanity check failed: max tau = {tmax:.3e} > {limit:.0e}"
        )
    return tau


def supg_tau(mesh, conv_at_qp, diffusion, element_degree):
    """tau at quadrature points.

    conv_at_qp: [nc, nq, dim] convection evaluated at the quadrature points.
    Returns [nc, nq]. The 2-D branch reproduces the reference's edge-cross
    formula bit-for-bit; the 3-D branch (new capability — the reference's C++
    is triangle-only, stabilization.py:84) uses the equivalent general form
    of the directed diameter, h = 2 ||b|| / sum_i |b . grad(psi_i)| over the
    P1 vertex basis functions.
    """
    if getattr(mesh, "dim", 2) == 3:
        return _supg_tau_3d(mesh, conv_at_qp, diffusion, element_degree)
    p = mesh.points
    c = mesh.cells
    # the three edges (i<j vertex pairs, matching the C++ double loop)
    e01 = p[c[:, 0]] - p[c[:, 1]]
    e02 = p[c[:, 0]] - p[c[:, 2]]
    e12 = p[c[:, 1]] - p[c[:, 2]]
    d0 = p[c[:, 1]] - p[c[:, 0]]
    d1 = p[c[:, 2]] - p[c[:, 0]]
    area = 0.5 * (d0[:, 0] * d1[:, 1] - d0[:, 1] * d1[:, 0])

    b = conv_at_qp
    bnorm = jnp.sqrt(b[..., 0] ** 2 + b[..., 1] ** 2)  # [nc, nq]

    def cross(e):
        return jnp.abs(e[:, None, 1] * b[..., 0] - e[:, None, 0] * b[..., 1])

    s = cross(e01) + cross(e02) + cross(e12)
    s = jnp.where(s == 0, 1.0, s)
    h = 4.0 * bnorm * area[:, None] / s

    eps = diffusion
    pe = 0.5 * bnorm * h / (element_degree * eps)
    pe_safe = jnp.where(pe > 1.0e-5, pe, 1.0)
    xi_full = (1.0 / jnp.tanh(pe_safe) - 1.0 / pe_safe) / pe_safe
    xi_taylor = 1.0 / 3.0 - pe**2 / 45.0 + 2.0 / 945.0 * pe**4
    xi = jnp.where(pe > 1.0e-5, xi_full, xi_taylor)

    tau = h * h / (4.0 * eps * element_degree) * xi
    return jnp.where(bnorm < 1.0e-10, 0.0, tau)


def _supg_tau_3d(mesh, conv_at_qp, diffusion, element_degree):
    from .fem.assembly import geometry

    geom = geometry(mesh)
    # P1 reference gradients: dlam [4, 3]; grad psi_i = G dlam_i
    dlam = jnp.asarray(
        np.concatenate([-np.ones((1, 3)), np.eye(3)], axis=0),
        dtype=mesh.dtype,
    )
    gpsi = jnp.einsum("edk,ik->eid", geom.G, dlam)  # [nc, 4, 3]
    b = conv_at_qp  # [nc, nq, 3]
    bnorm = jnp.sqrt(jnp.sum(b * b, axis=-1))
    s = jnp.sum(jnp.abs(jnp.einsum("eqd,eid->eqi", b, gpsi)), axis=-1)
    s = jnp.where(s == 0, 1.0, s)
    h = 2.0 * bnorm / s

    eps = diffusion
    pe = 0.5 * bnorm * h / (element_degree * eps)
    pe_safe = jnp.where(pe > 1.0e-5, pe, 1.0)
    xi_full = (1.0 / jnp.tanh(pe_safe) - 1.0 / pe_safe) / pe_safe
    xi_taylor = 1.0 / 3.0 - pe**2 / 45.0 + 2.0 / 945.0 * pe**4
    xi = jnp.where(pe > 1.0e-5, xi_full, xi_taylor)
    tau = h * h / (4.0 * eps * element_degree) * xi
    return jnp.where(bnorm < 1.0e-10, 0.0, tau)


def supg(mesh, convection, diffusion, element_degree):
    """API-parity wrapper (reference stabilization.py:13): returns a callable
    tau(conv_at_qp) so callers that already have quadrature-point convection
    values can evaluate tau. flow_tpu.heat.Heat uses supg_tau directly."""

    def tau(conv_at_qp):
        return supg_tau(mesh, conv_at_qp, diffusion, element_degree)

    return tau
