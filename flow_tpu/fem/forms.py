# Hand-derived weak-form operators for the incompressible-flow forms.
#
# This is the framework's "form compiler": instead of UFL -> FFC -> C++
# (/root/reference/flow/navier_stokes/pressure_correction.py:134-144,
# flow/stokes.py:40-57), each bilinear/trilinear form this library needs is
# derived once on the reference element and applied as a batched einsum
# contraction over all cells. Constant-coefficient forms are quadrature-exact
# via factored reference tensors; coefficient-dependent forms evaluate at
# quadrature points and let XLA fuse the chain.
#
# Vector fields are [n_dofs, 2]; scalar fields [n_dofs].
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import assembly, elements, quadrature
from .assembly import Geometry, ref_stiffness, ref_mixed
from .spaces import FunctionSpace

__all__ = [
    "vector_laplacian_apply",
    "sym_grad_apply",
    "div_rhs",
    "pressure_grad_rhs",
    "convection_rhs",
    "skew_convection_rhs",
    "skew_convection_combined_rhs",
    "grad_div_ustar_rhs",
    "grad_phi_rhs",
    "ref_p1_integrals",
]


def vector_laplacian_apply(V: FunctionSpace, geom: Geometry, U, coeff=None):
    """y[(i,a)] = int c grad(u_a) . grad(v_a): component-wise stiffness
    (the full-gradient viscous term of /root/reference/flow/stokes.py:40)."""
    return assembly.stiffness_apply(V, geom, U, coeff=coeff)


def sym_grad_apply(V: FunctionSpace, geom: Geometry, U, mu):
    """y = 2 mu int eps(u):eps(v) — the stress form's viscous part
    (sigma(u, p) = 2 mu eps(u) - p I, pressure handled separately;
    /root/reference/flow/navier_stokes/pressure_correction.py:121-126,141).

    2 eps(u):eps(v) = grad(u):grad(v) + grad(u)^T : grad(v).
    """
    Kref = jnp.asarray(ref_stiffness(V.degree, assembly._dim(V)), dtype=U.dtype)
    Uloc = V.gather(U)
    # component-wise part: mu * C[e,k,l] Kref[k,l,i,j] U[e,j,a]
    loc = jnp.einsum("ekl,klij,eja->eia", geom.C, Kref, Uloc)
    # transpose part: mu * detJ G[e,a,k] G[e,b,l] Kref[k,l,j,i] U[e,j,b]
    loc = loc + jnp.einsum(
        "e,eak,ebl,klji,ejb->eia", geom.detJ, geom.G, geom.G, Kref, Uloc
    )
    return V.dof_sum(mu * loc)


def div_rhs(V: FunctionSpace, Q: FunctionSpace, geom: Geometry, U):
    """b[m] = int div(u) q_m  (exact; u in V=P2 vector, q in Q=P1)."""
    Bref = jnp.asarray(ref_mixed(Q.degree, V.degree, assembly._dim(V)), dtype=U.dtype)
    Uloc = V.gather(U)
    loc = jnp.einsum("e,ebk,kmj,ejb->em", geom.detJ, geom.G, Bref, Uloc)
    return Q.dof_sum(loc)


def pressure_grad_rhs(V: FunctionSpace, Q: FunctionSpace, geom: Geometry, P):
    """b[(i,a)] = int p d_a(v_i)  (exact) — the `+ p0 div(v)` part of the
    stress form, and the Stokes B^T block."""
    Bref = jnp.asarray(ref_mixed(Q.degree, V.degree, assembly._dim(V)), dtype=P.dtype)
    Ploc = Q.gather(P)
    loc = jnp.einsum("e,eak,kmi,em->eia", geom.detJ, geom.G, Bref, Ploc)
    return V.dof_sum(loc)


def convection_rhs(V: FunctionSpace, geom: Geometry, W, U, rule_degree=5):
    """b[(i,a)] = int ((w . grad) u)_a v_i  — trilinear, quadrature-based."""
    tab = assembly.tabulation(V, rule_degree)
    Wq = assembly.values_at_qp(tab, V.gather(W))  # [e,q,2]
    gradU = assembly.grads_at_qp(tab, geom, V.gather(U))  # [e,q,a,d]
    val = jnp.einsum("eqd,eqad->eqa", Wq, gradU)
    return assembly.integrate_rhs(V, tab, geom, val=val)


def skew_convection_rhs(V: FunctionSpace, geom: Geometry, W, U, rule_degree=5):
    """b[(i,a)] = int ((w . grad) v)_a u — i.e. int (w . grad(phi_i)) u_a.

    Second half of the skew-symmetric convection
    0.5*(<(u.grad)u, v> - <(u.grad)v, u>)
    (/root/reference/flow/navier_stokes/pressure_correction.py:138)."""
    tab = assembly.tabulation(V, rule_degree)
    Wq = assembly.values_at_qp(tab, V.gather(W))  # [e,q,d]
    Uq = assembly.values_at_qp(tab, V.gather(U))  # [e,q,a]
    grad = jnp.einsum("eqd,eqa->eqad", Wq, Uq)
    return assembly.integrate_rhs(V, tab, geom, grad=grad)


def skew_convection_combined_rhs(V: FunctionSpace, geom: Geometry, W, rule_degree=5):
    """b = 0.5 * ( <(w.grad)w, v> - <(w.grad)v, w> ) in ONE quadrature pass
    (shared W evaluations; the hot term of the momentum residual)."""
    tab = assembly.tabulation(V, rule_degree)
    Wloc = V.gather(W)
    Wq = assembly.values_at_qp(tab, Wloc)  # [e,q,d]
    gradW = assembly.grads_at_qp(tab, geom, Wloc)  # [e,q,a,d]
    val = 0.5 * jnp.einsum("eqd,eqad->eqa", Wq, gradW)
    grad = -0.5 * jnp.einsum("eqd,eqa->eqad", Wq, Wq)
    return assembly.integrate_rhs(V, tab, geom, val=val, grad=grad)


def grad_div_ustar(V: FunctionSpace, geom: Geometry, U):
    """Per-element constant grad(div u*) [nc, 2] for P2 u* (rotational form,
    /root/reference/flow/navier_stokes/pressure_correction.py:322-323)."""
    Href = jnp.asarray(elements.hessian_ref(V.degree, assembly._dim(V)), dtype=U.dtype)
    Uloc = V.gather(U)
    # d_d d_a phi_j = G[a,k] G[d,l] Href[j,k,l]
    return jnp.einsum("eak,edl,jkl,eja->ed", geom.G, geom.G, Href, Uloc)


def grad_div_ustar_rhs(V: FunctionSpace, Q: FunctionSpace, geom: Geometry, U):
    """b[m] = int grad(div u*) . grad(q_m)  (exact; q in P1)."""
    dim = assembly._dim(V)
    v = grad_div_ustar(V, geom, U)  # [e,dim]
    _, dphi1 = elements.tabulate(Q.degree, np.zeros((1, dim)), dim=dim)
    dref = jnp.asarray(dphi1[0], dtype=U.dtype)  # [3,2] const P1 ref grads
    # grad q_m = G[d,k] dref[m,k]; simplex volume = detJ / dim!
    volfac = 0.5 if dim == 2 else (1.0 / 6.0)
    loc = volfac * jnp.einsum("e,ed,edk,mk->em", geom.detJ, v, geom.G, dref)
    return Q.dof_sum(loc)


def grad_phi_rhs(
    V: FunctionSpace,
    Q: FunctionSpace,
    geom: Geometry,
    phi,
    div_part=None,
    rule_degree=3,
):
    """b[(i,a)] = int grad(phi)_a v_i, phi in Q (P1), optionally plus a
    per-element-constant extra gradient term `div_part` = mu * grad(div u*)
    [nc,2] (rotational velocity correction,
    /root/reference/flow/navier_stokes/pressure_correction.py:444-449)."""
    tab = assembly.tabulation(V, rule_degree)
    qtab = assembly.tabulation(Q, rule_degree)  # same quadrature points
    gphi = assembly.grads_at_qp(qtab, geom, Q.gather(phi))  # [e,q,2]
    if div_part is not None:
        gphi = gphi + div_part[:, None, :]
    return assembly.integrate_rhs(V, tab, geom, val=gphi)


def ref_p1_integrals(degree, dim=2):
    """int_ref phi_i for the given degree (exact)."""
    pts, w = quadrature.simplex_rule(degree + 1, dim)
    phi, _ = elements.tabulate(degree, pts, dim=dim)
    return np.einsum("q,qi->i", w, phi)


# ---------------------------------------------------------------------------
# Local (pre-dof-sum) variants — the fused momentum-residual path.
#
# Every term of the NS momentum residual produces local contributions of the
# same shape [nc, nl, m]; computing them from ONE gathered Uloc and summing
# locally lets the residual do a single dof summation instead of one per
# form (dof summation = gather-bound, the measured hot-path cost on TPU).
# ---------------------------------------------------------------------------
def mass_loc(V: FunctionSpace, geom: Geometry, Uloc):
    Mref = jnp.asarray(
        assembly.ref_mass(V.degree, assembly._dim(V)), dtype=Uloc.dtype
    )
    return jnp.einsum("ij,ejm,e->eim", Mref, Uloc, geom.detJ)


def sym_grad_loc(V: FunctionSpace, geom: Geometry, Uloc, mu):
    Kref = jnp.asarray(ref_stiffness(V.degree, assembly._dim(V)), dtype=Uloc.dtype)
    loc = jnp.einsum("ekl,klij,eja->eia", geom.C, Kref, Uloc)
    loc = loc + jnp.einsum(
        "e,eak,ebl,klji,ejb->eia", geom.detJ, geom.G, geom.G, Kref, Uloc
    )
    return mu * loc


def pressure_grad_loc(V: FunctionSpace, Q: FunctionSpace, geom: Geometry, Ploc):
    Bref = jnp.asarray(
        ref_mixed(Q.degree, V.degree, assembly._dim(V)), dtype=Ploc.dtype
    )
    return jnp.einsum("e,eak,kmi,em->eia", geom.detJ, geom.G, Bref, Ploc)


def stiffness_scalar_loc(V: FunctionSpace, geom: Geometry, dtype):
    """Constant component-diagonal scalar element tensor of the stress form:
    Kscal[e, i, j] = C[e, k, l] Kref[k, l, i, j] — i.e. the grad(u):grad(v)
    half of 2 eps(u):eps(v) as a per-cell [nl, nl] matrix (exact, affine
    geometry). The transpose half couples components and stays factored
    (sym_grad_transpose_loc); together they reproduce sym_grad_loc."""
    Kref = jnp.asarray(ref_stiffness(V.degree, assembly._dim(V)), dtype=dtype)
    return jnp.einsum("ekl,klij->eij", jnp.asarray(geom.C, dtype=dtype), Kref)


def sym_grad_transpose_loc(V: FunctionSpace, geom: Geometry, Xloc):
    """loc[e,i,a] = detJ[e] G[e,a,k] G[e,b,l] Kref[k,l,j,i] X[e,j,b] — the
    component-coupling grad(u)^T:grad(v) half of the stress form, applied
    through its factored reference tensor (no per-cell block storage)."""
    Kref = jnp.asarray(ref_stiffness(V.degree, assembly._dim(V)), dtype=Xloc.dtype)
    # contraction order keeps every intermediate at [e, small, small]
    w = jnp.einsum("ebl,ejb->elj", geom.G, Xloc)
    u = jnp.einsum("klji,elj->eki", Kref, w)
    return jnp.einsum("e,eak,eki->eia", geom.detJ, geom.G, u)


def skew_convection_combined_loc(V, geom, Wloc, rule_degree=5):
    tab = assembly.tabulation(V, rule_degree)
    Wq = assembly.values_at_qp(tab, Wloc)  # [e,q,d]
    gradW = assembly.grads_at_qp(tab, geom, Wloc)  # [e,q,a,d]
    val = 0.5 * jnp.einsum("eqd,eqad->eqa", Wq, gradW)
    grad = -0.5 * jnp.einsum("eqd,eqa->eqad", Wq, Wq)
    wd = tab.w[None, :] * geom.detJ[:, None]
    loc = jnp.einsum("eqm,eq,qi->eim", val, wd, tab.phi)
    loc = loc + jnp.einsum("eqmd,eq,qik,edk->eim", grad, wd, tab.dphi, geom.G)
    return loc


def skew_convection_lagged_loc(V, geom, Tloc, Uloc, rule_degree=5):
    """Skew convection with a FIXED transport field T (linear in U):
    0.5 [((T.grad)u, v) - ((T.grad)v, u)] at the element level.

    The semi-implicit ("lagged" / extrapolated-convection) momentum
    linearization: with T = u^n (BE) or the second-order extrapolation
    (BDF2/CN), the tentative-velocity system becomes one LINEAR solve per
    step instead of a Newton loop — the classic IPCS treatment the
    reference's Newton path generalizes
    (/root/reference/flow/navier_stokes/pressure_correction.py:169-190
    discretizes the same skew form; lagging T is standard Guermond/IPCS
    practice). Identical to skew_convection_combined_loc when Tloc==Uloc.
    """
    tab = assembly.tabulation(V, rule_degree)
    Tq = assembly.values_at_qp(tab, Tloc)  # [e,q,d]
    Uq = assembly.values_at_qp(tab, Uloc)  # [e,q,a]
    gradU = assembly.grads_at_qp(tab, geom, Uloc)  # [e,q,a,d]
    val = 0.5 * jnp.einsum("eqd,eqad->eqa", Tq, gradU)
    grad = -0.5 * jnp.einsum("eqd,eqa->eqad", Tq, Uq)
    wd = tab.w[None, :] * geom.detJ[:, None]
    loc = jnp.einsum("eqm,eq,qi->eim", val, wd, tab.phi)
    loc = loc + jnp.einsum("eqmd,eq,qik,edk->eim", grad, wd, tab.dphi, geom.G)
    return loc


def conv_lagged_jacobian_loc(V, geom, Tloc, rule_degree=5):
    """Element Jacobian of skew_convection_lagged_loc wrt the velocity dofs
    with the transport T FROZEN: component-diagonal SCALAR [nc, nl, nl]

        J[e, i, j] = 0.5 int [ phi_i (T.grad phi_j) - phi_j (T.grad phi_i) ]

    (the antisymmetric `s23` part of conv_jacobian_loc — the t1/t4 reaction
    blocks vanish because T does not move with the state). This is the whole
    x-dependent volume operator of the semi-implicit momentum solve, so the
    assembled-ELL lagged path rebuilds only this scalar tensor once per step.

    Honors FLOW_CELL_CHUNK: the [nc, nq, nl(,nl)]-class quadrature temps of
    this build dominate HBM for large 3-D meshes (P2 tets: nq=15, nl=10 —
    measured OOM at cavity3d N=64, BENCH_NOTES chain-17), so the evaluation
    runs chunk-by-chunk through a sequential lax.map exactly like the
    residual path's _volume_loc_dispatch."""
    import os as _os

    chunk = int(_os.environ.get("FLOW_CELL_CHUNK", "0"))
    nc = Tloc.shape[0]
    if chunk and nc > chunk:
        import jax as _jax

        k = -(-nc // chunk)
        pad = k * chunk - nc

        def prep(a):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])],
                    axis=0,
                )
            return a.reshape((k, chunk) + a.shape[1:])

        class _G:
            pass

        def body(t):
            tl, dj, Gm = t
            g = _G()
            g.detJ, g.G = dj, Gm
            return _conv_lagged_jacobian_impl(V, g, tl, rule_degree)

        s = _jax.lax.map(
            body, (prep(Tloc), prep(geom.detJ), prep(geom.G))
        )
        s = s.reshape((k * chunk,) + s.shape[2:])
        return s[:nc] if pad else s
    return _conv_lagged_jacobian_impl(V, geom, Tloc, rule_degree)


def _conv_lagged_jacobian_impl(V, geom, Tloc, rule_degree):
    tab = assembly.tabulation(V, rule_degree)
    Tq = assembly.values_at_qp(tab, Tloc)  # [e,q,d]
    wd = tab.w[None, :] * geom.detJ[:, None]
    phi = jnp.asarray(tab.phi, dtype=Tloc.dtype)
    dphi = jnp.asarray(tab.dphi, dtype=Tloc.dtype)
    A = jnp.einsum("eqd,qmk,edk->eqm", Tq, dphi, geom.G)  # (T.grad phi_m)
    s = jnp.einsum("eq,qi,eqj->eij", wd, phi, A)
    return 0.5 * (s - jnp.swapaxes(s, 1, 2))


def conv_jacobian_loc(V, geom, Wloc, rule_degree=5):
    """Element Jacobian of skew_convection_combined_loc wrt the velocity
    dofs: d(conv_loc[e, i, a]) / d(U[j, b]) -> [nc, nl, nl, d, d]
    (index order [e, i, j, a, b]).

    Same quadrature rule as the residual, so assembling this tensor yields
    the exact discrete volume Jacobian (the analytic replacement for
    re-evaluating the jax.linearize tangent through the quadrature pipeline
    on every Krylov matvec). Terms, from c(w; phi_i e_a) =
    0.5 (w.grad w_a, phi_i) - 0.5 (w_a w, grad phi_i):
       0.5 phi_i phi_j d_b w_a
     + 0.5 delta_ab phi_i (w.grad phi_j)
     - 0.5 delta_ab phi_j (w.grad phi_i)
     - 0.5 w_a phi_j d_b phi_i
    """
    tab = assembly.tabulation(V, rule_degree)
    Wq = assembly.values_at_qp(tab, Wloc)  # [e,q,d]
    gradW = assembly.grads_at_qp(tab, geom, Wloc)  # [e,q,a,d] = dw_a/dx_d
    wd = tab.w[None, :] * geom.detJ[:, None]
    phi = jnp.asarray(tab.phi, dtype=Wloc.dtype)
    dphi = jnp.asarray(tab.dphi, dtype=Wloc.dtype)
    G = geom.G  # [e,d,k]: grad_phys[d] = G[d,k] grad_ref[k]
    A = jnp.einsum("eqd,qmk,edk->eqm", Wq, dphi, G)  # (w.grad phi_m) at qp
    t1 = jnp.einsum("eq,qi,qj,eqab->eijab", wd, phi, phi, gradW)
    s23 = jnp.einsum("eq,qi,eqj->eij", wd, phi, A)
    s23 = s23 - jnp.einsum("eq,qj,eqi->eij", wd, phi, A)
    t4 = jnp.einsum("eq,eqa,qj,qik,ebk->eijab", wd, Wq, phi, dphi, G)
    d = Wq.shape[-1]
    eye = jnp.eye(d, dtype=Wloc.dtype)
    return 0.5 * (t1 - t4 + s23[:, :, :, None, None] * eye)


def body_force_loc(V, geom, Fq, rule_degree=6):
    tab = assembly.tabulation(V, rule_degree)
    wd = tab.w[None, :] * geom.detJ[:, None]
    return jnp.einsum("eqm,eq,qi->eim", Fq, wd, tab.phi)
