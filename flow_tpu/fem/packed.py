# Lane-packed FEM kernels: the TPU-native data layout for the NS hot path.
#
# WHY (measured, round 3): XLA:TPU tiles the minor-most two axes of every
# array to (8, 128) for f32. The "natural" FEM layouts are catastrophically
# tile-hostile at scale:
#     velocity state [n, 2]          -> 64x padding (each 2-wide row
#                                       occupies one 128-lane line)
#     cell_dofs      [nc, 6]  int32  -> 21x
#     geometry G/C   [nc, 2, 2]      -> 64x
#     quadrature temps [nc, q, m, d] -> 28-64x
# At 7.6M DoF the fused step demanded 29.4 GB of the 15.75 GB HBM — almost
# all padding (BENCH_NOTES round-3). The padding also explains the measured
# "gather rate is row-count-bound": every gathered row pulls a full padded
# 512 B lane line, so the bound is really HBM bandwidth on padding.
#
# THE PACKED LAYOUT: everything is a 1-D stream (or a [k, N] table with the
# big axis minor-most), and the small tensor indices (component a/b, local
# dof i/j, derivative k/d, quadrature q) become UNROLLED Python loops over
# [e]/[n]-shaped vector ops that XLA fuses into single passes. No MXU loss:
# the replaced einsums had inner dims 2-6 — far below MXU-efficient shapes;
# this path is bandwidth-bound and the packing removes 10-60x of the bytes.
#
# Scope: the 2-D Taylor-Hood (P2 vector / P1 scalar) projection-step kernels
# used by FastStepper. Exactness vs the einsum path is pinned in
# tests/test_packed.py.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import assembly, elements, quadrature
from .assembly import ref_mass, ref_stiffness, ref_mixed
from .spaces import FunctionSpace

__all__ = ["PackedContext"]


def _adjT_imaj(space):
    """Transposed, i-major-flat dof-sum tables: for each valence class,
    (idxT [mv, nrow] int32, mskT [mv, nrow]) with indices into the
    i-major flattened local array (i * nc + e)."""
    nl = space.n_local
    nc = space.cell_dofs_np.shape[0]
    out = []
    for idx, msk in space._adj:
        idx = np.asarray(idx)
        msk = np.asarray(msk)
        # idx holds cell-major flat indices e*nl + i
        e = idx // nl
        i = idx % nl
        out.append(
            (
                jnp.asarray((i * nc + e).T.astype(np.int32)),
                jnp.asarray(msk.T, dtype=space.mesh.dtype),
            )
        )
    return out


class PackedContext:
    """Precomputed packed tables for one (V, Q) Taylor-Hood pair."""

    def __init__(self, V: FunctionSpace, Q: FunctionSpace, conv_rule=5):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(V, Q, conv_rule)

    def _build(self, V, Q, conv_rule):
        assert getattr(V.mesh, "dim", 2) == 2 and V.degree == 2 and Q.degree == 1
        self.V, self.Q = V, Q
        mesh = V.mesh
        dtype = mesh.dtype
        self.n = V.n_dofs
        self.nc = mesh.n_cells
        self.nlV = V.n_local  # 6
        self.nlQ = Q.n_local  # 3

        geom = assembly.geometry(mesh)
        self.detJ = geom.detJ  # [e] — 1-D, pad-free
        G = np.asarray(geom.G)  # [e, d, k]
        C = np.asarray(geom.C)  # [e, k, l]
        self.G = [[jnp.asarray(G[:, d, k], dtype=dtype) for k in range(2)]
                  for d in range(2)]
        self.C = [[jnp.asarray(C[:, k, l], dtype=dtype) for l in range(2)]
                  for k in range(2)]

        # transposed dof tables: row slices are contiguous [nc] vectors
        self.cdV = jnp.asarray(V.cell_dofs_np.T.copy())  # [nlV, nc]
        self.cdQ = jnp.asarray(Q.cell_dofs_np.T.copy())  # [nlQ, nc]
        self.adjV = _adjT_imaj(V)
        self.adjQ = _adjT_imaj(Q)

        # reference tensors (small, numpy floats — trace-time constants)
        self.Mref = ref_mass(2, 2)
        self.Kref = ref_stiffness(2, 2)
        self.Bref = ref_mixed(1, 2)  # [k, m(Q), j(V)]
        self.Href = elements.hessian_ref(2, 2)  # [j, k, l]
        pts4, w4 = quadrature.simplex_rule(4, 2)
        phi4, _ = elements.tabulate(2, pts4)
        self.intV_ref = np.einsum("q,qi->i", w4, phi4)  # exact int_ref phi_i
        dphi1 = elements.tabulate(1, np.zeros((1, 2)))[1][0]  # [m, k] const
        self.drefQ = dphi1

        # convection quadrature tabulation
        pts, w = quadrature.simplex_rule(conv_rule, 2)
        phi, dphi = elements.tabulate(2, pts)
        self.cq_w = w  # [q] numpy
        self.cq_phi = phi  # [q, i]
        self.cq_dphi = dphi  # [q, i, k]
        self.nq = len(w)

    # ------------------------------------------------------------------
    # layout converters
    # ------------------------------------------------------------------
    def pack(self, U):
        """[n, 2] -> flat [2n] (component blocks)."""
        return jnp.concatenate([U[:, 0], U[:, 1]])

    def unpack(self, Uf):
        return jnp.stack([Uf[: self.n], Uf[self.n:]], axis=1)

    def comps(self, Uf):
        return Uf[: self.n], Uf[self.n:]

    # ------------------------------------------------------------------
    # gather / dof-sum
    # ------------------------------------------------------------------
    def gatherV(self, Uc):
        """scalar component [n] -> list of nlV arrays [nc]."""
        return [Uc[self.cdV[i]] for i in range(self.nlV)]

    def gatherQ(self, Pc):
        return [Pc[self.cdQ[m]] for m in range(self.nlQ)]

    @staticmethod
    def _dof_sum(loc_list, adjT, nc):
        flat = jnp.concatenate(loc_list)  # [nl * nc], i-major
        parts = []
        for idxT, mskT in adjT:
            if idxT.shape[1] == 0:
                continue
            acc = mskT[0] * flat[idxT[0]]
            for k in range(1, idxT.shape[0]):
                acc = acc + mskT[k] * flat[idxT[k]]
            parts.append(acc)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def dof_sum_V(self, loc_list):
        return self._dof_sum(loc_list, self.adjV, self.nc)

    def dof_sum_Q(self, loc_list):
        return self._dof_sum(loc_list, self.adjQ, self.nc)

    def dof_sum_V2(self, loc):
        """loc[a][i] lists of [nc] -> flat [2n]."""
        return jnp.concatenate(
            [self.dof_sum_V(loc[0]), self.dof_sum_V(loc[1])]
        )

    # ------------------------------------------------------------------
    # momentum-residual volume terms (all return loc[a][i] accumulators)
    # ------------------------------------------------------------------
    def _zero_loc(self, like):
        z = jnp.zeros_like(self.detJ).astype(like.dtype)
        return [[z for _ in range(self.nlV)] for _ in range(2)]

    def mass_loc_acc(self, loc, Ul, scale=1.0):
        """loc[a][i] += scale * detJ * sum_j Mref[i,j] Ul[a][j]."""
        for a in range(2):
            for i in range(self.nlV):
                s = None
                for j in range(self.nlV):
                    t = self.Mref[i, j] * Ul[a][j]
                    s = t if s is None else s + t
                loc[a][i] = loc[a][i] + scale * self.detJ * s
        return loc

    def sym_grad_loc_acc(self, loc, Ul, mu):
        """loc[a][i] += mu * [ C_kl Kref[k,l,i,j] U_a[j]
                             + detJ G_ak G_bl Kref[k,l,j,i] U_b[j] ]."""
        Kref = self.Kref
        for a in range(2):
            for i in range(self.nlV):
                s = None
                for k in range(2):
                    for l in range(2):
                        cj = None
                        for j in range(self.nlV):
                            w = Kref[k, l, i, j]
                            if w == 0.0:
                                continue
                            t = w * Ul[a][j]
                            cj = t if cj is None else cj + t
                        if cj is None:
                            continue
                        t = self.C[k][l] * cj
                        s = t if s is None else s + t
                # transpose part
                for b in range(2):
                    for k in range(2):
                        for l in range(2):
                            cj = None
                            for j in range(self.nlV):
                                w = Kref[k, l, j, i]
                                if w == 0.0:
                                    continue
                                t = w * Ul[b][j]
                                cj = t if cj is None else cj + t
                            if cj is None:
                                continue
                            t = self.detJ * ((self.G[a][k] * self.G[b][l]) * cj)
                            s = t if s is None else s + t
                loc[a][i] = loc[a][i] + mu * s
        return loc

    def pressure_grad_loc_acc(self, loc, Pl, scale=1.0):
        """loc[a][i] += scale * detJ * G_ak Bref[k,m,i] P[m]."""
        for a in range(2):
            for i in range(self.nlV):
                s = None
                for k in range(2):
                    cm = None
                    for m in range(self.nlQ):
                        w = self.Bref[k, m, i]
                        if w == 0.0:
                            continue
                        t = w * Pl[m]
                        cm = t if cm is None else cm + t
                    if cm is None:
                        continue
                    t = self.G[a][k] * cm
                    s = t if s is None else s + t
                loc[a][i] = loc[a][i] + scale * self.detJ * s
        return loc

    def skew_conv_loc_acc(self, loc, Ul, scale=1.0):
        """loc[a][i] += scale * [skew-symmetric convection of W=U]
        (the exact quadrature of forms.skew_convection_combined_loc)."""
        phi, dphi, w = self.cq_phi, self.cq_dphi, self.cq_w
        for q in range(self.nq):
            wdq = (w[q] * scale) * self.detJ
            # W at qp, per component
            Wq = []
            for d in range(2):
                s = None
                for i in range(self.nlV):
                    p = phi[q, i]
                    if p == 0.0:
                        continue
                    t = p * Ul[d][i]
                    s = t if s is None else s + t
                Wq.append(s)
            # reference gradients sum_i dphi[q,i,k] U_a[i]
            rg = [[None, None], [None, None]]
            for a in range(2):
                for k in range(2):
                    s = None
                    for i in range(self.nlV):
                        dp = dphi[q, i, k]
                        if dp == 0.0:
                            continue
                        t = dp * Ul[a][i]
                        s = t if s is None else s + t
                    rg[a][k] = s
            # physical gradients gW[a][d] = G[d][k] rg[a][k]
            gW = [
                [
                    self.G[d][0] * rg[a][0] + self.G[d][1] * rg[a][1]
                    for d in range(2)
                ]
                for a in range(2)
            ]
            # val[a] = 0.5 sum_d Wq[d] gW[a][d]
            val = [
                0.5 * (Wq[0] * gW[a][0] + Wq[1] * gW[a][1]) for a in range(2)
            ]
            for i in range(self.nlV):
                p = phi[q, i]
                # gphi_i[d] = G[d][k] dphi[q,i,k]
                g0 = self.G[0][0] * dphi[q, i, 0] + self.G[0][1] * dphi[q, i, 1]
                g1 = self.G[1][0] * dphi[q, i, 0] + self.G[1][1] * dphi[q, i, 1]
                for m in range(2):
                    # grad part: -0.5 Wq[d] Wq[m] against gphi_i[d]
                    contrib = val[m] * p - 0.5 * Wq[m] * (
                        Wq[0] * g0 + Wq[1] * g1
                    )
                    loc[m][i] = loc[m][i] + wdq * contrib
        return loc

    def skew_conv_lagged_loc_acc(self, loc, Tl, Ul, scale=1.0):
        """loc[a][i] += scale * [skew convection with FIXED transport T]
        = 0.5 [((T.grad)u, v) - ((T.grad)v, u)] — the semi-implicit/lagged
        linearization (exact quadrature of forms.skew_convection_lagged_loc,
        linear in U)."""
        phi, dphi, w = self.cq_phi, self.cq_dphi, self.cq_w
        for q in range(self.nq):
            wdq = (w[q] * scale) * self.detJ
            Tq = []
            Uq = []
            for d in range(2):
                st = None
                su = None
                for i in range(self.nlV):
                    p = phi[q, i]
                    if p == 0.0:
                        continue
                    tt = p * Tl[d][i]
                    tu = p * Ul[d][i]
                    st = tt if st is None else st + tt
                    su = tu if su is None else su + tu
                Tq.append(st)
                Uq.append(su)
            rg = [[None, None], [None, None]]
            for a in range(2):
                for k in range(2):
                    su = None
                    for i in range(self.nlV):
                        dp = dphi[q, i, k]
                        if dp == 0.0:
                            continue
                        t = dp * Ul[a][i]
                        su = t if su is None else su + t
                    rg[a][k] = su
            gU = [
                [
                    self.G[d][0] * rg[a][0] + self.G[d][1] * rg[a][1]
                    for d in range(2)
                ]
                for a in range(2)
            ]
            val = [
                0.5 * (Tq[0] * gU[a][0] + Tq[1] * gU[a][1]) for a in range(2)
            ]
            for i in range(self.nlV):
                p = phi[q, i]
                g0 = self.G[0][0] * dphi[q, i, 0] + self.G[0][1] * dphi[q, i, 1]
                g1 = self.G[1][0] * dphi[q, i, 0] + self.G[1][1] * dphi[q, i, 1]
                tdotg = Tq[0] * g0 + Tq[1] * g1
                for m in range(2):
                    contrib = val[m] * p - 0.5 * Uq[m] * tdotg
                    loc[m][i] = loc[m][i] + wdq * contrib
        return loc

    # ------------------------------------------------------------------
    # momentum residual (volume part)
    # ------------------------------------------------------------------
    def residual_volume(self, Uf_i, Uf_0, Pf, rho, mu, dt, w_im, Tf=None):
        """Backward-Euler-family momentum residual volume terms, packed:
        F = M (ui - u0) - (dt/rho) w_im [ -rho conv(ui) - stress(ui)
                                          + pgrad(p0) ]  -> flat [2n].
        (Mirrors pressure_correction._residual with w_ex = 0, Fq = None.)
        Tf (optional, flat [2n]): fixed convection transport — the
        semi-implicit/lagged linearization (residual affine in Uf_i)."""
        Ui = self.comps(Uf_i)
        U0 = self.comps(Uf_0)
        Uli = [self.gatherV(Ui[0]), self.gatherV(Ui[1])]
        Ul0 = [self.gatherV(U0[0]), self.gatherV(U0[1])]
        dUl = [
            [Uli[a][i] - Ul0[a][i] for i in range(self.nlV)] for a in range(2)
        ]
        Pl = self.gatherQ(Pf)
        s = dt / rho * w_im
        loc = self._zero_loc(Uf_i)
        loc = self.mass_loc_acc(loc, dUl)
        # - s * ( -rho*conv - stress + pgrad )
        if Tf is None:
            loc = self.skew_conv_loc_acc(loc, Uli, scale=s * rho)
        else:
            T = self.comps(Tf)
            Tl = [self.gatherV(T[0]), self.gatherV(T[1])]
            loc = self.skew_conv_lagged_loc_acc(loc, Tl, Uli, scale=s * rho)
        loc = self.sym_grad_loc_acc(loc, Uli, mu=s * mu * 1.0)
        # stress form is 2 mu eps : the sym_grad term above IS the
        # full grad+gradT pair (forms.sym_grad_loc), scaled by mu
        loc = self.pressure_grad_loc_acc(loc, Pl, scale=-s)
        return self.dof_sum_V2(loc)

    # ------------------------------------------------------------------
    # element-matrix apply (EMA) for the lagged momentum solve: the
    # x-dependent volume operator with frozen transport is SCALAR per
    # component — S[i][j] (x) delta_ab — plus the constant grad-transpose
    # stress coupling. These builders produce S as nlV x nlV lists of
    # [nc] lane vectors (pad-free), so each Krylov matvec is gathers +
    # nl^2 fused multiply-adds + dof-sum instead of the full quadrature
    # chain. Exactness pinned in tests/test_ema.py.
    # ------------------------------------------------------------------
    def stiffness_scalar_pairs(self):
        """Kscal[i][j] = C_kl Kref[k,l,i,j] as [nc] vectors (constant;
        the grad:grad half of the stress form; symmetric in (i,j))."""
        out = []
        for i in range(self.nlV):
            row = []
            for j in range(self.nlV):
                s = None
                for k in range(2):
                    for l in range(2):
                        w = self.Kref[k, l, i, j]
                        if w == 0.0:
                            continue
                        t = w * self.C[k][l]
                        s = t if s is None else s + t
                row.append(
                    s if s is not None else jnp.zeros_like(self.detJ)
                )
            out.append(row)
        return out

    def lagged_scalar_tensor(self, Tl, alpha_mass, c_visc, c_conv, kscal):
        """Per-step scalar element tensor S[i][j] ([nc] vectors):
        alpha_mass * detJ * Mref + c_visc * Kscal
        + c_conv * 0.5 int [phi_i (T.grad phi_j) - phi_j (T.grad phi_i)].
        The convection part is antisymmetric: each (i<j) pair is built
        once per quadrature point."""
        S = [[None] * self.nlV for _ in range(self.nlV)]
        for i in range(self.nlV):
            for j in range(self.nlV):
                s = alpha_mass * self.Mref[i, j] * self.detJ
                s = s + c_visc * kscal[i][j]
                S[i][j] = s
        phi, dphi, w = self.cq_phi, self.cq_dphi, self.cq_w
        for q in range(self.nq):
            wdq = (w[q] * 0.5 * c_conv) * self.detJ
            Tq = []
            for d in range(2):
                st = None
                for m in range(self.nlV):
                    p = phi[q, m]
                    if p == 0.0:
                        continue
                    t = p * Tl[d][m]
                    st = t if st is None else st + t
                Tq.append(st)
            tg = []
            for j in range(self.nlV):
                g0 = self.G[0][0] * dphi[q, j, 0] + self.G[0][1] * dphi[q, j, 1]
                g1 = self.G[1][0] * dphi[q, j, 0] + self.G[1][1] * dphi[q, j, 1]
                tg.append(Tq[0] * g0 + Tq[1] * g1)
            for i in range(self.nlV):
                for j in range(i + 1, self.nlV):
                    c = wdq * (phi[q, i] * tg[j] - phi[q, j] * tg[i])
                    S[i][j] = S[i][j] + c
                    S[j][i] = S[j][i] - c
        return S

    def ema_scalar_apply(self, loc, S, Vl):
        """loc[a][i] += sum_j S[i][j] * Vl[a][j]."""
        for a in range(2):
            for i in range(self.nlV):
                s = None
                for j in range(self.nlV):
                    t = S[i][j] * Vl[a][j]
                    s = t if s is None else s + t
                loc[a][i] = loc[a][i] + s
        return loc

    def sym_grad_transpose_loc_acc(self, loc, Ul, mu):
        """loc[a][i] += mu * detJ G_ak G_bl Kref[k,l,j,i] U_b[j] — the
        component-coupling half of sym_grad_loc_acc alone (the grad:grad
        half lives in the EMA scalar tensor)."""
        Kref = self.Kref
        for a in range(2):
            for i in range(self.nlV):
                s = None
                for b in range(2):
                    for k in range(2):
                        for l in range(2):
                            cj = None
                            for j in range(self.nlV):
                                w = Kref[k, l, j, i]
                                if w == 0.0:
                                    continue
                                t = w * Ul[b][j]
                                cj = t if cj is None else cj + t
                            if cj is None:
                                continue
                            t = self.detJ * ((self.G[a][k] * self.G[b][l]) * cj)
                            s = t if s is None else s + t
                loc[a][i] = loc[a][i] + mu * s
        return loc

    # ------------------------------------------------------------------
    # pressure-step pieces
    # ------------------------------------------------------------------
    def div_rhs(self, Uf):
        """b[m] = int div(u) q_m -> [nQ] (forms.div_rhs, packed)."""
        U = self.comps(Uf)
        Ul = [self.gatherV(U[0]), self.gatherV(U[1])]
        locq = []
        for m in range(self.nlQ):
            s = None
            for b in range(2):
                for k in range(2):
                    cj = None
                    for j in range(self.nlV):
                        w = self.Bref[k, m, j]
                        if w == 0.0:
                            continue
                        t = w * Ul[b][j]
                        cj = t if cj is None else cj + t
                    if cj is None:
                        continue
                    t = self.G[b][k] * cj
                    s = t if s is None else s + t
            locq.append(self.detJ * s)
        return self.dof_sum_Q(locq)

    def grad_div_cell(self, Uf):
        """Per-cell constant grad(div u) [2 lists of [nc]]
        (forms.grad_div_ustar, packed)."""
        U = self.comps(Uf)
        Ul = [self.gatherV(U[0]), self.gatherV(U[1])]
        v = []
        for d in range(2):
            s = None
            for a in range(2):
                for k in range(2):
                    for l in range(2):
                        cj = None
                        for j in range(self.nlV):
                            w = self.Href[j, k, l]
                            if w == 0.0:
                                continue
                            t = w * Ul[a][j]
                            cj = t if cj is None else cj + t
                        if cj is None:
                            continue
                        t = (self.G[a][k] * self.G[d][l]) * cj
                        s = t if s is None else s + t
            v.append(s)
        return v

    def grad_div_rhs(self, Uf):
        """b[m] = int grad(div u).grad(q_m) (forms.grad_div_ustar_rhs)."""
        v = self.grad_div_cell(Uf)
        locq = []
        for m in range(self.nlQ):
            s = None
            for d in range(2):
                gk = (
                    self.G[d][0] * self.drefQ[m, 0]
                    + self.G[d][1] * self.drefQ[m, 1]
                )
                t = v[d] * gk
                s = t if s is None else s + t
            locq.append(0.5 * self.detJ * s)
        return self.dof_sum_Q(locq)

    # ------------------------------------------------------------------
    # boundary (ds) terms — surface-sized; reuses the facet tabulations
    # (the [nb, ...] arrays are small, so the einsum layout stays)
    # ------------------------------------------------------------------
    def boundary_rhs(self, btabV, btabQ, Uf, Pf, rho, mu,
                     ds_stress=True, ds_dn=True, Tf=None):
        """Packed twin of pressure_correction._rhs_weak_bnd -> flat [2n].
        Tf: fixed transport for the directional do-nothing factor."""
        U = self.comps(Uf)
        p0b = btabQ.values(Pf)  # [nb, q]
        nrm = btabV.normals  # [nb, 2]
        # per-component facet values/gradients from 1-D states
        vals = [btabV.values(U[c]) for c in range(2)]  # each [nb, q]
        val = [-p0b * nrm[:, None, c] for c in range(2)]
        if ds_stress:
            # mu (grad u)^T n: out_a = mu sum_m du_m/dx_a n_m
            geom = assembly.geometry(self.V.mesh)
            gw = [btabV.grads(U[c], geom) for c in range(2)]  # [nb, q, 2]
            for a in range(2):
                val[a] = val[a] + mu * (
                    gw[0][:, :, a] * nrm[:, None, 0]
                    + gw[1][:, :, a] * nrm[:, None, 1]
                )
        if ds_dn:
            if Tf is None:
                tvals = vals
            else:
                T = self.comps(Tf)
                tvals = [btabV.values(T[c]) for c in range(2)]
            wn = tvals[0] * nrm[:, None, 0] + tvals[1] * nrm[:, None, 1]
            wnp = jnp.maximum(wn, 0.0)
            for a in range(2):
                val[a] = val[a] - 0.5 * rho * wnp * vals[a]
        # integrate against facet test functions, scatter per component
        flat_dofs = btabV.cell_dofs.reshape(-1)
        out = []
        for a in range(2):
            loc = jnp.einsum("bq,bq,bqi->bi", val[a], btabV.wl, btabV.phi)
            o = jnp.zeros(self.n, dtype=loc.dtype)
            out.append(o.at[flat_dofs].add(loc.reshape(-1)))
        return jnp.concatenate(out)

    # ------------------------------------------------------------------
    # velocity correction pieces
    # ------------------------------------------------------------------
    def mass_apply(self, Uf):
        """flat [2n] -> flat [2n], component-diagonal mass."""
        out = []
        for c in self.comps(Uf):
            Ul = self.gatherV(c)
            loc = []
            for i in range(self.nlV):
                s = None
                for j in range(self.nlV):
                    t = self.Mref[i, j] * Ul[j]
                    s = t if s is None else s + t
                loc.append(self.detJ * s)
            out.append(self.dof_sum_V(loc))
        return jnp.concatenate(out)

    def grad_phi_rhs(self, Pf, div_part=None):
        """b[(i,a)] = int (grad(phi) + div_part) . v -> flat [2n].
        phi in Q (P1 => cellwise-constant gradient, integrated exactly);
        div_part: optional per-cell [2 lists of [nc]] extra gradient."""
        Pl = self.gatherQ(Pf)
        g = []
        for d in range(2):
            s = None
            for k in range(2):
                cm = None
                for m in range(self.nlQ):
                    w = self.drefQ[m, k]
                    if w == 0.0:
                        continue
                    t = w * Pl[m]
                    cm = t if cm is None else cm + t
                t = self.G[d][k] * cm
                s = t if s is None else s + t
            g.append(s)
        if div_part is not None:
            g = [g[0] + div_part[0], g[1] + div_part[1]]
        out = []
        for a in range(2):
            loc = [
                (self.intV_ref[i] * self.detJ) * g[a]
                for i in range(self.nlV)
            ]
            out.append(self.dof_sum_V(loc))
        return jnp.concatenate(out)
