# Box-packed 3-D layout: the tet twin of the lane-packed patch recipe
# (fem/patchpack.py) for STRUCTURED Kuhn boxes (mesh3d.box_mesh) — the
# cavity3d / 3-D Boussinesq workloads (BASELINE configs[4]; VERDICT r4 #2).
#
# STRUCTURE. box_mesh is the Kuhn (Freudenthal) tetrahedralization: every
# grid cube (I, J, K) carries the same 6 tets (mesh3d._KUHN), so
#   * the mesh's edge set is exactly the 7 nonzero 0/1 direction vectors
#     from every grid vertex, which makes the P2 dof set (vertices + edge
#     midpoints) the COMPLETE doubled grid (2N+1)^3 — a P2 scalar field IS
#     a dense 3-D array;
#   * every cell-local dof address is index arithmetic: tet type t of cube
#     (I,J,K) reaches doubled-grid point 2(I,J,K) + o(t,l), o in {0,1,2}^3;
#   * the geometry is UNIFORM per type: 6 constant Jacobians — volume
#     operators need NO per-cell geometry arrays at all (the 2-D layout's
#     detJ/G/C streams collapse to Python scalars).
# Storage splits the doubled grid into its 8 PARITY blocks (even/odd per
# axis) so every cell window is a stride-1 [N,N,N] slice (strided updates
# would lower to scatters — the patchpack lesson). There is NO replication:
# the flat layout is a pure permutation of the standard dof vector, so no
# seams, corner groups, or weighted dots exist. P1 (pressure) fields stay
# in the standard lexicographic grid numbering — windows are plain slices
# of the (N+1)^3 array, and the vector is directly consumable by
# ops/structured.StructuredLaplacian + solvers/structured_mg.
#
# Replaces (for structured 3-D meshes): the gather/einsum operator path of
# fem/assembly + fem/forms — the architecture measured 29-47x too slow on
# TPU in 2-D (round 4) and the cause of the 3-D ladder's 0.745 steps/s
# ceiling. Reference-side analog: DOLFIN assembly + PETSc SpMV
# (/root/reference/flow/navier_stokes/pressure_correction.py:258-465).
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import assembly, elements, quadrature
from .assembly import CONV_RULE

__all__ = ["BoxPack"]

_KUHN = [
    (0, 1, 3, 7),
    (0, 1, 5, 7),
    (0, 2, 3, 7),
    (0, 2, 6, 7),
    (0, 4, 5, 7),
    (0, 4, 6, 7),
]
_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _corner(c):
    return np.array([c & 1, (c >> 1) & 1, (c >> 2) & 1], dtype=np.int64)


class BoxPack:
    """Layout + hot kernels for P2/P1 Taylor-Hood on box_mesh(N, N, N)."""

    def __init__(self, mesh, dtype=None):
        from ..utils.hostsetup import setup_on_cpu

        assert getattr(mesh, "dim", 0) == 3 and hasattr(mesh, "grid_shape")
        gx, gy, gz = mesh.grid_shape
        self.Ns = (gx - 1, gy - 1, gz - 1)  # cells per axis (anisotropic ok)
        self.mesh = mesh
        if dtype is None:
            dtype = mesh.dtype
        self.dtype = dtype
        h = mesh.grid_spacing
        self.h = h

        with setup_on_cpu():
            self._build_types(h)
            self._build_tabs()
            self._build_maps(mesh)

    # -- per-type constant geometry -------------------------------------------
    def _build_types(self, h):
        hx, hy, hz = h
        scale = np.diag([hx, hy, hz])
        self.types = []
        for tet in _KUHN:
            vs = [_corner(c) for c in tet]
            # orient positively (TetMesh convention) by swapping v1<->v2
            J = np.stack(
                [(vs[k + 1] - vs[0]).astype(float) for k in range(3)], axis=-1
            )
            J = scale @ J
            if np.linalg.det(J) < 0:
                vs = [vs[0], vs[2], vs[1], vs[3]]
                J = np.stack(
                    [(vs[k + 1] - vs[0]).astype(float) for k in range(3)],
                    axis=-1,
                )
                J = scale @ J
            detJ = float(np.linalg.det(J))
            assert detJ > 0
            G = np.linalg.inv(J).T  # G[d, k]: grad_phys[d] = G[d,k] grad_ref[k]
            # C[k, l] = detJ sum_d G[d,k] G[d,l] (assembly.Geometry's
            # reference-index metric, einsum("edk,edl->ekl"))
            C = detJ * (G.T @ G)
            # local dof -> doubled-grid offset o in {0,1,2}^3
            offs = [2 * v for v in vs] + [
                vs[a] + vs[b] for a, b in _TET_EDGES
            ]
            self.types.append(
                {
                    "detJ": detJ,
                    "G": G,
                    "C": C,
                    "off2": np.stack(offs),  # [10, 3]
                    "off1": np.stack(vs),  # [4, 3]
                }
            )

    def _build_tabs(self):
        pts, w = quadrature.simplex_rule(CONV_RULE, 3)
        phi, dphi = elements.tabulate(2, pts, dim=3)
        self.qw = np.asarray(w)
        self.phi = np.asarray(phi)  # [nq, 10]
        self.dphi = np.asarray(dphi)  # [nq, 10, 3]
        self.nq = len(w)
        self.Mref = np.asarray(assembly.ref_mass(2, 3))  # [10, 10]
        self.Kref = np.asarray(assembly.ref_stiffness(2, 3))  # [3,3,10,10]
        self.Bref = np.asarray(assembly.ref_mixed(1, 2, 3))  # [3, 4, 10]
        self.Href = np.asarray(elements.hessian_ref(2, 3))  # [10, 3, 3]
        _, dphi1 = elements.tabulate(1, np.zeros((1, 3)), dim=3)
        self.dref1 = np.asarray(dphi1[0])  # [4, 3]
        p2, w2 = quadrature.simplex_rule(2, 3)
        phi2, _ = elements.tabulate(2, p2, dim=3)
        self.refint = np.einsum("q,qi->i", np.asarray(w2), np.asarray(phi2))
        # constant grad:grad scalar pairs per type
        for t in self.types:
            t["Kscal"] = np.einsum("kl,klij->ij", t["C"], self.Kref)

    # -- dof <-> layout maps (setup only) -------------------------------------
    def _build_maps(self, mesh):
        Nx, Ny, Nz = self.Ns
        # parity blocks of the doubled grid, order p = (px, py, pz) lex
        self.block_dims = []
        sizes = []
        for px in (0, 1):
            for py in (0, 1):
                for pz in (0, 1):
                    d = (
                        Nx + 1 - px,
                        Ny + 1 - py,
                        Nz + 1 - pz,
                    )
                    self.block_dims.append(d)
                    sizes.append(d[0] * d[1] * d[2])
        self.offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(
            np.int64
        )
        self.n2 = int(self.offsets[-1])
        assert self.n2 == (2 * Nx + 1) * (2 * Ny + 1) * (2 * Nz + 1)

        # doubled-grid index of every P2 dof (vertices then edge midpoints)
        lo = mesh.points_np.min(axis=0)
        step = np.asarray(self.h) / 2.0
        vpts = mesh.points_np
        epts = 0.5 * (
            vpts[mesh.edges_np[:, 0]] + vpts[mesh.edges_np[:, 1]]
        )
        allpts = np.concatenate([vpts, epts], axis=0)
        dgi = np.rint((allpts - lo) / step).astype(np.int64)  # [n2, 3]
        assert dgi.min() >= 0
        assert (dgi.max(axis=0) <= 2 * np.asarray(self.Ns)).all()

        par = dgi % 2
        base = dgi // 2
        pidx = (par[:, 0] * 2 + par[:, 1]) * 2 + par[:, 2]
        dims = np.asarray(self.block_dims)[pidx]
        local = (base[:, 0] * dims[:, 1] + base[:, 1]) * dims[:, 2] + base[
            :, 2
        ]
        slot = self.offsets[pidx] + local
        # slot_of_dof: standard dof id -> flat packed slot (a bijection)
        assert len(np.unique(slot)) == self.n2
        self.slot_of_dof = slot.astype(np.int64)
        self.dof_of_slot = np.empty(self.n2, dtype=np.int64)
        self.dof_of_slot[slot] = np.arange(self.n2)
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self.slot_of_dof_j = jnp.asarray(self.slot_of_dof)
            self.dof_of_slot_j = jnp.asarray(self.dof_of_slot)

        self.n1 = (Nx + 1) * (Ny + 1) * (Nz + 1)
        self.grid1 = (Nx + 1, Ny + 1, Nz + 1)

    # -- plane plumbing --------------------------------------------------------
    def unflatten(self, X):
        t = X.shape[1:]
        out = []
        for p in range(8):
            o0, o1 = self.offsets[p], self.offsets[p + 1]
            out.append(X[o0:o1].reshape(self.block_dims[p] + tuple(t)))
        return out

    def flatten(self, blocks):
        t = blocks[0].shape[3:]
        return jnp.concatenate(
            [b.reshape((-1,) + tuple(t)) for b in blocks], axis=0
        )

    def to_packed(self, x):
        return jnp.asarray(x)[self.dof_of_slot_j]

    def from_packed(self, X):
        return X[self.slot_of_dof_j]

    def window2(self, blocks, t, l):
        o = self.types[t]["off2"][l]
        p = (int(o[0] % 2) * 2 + int(o[1] % 2)) * 2 + int(o[2] % 2)
        b = o // 2
        Nx, Ny, Nz = self.Ns
        return blocks[p][
            b[0]: b[0] + Nx, b[1]: b[1] + Ny, b[2]: b[2] + Nz
        ]

    def acc_window2(self, blocks, t, l, val):
        o = self.types[t]["off2"][l]
        p = (int(o[0] % 2) * 2 + int(o[1] % 2)) * 2 + int(o[2] % 2)
        b = o // 2
        Nx, Ny, Nz = self.Ns
        blocks[p] = blocks[p].at[
            b[0]: b[0] + Nx, b[1]: b[1] + Ny, b[2]: b[2] + Nz
        ].add(val)
        return blocks

    def window1(self, grid, t, m):
        b = self.types[t]["off1"][m]
        Nx, Ny, Nz = self.Ns
        return grid[b[0]: b[0] + Nx, b[1]: b[1] + Ny, b[2]: b[2] + Nz]

    def acc_window1(self, grid, t, m, val):
        b = self.types[t]["off1"][m]
        Nx, Ny, Nz = self.Ns
        return grid.at[
            b[0]: b[0] + Nx, b[1]: b[1] + Ny, b[2]: b[2] + Nz
        ].add(val)

    def zero_blocks(self, dtype):
        return [jnp.zeros(d, dtype=dtype) for d in self.block_dims]

    def comps(self, Xf, n_comp=3):
        n = self.n2
        return [Xf[c * n:(c + 1) * n] for c in range(n_comp)]

    def windows2(self, Xs, t):
        blocks = self.unflatten(Xs)
        return [self.window2(blocks, t, l) for l in range(10)]

    def windows1(self, grid, t):
        return [self.window1(grid, t, m) for m in range(4)]

    # stacked variants: [nl, N, N, N] tensors so the local-dof couplings
    # are single einsum contractions instead of O(nl^2) unrolled FMAs —
    # the 3-D graphs are otherwise 10-30x larger than the 2-D patchpack
    # ones and XLA compile time explodes (measured: >25 min on CPU for the
    # fully unrolled step). The leading local axis is free on TPU (tiling
    # pads only the two minor dims).
    def stack2(self, Xs, t):
        blocks = self.unflatten(Xs)
        return jnp.stack(
            [self.window2(blocks, t, l) for l in range(10)]
        )

    def stack2_blocks(self, blocks, t):
        return jnp.stack(
            [self.window2(blocks, t, l) for l in range(10)]
        )

    def acc_stack2(self, acc, t, V):
        for i in range(10):
            acc = self.acc_window2(acc, t, i, V[i])
        return acc

    def stack1(self, grid, t):
        return jnp.stack([self.window1(grid, t, m) for m in range(4)])

    def acc_stack1(self, grid, t, V):
        for m in range(4):
            grid = self.acc_window1(grid, t, m, V[m])
        return grid

    # ------------------------------------------------------------------------
    # hot kernels (all volume terms; the cavity workloads have no ds terms)
    # ------------------------------------------------------------------------
    def mass_apply_vec(self, Xf):
        out = []
        for xc in self.comps(Xf):
            acc = self.zero_blocks(xc.dtype)
            blocks = self.unflatten(xc)
            for t in range(6):
                dJ = self.types[t]["detJ"]
                xw = self.stack2_blocks(blocks, t)
                y = jnp.einsum("ij,j...->i...", dJ * self.Mref, xw)
                acc = self.acc_stack2(acc, t, y)
            out.append(self.flatten(acc))
        return jnp.concatenate(out)

    def div_rhs(self, Xf):
        """b[m] = int div(u) q_m -> P1 grid (standard dof order)."""
        xw_all = [self.unflatten(xc) for xc in self.comps(Xf)]
        acc = jnp.zeros(self.grid1, dtype=Xf.dtype)
        for t in range(6):
            ty = self.types[t]
            xw = jnp.stack(
                [self.stack2_blocks(b, t) for b in xw_all]
            )  # [3(b), 10(j), N, N, N]
            # out_m = dJ B[k,m,j] G[b,k] x_j^b
            C = np.einsum("kmj,bk->mbj", self.Bref, ty["G"]) * ty["detJ"]
            y = jnp.einsum("mbj,bj...->m...", C, xw)
            acc = self.acc_stack1(acc, t, y)
        return acc.reshape(-1)

    def pressure_grad_rhs(self, pvec):
        """b[(i,a)] = int p d_a v_i -> packed P2 vector flat."""
        grid = pvec.reshape(self.grid1)
        accs = [self.zero_blocks(pvec.dtype) for _ in range(3)]
        for t in range(6):
            ty = self.types[t]
            pw = self.stack1(grid, t)  # [4, N, N, N]
            # out_i^a = dJ G[a,k] B[k,m,i] p_m
            C = np.einsum("ak,kmi->aim", ty["G"], self.Bref) * ty["detJ"]
            y = jnp.einsum("aim,m...->ai...", C, pw)
            for a in range(3):
                accs[a] = self.acc_stack2(accs[a], t, y[a])
        return jnp.concatenate([self.flatten(a) for a in accs])

    def grad_div_cell(self, Xf):
        """Per-cell constant grad(div u): out[t] = [3(d), N, N, N]."""
        xw_all = [self.unflatten(xc) for xc in self.comps(Xf)]
        out = []
        for t in range(6):
            ty = self.types[t]
            G = ty["G"]
            xw = jnp.stack(
                [self.stack2_blocks(b, t) for b in xw_all]
            )  # [3(b), 10(j), ...]
            # v_d = G[d,k] Href[j,k,l] G[b,l] x_j^b
            C = np.einsum("dk,jkl,bl->dbj", G, self.Href, G)
            out.append(jnp.einsum("dbj,bj...->d...", C, xw))
        return out

    def grad_div_rhs(self, Xf):
        """b[m] = int grad(div u) . grad(q_m) -> P1 grid vector
        (rotational pressure term; ref volume factor 1/6)."""
        v = self.grad_div_cell(Xf)
        acc = jnp.zeros(self.grid1, dtype=Xf.dtype)
        for t in range(6):
            ty = self.types[t]
            # loc_m = (dJ/6) dref[m,k] G[d,k] v_d
            C = np.einsum("mk,dk->md", self.dref1, ty["G"]) * (
                ty["detJ"] / 6.0
            )
            y = jnp.einsum("md,d...->m...", C, v[t])
            acc = self.acc_stack1(acc, t, y)
        return acc.reshape(-1)

    def grad_phi_rhs(self, pvec, div_part=None, mu=0.0):
        """b[(i,a)] = int (grad(phi)_a [+ mu grad(div u*)_a]) v_i ->
        packed P2 vector flat (grad(phi) per-cell constant for P1 phi;
        int_cell v_i = detJ * refint_i)."""
        grid = pvec.reshape(self.grid1)
        accs = [self.zero_blocks(pvec.dtype) for _ in range(3)]
        for t in range(6):
            ty = self.types[t]
            dJ = ty["detJ"]
            pw = self.stack1(grid, t)
            # ga_a = G[a,k] dref[m,k] p_m
            C = np.einsum("ak,mk->am", ty["G"], self.dref1)
            ga = jnp.einsum("am,m...->a...", C, pw)
            if div_part is not None:
                ga = ga + mu * div_part[t]
            # out_i^a = refint_i dJ ga_a
            y = jnp.einsum("i,a...->ai...", dJ * self.refint, ga)
            for a in range(3):
                accs[a] = self.acc_stack2(accs[a], t, y[a])
        return jnp.concatenate([self.flatten(a) for a in accs])

    # -- lagged momentum operator ---------------------------------------------
    def conv_tables(self, Tf):
        """Per-type transport tables for the collapsed skew convection:
        A[t] = [nq, 10, N, N, N], A_qm = dphi[q,m,k] G[d,k] T_d(q),
        T_d(q) = phi[q,l] Tw_d[l]. Computed ONCE per step (lagged
        transport frozen during the Krylov solve)."""
        Tw_all = [self.unflatten(Tc) for Tc in self.comps(Tf)]
        A = []
        for t in range(6):
            ty = self.types[t]
            Tw = jnp.stack(
                [self.stack2_blocks(b, t) for b in Tw_all]
            )  # [3(d), 10(l), ...]
            # A_qm = (dphi[q,m,k] G[d,k]) (phi[q,l] T_l^d)
            C = np.einsum("qmk,dk->qmd", self.dphi, ty["G"])
            Td = jnp.einsum("ql,dl...->qd...", self.phi, Tw)
            # explicit d-sum, NOT an einsum: the dot_general lowering put
            # the tiny (q, m) axes in the tiled minor dims —
            # f32[27,10,96,96,96]{0,1,4,3,2} = 7.6x padding, 6.75G, the
            # N=96 compile OOM (compiler allocation report, BENCH_NOTES
            # r5). The broadcasted multiply keeps the spatial axes minor.
            A.append(
                sum(
                    jnp.asarray(C[:, :, d], dtype=Td.dtype)[
                        :, :, None, None, None
                    ]
                    * Td[:, d][:, None]
                    for d in range(3)
                )
            )
        return A

    def momentum_apply(self, A, Xf, s_mu, s_rho):
        """y = [M + s_mu*(stress) + s_rho*skew-conv(T)] x on the packed
        vector flat. Component-diagonal scalar part (mass + C:Kref stress
        + collapsed-quadrature skew convection
        y_i += 0.5 s_rho dJ sum_q w_q (phi_qi <A_q, x> - A_qi <phi_q, x>))
        plus the factored grad-transpose stress coupling."""
        xw_all_blocks = [self.unflatten(xc) for xc in self.comps(Xf)]
        accs = [self.zero_blocks(Xf.dtype) for _ in range(3)]
        for t in range(6):
            ty = self.types[t]
            dJ, G = ty["detJ"], ty["G"]
            xw = jnp.stack(
                [self.stack2_blocks(b, t) for b in xw_all_blocks]
            )  # [3(a), 10(j), ...]
            S = dJ * self.Mref + s_mu * ty["Kscal"]  # [10, 10] const
            y = jnp.einsum("ij,aj...->ai...", S, xw)
            # collapsed convection (component-diagonal)
            At = A[t]  # [nq, 10, ...]
            xA = jnp.einsum("qj...,aj...->qa...", At, xw)
            xP = jnp.einsum("qj,aj...->qa...", self.phi, xw)
            wphi = self.qw[:, None] * self.phi  # [nq, 10]
            conv = jnp.einsum("qi,qa...->ai...", wphi, xA) - jnp.einsum(
                "q,qi...,qa...->ai...", self.qw, At, xP
            )
            y = y + (0.5 * s_rho * dJ) * conv
            # transpose stress coupling:
            # out_i^a += s_mu dJ G[a,k] Kref[k,l,j,i] G[b,l] x_j^b
            C = np.einsum("ak,klji,bl->aibj", G, self.Kref, G) * (
                s_mu * dJ
            )
            y = y + jnp.einsum("aibj,bj...->ai...", C, xw)
            for a in range(3):
                accs[a] = self.acc_stack2(accs[a], t, y[a])
        return jnp.concatenate([self.flatten(a) for a in accs])
