# Geometric multigrid for the pressure Poisson operator in PATCH layout
# (fem/patch.py) — the gather-free twin of solvers/multigrid.P1Hierarchy.
#
# The refinement ladder that builds the patch lattices IS the multigrid
# hierarchy: level l is P1 on the same coarse patches with lattice 2^l.
# Everything that was indexed addressing in P1Hierarchy becomes dense window
# arithmetic here:
#   * level operators: factored-tensor stiffness applies through PatchSpace
#     (window slices + overlap-add; seams only on O(C*n) rows),
#   * prolongation:    lattice interleave (coarse nodes copied, edge
#     midpoints averaged along rows/cols/diagonals) — pure slices,
#   * restriction:     the exact adjoint (replica-weight split, local
#     transpose-interleave, coarse seam exchange),
#   * coarsest solve:  dense inverse on the real coarse mesh (a few hundred
#     dofs), entered/left through tiny representative-slot gathers.
# Chebyshev smoothing, eigenvalue estimates, the Neumann-nullspace handling
# and the bc-mask plumbing mirror P1Hierarchy so the two preconditioners are
# drop-in interchangeable (same BoomerAMG-replacement role; reference:
# /root/reference/flow/navier_stokes/pressure_correction.py:414-419).
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fem import assembly, dense
from ..fem.spaces import FunctionSpace
from ..fem.patch import PatchInfo, PatchSpace, PatchGeom
from .chebyshev import power_iteration_lmax

__all__ = ["PatchP1Hierarchy"]


class _Level:
    pass


class PatchP1Hierarchy:
    """V-cycle preconditioner over the patch lattice ladder.

    bc_mask: PATCH-layout Dirichlet mask on the finest level (1 on
    constrained slots, incl. the padding slots pinned by mask_to_patch), or
    None for the pure-Neumann operator."""

    def __init__(
        self,
        info: PatchInfo,
        bc_mask=None,
        smoother_degree=3,
        coarse_dense_max=3000,
        lmin_ratio=0.30,
    ):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(
                info, bc_mask, smoother_degree, coarse_dense_max, lmin_ratio
            )

    def _build(self, info, bc_mask, smoother_degree, coarse_dense_max,
               lmin_ratio):
        self.info = info
        self.nlevels = info.k + 1
        self.neumann = bc_mask is None
        self.smoother_degree = smoother_degree
        dtype = info.meshes[-1].dtype

        # restrict the fine patch mask down the ladder: coarse lattice =
        # even fine lattice (including padding slots, which coarsen onto
        # coarse padding slots exactly)
        masks = [None] * self.nlevels
        if bc_mask is not None:
            masks[-1] = jnp.asarray(bc_mask, dtype=dtype)

        self.levels = []
        for l in range(self.nlevels):
            L = _Level()
            L.space = PatchSpace(info.layout(1, l), info.meshes[l], 1)
            L.geom = PatchGeom(info, level=l, dtype=dtype)
            L.n = L.space.n_dofs  # flat length
            self.levels.append(L)

        if bc_mask is not None:
            for l in range(self.nlevels - 2, -1, -1):
                fine = self._planes(l + 1, masks[l + 1])
                masks[l] = self._flat(l, fine[:, ::2, ::2])

        for l, L in enumerate(self.levels):
            mask = masks[l]
            L.mask = mask
            free = None if mask is None else (1.0 - mask)
            space, geom = L.space, L.geom

            def base_apply(x, space=space, geom=geom):
                return assembly.stiffness_apply(space, geom, x)

            if mask is None:

                def K(x, base_apply=base_apply):
                    return base_apply(x)

            else:

                def K(x, base_apply=base_apply, free=free, mask=mask):
                    return free * base_apply(free * x) + mask * x

            L.K = K
            diag = assembly.stiffness_diag(space, geom)
            diag = jnp.where(diag > 0, diag, 1.0)
            if mask is not None:
                diag = free * diag + mask
            L.diag = diag
            L.lmax = power_iteration_lmax(K, diag, L.n, dtype=dtype)
            lmax_s, lmin_s = 1.05 * L.lmax, lmin_ratio * L.lmax
            L.theta = 0.5 * (lmax_s + lmin_s)
            L.delta = 0.5 * (lmax_s - lmin_s)

        # coarsest solve: dense on the REAL coarse mesh (representative
        # slots in/out). Matches P1Hierarchy's coarse construction.
        mesh0 = info.meshes[0]
        S0 = FunctionSpace(mesh0, 1)
        geom0 = assembly.geometry(mesh0)
        n0 = mesh0.n_points
        assert n0 <= coarse_dense_max, f"coarse level too big: {n0}"
        K0 = dense.scalar_dense(
            S0, np.asarray(assembly.stiffness_local(S0, geom0))
        )
        L0 = self.levels[0]
        if self.neumann:
            v = np.full(n0, 1.0 / np.sqrt(n0))
            K0 = K0 + np.outer(v, v)
        else:
            m0 = np.asarray(L0.space.from_patch(L0.mask)) == 1.0
            K0[m0, :] = 0.0
            K0[:, m0] = 0.0
            K0[m0, m0] = 1.0
        self.K0_inv = jnp.asarray(np.linalg.inv(K0), dtype=dtype)

    # -- plane plumbing (single-plane P1 layouts) ----------------------------
    def _planes(self, l, x):
        sp = self.levels[l].space
        return sp._unflatten(x)[0]

    def _flat(self, l, plane):
        sp = self.levels[l].space
        return sp._flatten([plane])

    # -- grid transfer -------------------------------------------------------
    def prolong(self, l, xc):
        """coarse level l -> fine level l+1 (P1 interpolation on the
        lattice: copy even nodes, average edge midpoints — row, column and
        diagonal mids; consistent -> consistent, no seam work needed)."""
        Xc = self._planes(l, xc)
        C, mc, _ = Xc.shape
        mf = 2 * mc - 1
        mid = 0.5 * (Xc[:, :, :-1] + Xc[:, :, 1:])
        Y = jnp.concatenate(
            [
                jnp.stack([Xc[:, :, :-1], mid], axis=3).reshape(
                    C, mc, 2 * (mc - 1)
                ),
                Xc[:, :, -1:],
            ],
            axis=2,
        )  # [C, mc, mf] even rows
        colmid_e = 0.5 * (Xc[:, :-1, :] + Xc[:, 1:, :])  # [C, mc-1, mc]
        colmid_o = 0.5 * (Xc[:, 1:, :-1] + Xc[:, :-1, 1:])  # diagonal mids
        R = jnp.concatenate(
            [
                jnp.stack([colmid_e[:, :, :-1], colmid_o], axis=3).reshape(
                    C, mc - 1, 2 * (mc - 1)
                ),
                colmid_e[:, :, -1:],
            ],
            axis=2,
        )  # [C, mc-1, mf] odd rows
        out = jnp.concatenate(
            [
                jnp.stack([Y[:, :-1, :], R], axis=2).reshape(
                    C, 2 * (mc - 1), mf
                ),
                Y[:, -1:, :],
            ],
            axis=1,
        )
        return self._flat(l + 1, out)

    def restrict(self, l, rf):
        """fine level l+1 -> coarse level l: the EXACT transpose of prolong
        on the replicated layout — split the consistent fine dual by the
        replica weights, local transpose-interleave, coarse seam exchange."""
        spf = self.levels[l + 1].space
        Rf = self._planes(l + 1, spf._weight * rf)
        C, mf, _ = Rf.shape
        mc = (mf + 1) // 2
        E = Rf[:, ::2, ::2]
        H = Rf[:, 1::2, ::2]  # [C, mc-1, mc] horizontal mids
        V = Rf[:, ::2, 1::2]  # [C, mc, mc-1] vertical mids
        D = Rf[:, 1::2, 1::2]  # [C, mc-1, mc-1] diagonal mids
        out = E
        out = out.at[:, :-1, :].add(0.5 * H)
        out = out.at[:, 1:, :].add(0.5 * H)
        out = out.at[:, :, :-1].add(0.5 * V)
        out = out.at[:, :, 1:].add(0.5 * V)
        out = out.at[:, 1:, :-1].add(0.5 * D)
        out = out.at[:, :-1, 1:].add(0.5 * D)
        spc = self.levels[l].space
        return spc.seam_sum(self._flat(l, out))

    # -- smoothing / projection ---------------------------------------------
    def _smooth(self, L, b, x):
        sigma = L.theta / L.delta
        rho = 1.0 / sigma
        r = b - L.K(x)
        d = (r / L.diag) / L.theta
        x = x + d
        for _ in range(self.smoother_degree - 1):
            r = r - L.K(d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = rho_new * rho * d + (2.0 * rho_new / L.delta) * (r / L.diag)
            x = x + d
            rho = rho_new
        return x

    def _project(self, l, x):
        sp = self.levels[l].space
        w = sp._weight
        return (x - jnp.sum(w * x) / jnp.sum(w)) * sp._validf

    # -- V-cycle --------------------------------------------------------------
    def v_cycle(self, b):
        """One V(s, s) cycle from zero initial guess — linear, SPD on the
        consistent subspace: use as M in (weighted-dot) CG."""
        if self.neumann:
            b = self._project(self.nlevels - 1, b)

        bs = [None] * self.nlevels
        xs = [None] * self.nlevels
        bs[-1] = b
        for l in range(self.nlevels - 1, 0, -1):
            L = self.levels[l]
            x = self._smooth(L, bs[l], jnp.zeros_like(bs[l]))
            r = bs[l] - L.K(x)
            if self.neumann:
                r = self._project(l, r)
            xs[l] = x
            rc = self.restrict(l - 1, r)
            if self.levels[l - 1].mask is not None:
                rc = (1.0 - self.levels[l - 1].mask) * rc
            bs[l - 1] = rc

        # coarse dense solve on the real coarse mesh
        L0 = self.levels[0]
        b0 = L0.space.from_patch(bs[0])
        x0g = self.K0_inv @ b0
        x0 = L0.space.to_patch(x0g)
        if self.neumann:
            x0 = self._project(0, x0)
        xs[0] = x0

        for l in range(1, self.nlevels):
            corr = self.prolong(l - 1, xs[l - 1])
            if self.levels[l].mask is not None:
                corr = (1.0 - self.levels[l].mask) * corr
            x = xs[l] + corr
            x = self._smooth(self.levels[l], bs[l], x)
            xs[l] = x
        out = xs[-1]
        if self.neumann:
            out = self._project(self.nlevels - 1, out)
        # keep the preconditioner's range in the valid subspace (padding
        # slots exactly zero)
        return out * self.levels[-1].space._validf
