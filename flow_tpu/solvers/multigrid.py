# Geometric multigrid for the P1 pressure-Poisson operator.
#
# The BoomerAMG replacement (SURVEY.md §2.2 "Hypre BoomerAMG", §7 hard part
# #2): meshes are generated coarse and uniformly refined (mesh.refine_uniform),
# so the hierarchy is free — fine vertices are [coarse vertices; coarse edge
# midpoints], giving an index-arithmetic prolongation with no interpolation
# matrices. V-cycle with Chebyshev smoothing (pointwise-Jacobi-scaled), dense
# LU on the coarsest level, explicit constant-nullspace projection for the
# singular pure-Neumann pressure system
# (/root/reference/flow/navier_stokes/pressure_correction.py:341-432).
#
# Everything is jit-traceable: level count and shapes are static, the V-cycle
# is a fixed linear SPD operator — safe as a CG preconditioner.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fem import assembly, dense
from ..fem.assembly import geometry
from ..fem.spaces import FunctionSpace
from .chebyshev import power_iteration_lmax

__all__ = ["P1Hierarchy"]


class _Level:
    pass


class P1Hierarchy:
    """V-cycle preconditioner for K p = b on the finest mesh of a
    refine_uniform chain.

    meshes: list coarse -> fine, each `refine_uniform` of the previous.
    bc_mask: optional finest-level Dirichlet mask [n_fine] (1.0 on
    constrained dofs); if None the operator is treated as pure-Neumann and
    the constant nullspace is projected at every level.
    """

    def __init__(
        self,
        meshes,
        bc_mask=None,
        smoother_degree=2,
        coarse_dense_max=3000,
        lmin_ratio=0.30,
        winkernel=None,
        winkernel_min_dofs=20000,
    ):
        # hierarchy construction = dozens of small unique-shape programs
        # (level operators, diagonals, power iterations); keep them off the
        # remote-compiling TPU backend
        from ..utils.hostsetup import setup_on_cpu

        import os as _os

        if winkernel is None:
            winkernel = _os.environ.get("FLOW_WINKERNEL", "") == "1"
        self._winkernel = winkernel
        # FLOW_MG_PREC=bf16: store the large levels' ELL operators in
        # bfloat16 and run their applies (the V-cycle's dominant HBM
        # traffic: smoother matvecs + defect evaluation) in bf16 with an
        # f32 interface. Preconditioner-side only — the CG iteration
        # measures the f32 residual, so this can change iteration counts
        # but never the solution. Coarse levels stay f32 (negligible
        # traffic; keeps the coarse correction sharp). Opt-in pending an
        # on-chip A/B.
        self._bf16_min = int(_os.environ.get("FLOW_MG_BF16_MIN", "20000"))
        self._bf16 = _os.environ.get("FLOW_MG_PREC", "f32") == "bf16"
        self._winkernel_min = winkernel_min_dofs
        with setup_on_cpu():
            self._build(meshes, bc_mask, smoother_degree, coarse_dense_max, lmin_ratio)

    def _build(self, meshes, bc_mask, smoother_degree, coarse_dense_max, lmin_ratio):
        assert len(meshes) >= 1
        self.nlevels = len(meshes)
        self.neumann = bc_mask is None
        dtype = meshes[-1].dtype

        # restrict the fine bc mask down the hierarchy: coarse vertices are
        # the first n_coarse fine vertices
        masks = [None] * self.nlevels
        if bc_mask is not None:
            masks[-1] = jnp.asarray(bc_mask, dtype=dtype)
            for l in range(self.nlevels - 2, -1, -1):
                masks[l] = masks[l + 1][: meshes[l].n_points]

        self.levels = []
        for l, mesh in enumerate(meshes):
            L = _Level()
            L.space = FunctionSpace(mesh, 1)
            L.geom = geometry(mesh)
            L.n = mesh.n_points
            mask = masks[l]
            L.mask = mask
            free = None if mask is None else (1.0 - mask)

            space, geom = L.space, L.geom

            # assembled padded-ELL level operator: one row-gather per apply
            # instead of gather -> einsum -> dof-sum (values identical to the
            # quadrature path; ELL halves the smoother's HBM traffic)
            from ..fem.ell import ell_stiffness

            ellK = ell_stiffness(space, geom)
            L.ell = ellK
            if self._bf16 and L.n >= self._bf16_min:
                import dataclasses as _dc

                e16 = _dc.replace(ellK) if _dc.is_dataclass(ellK) else None
                if e16 is None:
                    import copy as _copy

                    e16 = _copy.copy(ellK)
                e16.vals = ellK.vals.astype(jnp.bfloat16)
                L.ell16 = e16

            # gather-free window apply for the big levels (FLOW_WINKERNEL;
            # smoother accuracy is preconditioner-side, so the kernel's f32
            # internals are safe even in f64 runs)
            base_apply = ellK.apply
            if getattr(L, "ell16", None) is not None:

                def base_apply(x, _e16=L.ell16, _dt=dtype):
                    return _e16.apply(x.astype(jnp.bfloat16)).astype(_dt)
            from ..utils.winguard import winkernel_size_ok

            if (
                self._winkernel
                and L.n >= self._winkernel_min
                and winkernel_size_ok(L.n, "MG level winkernel")
            ):
                import jax as _jax

                from ..attic.winkernel import WindowStiffnessOperator

                wop = WindowStiffnessOperator(
                    L.space, interpret=_jax.default_backend() == "cpu"
                )
                L.win = wop
                base_apply = wop._apply_impl

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
            # Chebyshev smoother interval [lmin_ratio*lmax, 1.05*lmax]
            lmax_s, lmin_s = 1.05 * L.lmax, lmin_ratio * L.lmax
            L.theta = 0.5 * (lmax_s + lmin_s)
            L.delta = 0.5 * (lmax_s - lmin_s)
            self.levels.append(L)

        # prolongation data: fine edge midpoint dof n_coarse+e interpolates
        # the coarse edge (edges of the *coarse* mesh)
        self.edges = [jnp.asarray(m.edges_np) for m in meshes[:-1]]

        # coarsest solve: dense (pin nullspace by rank-1 shift if Neumann)
        L0 = self.levels[0]
        assert L0.n <= coarse_dense_max, (
            f"coarsest level too big for dense solve: {L0.n}"
        )
        K0 = dense.scalar_dense(
            L0.space, np.asarray(assembly.stiffness_local(L0.space, L0.geom))
        )
        if self.neumann:
            v = np.full(L0.n, 1.0 / np.sqrt(L0.n))
            K0 = K0 + np.outer(v, v)
        else:
            m0 = np.asarray(L0.mask) == 1.0
            K0[m0, :] = 0.0
            K0[:, m0] = 0.0
            K0[m0, m0] = 1.0
        self.K0_inv = jnp.asarray(np.linalg.inv(K0), dtype=dtype)
        self.smoother_degree = smoother_degree

    # -- grid transfer -------------------------------------------------------
    def prolong(self, l, xc):
        """coarse level l -> fine level l+1."""
        e = self.edges[l]
        mid = 0.5 * (xc[e[:, 0]] + xc[e[:, 1]])
        return jnp.concatenate([xc, mid])

    def restrict(self, l, xf):
        """fine level l+1 -> coarse level l (transpose of prolong)."""
        nc = self.levels[l].n
        e = self.edges[l]
        xr = xf[:nc]
        half = 0.5 * xf[nc:]
        xr = xr.at[e[:, 0]].add(half)
        xr = xr.at[e[:, 1]].add(half)
        return xr

    # -- smoothing -----------------------------------------------------------
    def _smooth(self, L, b, x):
        """`smoother_degree` Chebyshev iterations on K x = b from initial x."""
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

    def _project(self, x):
        return x - jnp.mean(x)

    # -- V-cycle ---------------------------------------------------------------
    def v_cycle(self, b):
        """One V(smooth, smooth) cycle applied to b (zero initial guess).
        Linear and SPD: use as M in CG."""
        if self.neumann:
            b = self._project(b)

        bs = [None] * self.nlevels
        xs = [None] * self.nlevels
        bs[-1] = b
        # down-sweep
        for l in range(self.nlevels - 1, 0, -1):
            L = self.levels[l]
            x = self._smooth(L, bs[l], jnp.zeros_like(bs[l]))
            r = bs[l] - L.K(x)
            if self.neumann:
                r = self._project(r)
            xs[l] = x
            rc = self.restrict(l - 1, r)
            if self.levels[l - 1].mask is not None:
                rc = (1.0 - self.levels[l - 1].mask) * rc
            bs[l - 1] = rc
        # coarse solve
        x0 = self.K0_inv @ bs[0]
        if self.neumann:
            x0 = self._project(x0)
        xs[0] = x0
        # up-sweep
        for l in range(1, self.nlevels):
            corr = self.prolong(l - 1, xs[l - 1])
            if self.levels[l].mask is not None:
                corr = (1.0 - self.levels[l].mask) * corr
            x = xs[l] + corr
            x = self._smooth(self.levels[l], bs[l], x)
            xs[l] = x
        out = xs[-1]
        if self.neumann:
            out = self._project(out)
        return out
