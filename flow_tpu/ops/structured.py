# Structured-grid stencil fast path: on uniform rectangle/box meshes the P1
# stiffness operator is translation-invariant in the interior, so its action
# is a tiny 3x3(x3) convolution — the speed-of-light formulation on TPU
# (pure conv + an O(surface) boundary correction; no gathers, no scatters on
# the hot path). This is the operator backend for the 50M-DoF structured 3-D
# cavity target (BASELINE config 5) and for structured-grid multigrid
# smoothing.
#
# Correctness: y = conv(x, K) + correction, where the correction rows live
# only on grid-boundary vertices (their assembled rows differ from the
# interior stencil). Verified against the general gather/einsum path in
# tests/test_structured.py.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..fem import assembly
from ..fem.assembly import geometry
from ..fem.spaces import FunctionSpace

__all__ = ["supports", "StructuredLaplacian"]


def supports(mesh):
    return hasattr(mesh, "grid_shape")


def _interior_kernel(mesh):
    """Extract the interior stencil by probing a small same-spacing mesh."""
    dim = getattr(mesh, "dim", 2)
    sp = mesh.grid_spacing
    if dim == 2:
        from ..mesh import rectangle_mesh

        probe = rectangle_mesh(
            (0, 0), (6 * sp[0], 6 * sp[1]), 6, 6, diagonal="right",
            dtype=jnp.float64 if mesh.dtype == jnp.float64 else mesh.dtype,
        )
        shape = (7, 7)
        center = (3, 3)
    else:
        from ..mesh3d import box_mesh

        probe = box_mesh(
            (0, 0, 0), (6 * sp[0], 6 * sp[1], 6 * sp[2]), 6, 6, 6,
            dtype=mesh.dtype,
        )
        shape = (7, 7, 7)
        center = (3, 3, 3)
    S = FunctionSpace(probe, 1)
    g = geometry(probe)
    e = np.zeros(S.n_dofs)
    cidx = np.ravel_multi_index(center, shape)
    e[cidx] = 1.0
    y = np.asarray(assembly.stiffness_apply(S, g, jnp.asarray(e)))
    ygrid = y.reshape(shape)
    if dim == 2:
        K = ygrid[2:5, 2:5]
    else:
        K = ygrid[2:5, 2:5, 2:5]
    return np.asarray(K)


class StructuredLaplacian:
    """y = K_stiffness x on a uniform structured mesh, as conv + boundary
    correction. Drop-in replacement for fem.assembly.stiffness_apply on the
    P1 space of the mesh."""

    def __init__(self, mesh, backend="auto"):
        """backend: 'auto' (Pallas stencil kernel on TPU — measured ~20x
        faster than XLA's f32 conv there — conv elsewhere), 'conv', or
        'pallas'."""
        assert supports(mesh)
        self.mesh = mesh
        self.dim = getattr(mesh, "dim", 2)
        if backend == "auto":
            import jax as _jax

            grid = tuple(mesh.grid_shape)
            # Pallas wins on large grids (measured ~20x vs XLA conv on TPU);
            # small/coarse-level grids stay on conv (tile-size padding makes
            # tiny Pallas launches wasteful and under-tested)
            big = int(np.prod(grid)) >= 32768 and grid[-1] >= 128
            self._use_pallas = big and _jax.default_backend() not in ("cpu",)
        else:
            self._use_pallas = backend == "pallas"
        self.grid = tuple(mesh.grid_shape)
        dtype = mesh.dtype
        self.dtype = dtype
        n = int(np.prod(self.grid))

        Kst = _interior_kernel(mesh)  # [3,3(,3)]
        self.kernel = jnp.asarray(Kst, dtype=dtype)

        # ---- boundary correction (host setup) ------------------------------
        S = FunctionSpace(mesh, 1)
        geom = geometry(mesh)
        grid = self.grid
        coords = np.stack(
            np.unravel_index(np.arange(n), grid), axis=1
        )  # [n, dim]
        on_bnd = np.zeros(n, dtype=bool)
        for d in range(self.dim):
            on_bnd |= (coords[:, d] == 0) | (coords[:, d] == grid[d] - 1)
        bverts = np.where(on_bnd)[0]
        bpos = -np.ones(n, dtype=np.int64)
        bpos[bverts] = np.arange(len(bverts))

        # assemble the true rows of boundary vertices from element matrices
        cd = S.cell_dofs_np
        touch = on_bnd[cd].any(axis=1)
        ct = np.where(touch)[0]
        K_loc_sub = np.asarray(
            jnp.einsum(
                "ekl,klij->eij",
                geom.C[ct],
                jnp.asarray(assembly.ref_stiffness(1, self.dim)),
            )
        )
        nl = cd.shape[1]
        r = np.repeat(cd[ct], nl, axis=1).ravel()
        c = np.tile(cd[ct], (1, nl)).ravel()
        v = K_loc_sub.reshape(-1)
        sel = on_bnd[r]
        r, c, v = r[sel], c[sel], v[sel]
        # combine duplicates
        key = r.astype(np.int64) * n + c
        uk, inv = np.unique(key, return_inverse=True)
        vals = np.zeros(len(uk))
        np.add.at(vals, inv, v)
        ru = (uk // n).astype(np.int64)
        cu = (uk % n).astype(np.int64)

        # subtract the conv contribution K[offset] and build gather tables
        S_stencil = 3**self.dim
        off = coords[cu] - coords[ru] + 1  # in [0, 2]
        koff = np.ravel_multi_index(off.T, (3,) * self.dim)
        dvals = vals - Kst.reshape(-1)[koff]

        nb = len(bverts)
        tbl_idx = np.zeros((nb, S_stencil), dtype=np.int32)
        tbl_val = np.zeros((nb, S_stencil))
        tbl_idx[bpos[ru], koff] = cu
        tbl_val[bpos[ru], koff] = dvals

        self.bverts = jnp.asarray(bverts.astype(np.int32))
        self.tbl_idx = jnp.asarray(tbl_idx)
        self.tbl_val = jnp.asarray(tbl_val, dtype=dtype)
        self.n = n

    def __call__(self, x):
        grid = self.grid
        if self._use_pallas:
            from .pallas_stencil import stencil_apply_2d, stencil_apply_3d

            xg = x.reshape(grid)
            apply = stencil_apply_3d if self.dim == 3 else stencil_apply_2d
            y = apply(xg, self.kernel).reshape(self.n)
        else:
            xg = x.reshape((1, 1) + grid)
            k = self.kernel.reshape((1, 1) + self.kernel.shape)
            dn = lax.conv_dimension_numbers(
                xg.shape, k.shape, ("NCHW", "OIHW", "NCHW")
            ) if self.dim == 2 else lax.conv_dimension_numbers(
                xg.shape, k.shape, ("NCDHW", "OIDHW", "NCDHW")
            )
            # explicit full precision: TPU convs default to bf16 passes (a
            # ~1%% error that would silently corrupt the operator)
            y = lax.conv_general_dilated(
                xg, k, window_strides=(1,) * self.dim,
                padding="SAME", dimension_numbers=dn,
                precision=lax.Precision.HIGHEST,
            ).reshape(self.n)
        corr = jnp.einsum("bs,bs->b", self.tbl_val, x[self.tbl_idx])
        return y.at[self.bverts].add(corr)
