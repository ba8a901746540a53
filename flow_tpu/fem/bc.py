# Dirichlet boundary conditions.
#
# Replaces dolfin.DirichletBC (used throughout the reference tests, e.g.
# /root/reference/tests/test_navier_stokes.py:306,
# test_karman_vortex_street.py:138-145). A BC is resolved at construction
# into (dof indices, values); solvers consume the combined dense
# (mask, values) pair, which keeps the constrained-operator algebra
# branch-free and jit-compatible.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spaces import FunctionSpace, SubSpace

__all__ = ["DirichletBC", "combine_bcs"]


class DirichletBC:
    def __init__(self, space, value, where="on_boundary"):
        if isinstance(space, SubSpace):
            self.space = space.parent
            self.component = space.component
        else:
            self.space = space
            self.component = None

        self.dofs = self.space.boundary_dofs(where)  # np int32 [k]
        x = self.space.dof_points_np[self.dofs]
        n = len(self.dofs)
        ncomp = self.space.n_components if self.component is None else 1

        # values stay host-side numpy: they are consumed by combine_bcs on
        # the host (a D2H pull of an accelerator-resident array through the
        # axon tunnel measured 140 s at refine-5)
        self.values_np = _eval_value(value, x, ncomp)

    @property
    def values(self):
        """jnp view of the BC values (host CPU backend)."""
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            return jnp.asarray(self.values_np, dtype=self.space.mesh.dtype)

    def __repr__(self):
        return f"DirichletBC(n_dofs={len(self.dofs)}, component={self.component})"


def _eval_value(value, x, ncomp):
    n = len(x)
    if isinstance(value, (tuple, list)) and any(callable(v) for v in value):
        assert len(value) == ncomp
        cols = [
            np.asarray(v(x), dtype=np.float64).reshape(n)
            if callable(v)
            else np.full(n, float(v))
            for v in value
        ]
        return np.stack(cols, axis=1)
    if callable(value) and not np.isscalar(value):
        v = np.asarray(value(x), dtype=np.float64)
        if ncomp == 1:
            v = v.reshape(n)
        else:
            if v.shape == (ncomp, n):
                v = v.T
            v = v.reshape(n, ncomp)
        return v
    value = np.asarray(value, dtype=np.float64)
    if value.ndim == 0:
        assert ncomp == 1
        return np.full(n, float(value))
    assert value.shape == (ncomp,)
    return np.broadcast_to(value, (n, ncomp)).copy()


def combine_bcs(space: FunctionSpace, bcs):
    """Combine a list of DirichletBCs into dense (mask, values) arrays.

    mask is 1.0 on constrained dofs; values holds the boundary data there
    (later BCs in the list override earlier ones, like sequential bc.apply in
    dolfin). Shapes: [n_dofs] for scalar spaces, [n_dofs, n_components] for
    vector spaces.
    """
    if space.n_components == 1:
        mask = np.zeros(space.n_dofs)
        vals = np.zeros(space.n_dofs)
        for bc in bcs:
            assert bc.space is space or bc.space.n_dofs == space.n_dofs
            mask[bc.dofs] = 1.0
            vals[bc.dofs] = bc.values_np
    else:
        mask = np.zeros((space.n_dofs, space.n_components))
        vals = np.zeros((space.n_dofs, space.n_components))
        for bc in bcs:
            v = bc.values_np
            if bc.component is None:
                mask[bc.dofs, :] = 1.0
                vals[bc.dofs, :] = v
            else:
                mask[bc.dofs, bc.component] = 1.0
                vals[bc.dofs, bc.component] = v.reshape(-1)
    dt = space.mesh.dtype
    from ..utils.hostsetup import setup_on_cpu

    with setup_on_cpu():
        return jnp.asarray(mask, dtype=dt), jnp.asarray(vals, dtype=dt)
