# Dof-partitioned SPMD with ppermute halo exchange — the scalable
# distributed path (SURVEY.md §5.7/§5.8: "partition the element list and DoF
# vector across the ICI mesh axis, halo-exchange one element layer per step
# (ppermute), global reductions in Krylov (psum)").
#
# Contrast with parallel/domain.py (replicated vectors + full-vector psum —
# simple, exact, but O(n_dofs) communication per matvec): here each device
# owns a contiguous strip of dofs; per matvec it exchanges only the O(sqrt n)
# strip-boundary halo with its two ring neighbors (two fixed-size ppermutes
# out, two back for the transpose scatter), and Krylov dot products are
# scalar psums. This is the FEM analog of ring sequence-parallelism:
# neighbor exchange + all-reduce.
#
# Implemented for the P1 pressure-Poisson operator (the dominant solve at
# scale); the strip (1-D spatial sort) decomposition guarantees each
# device's cells touch only its own and its two neighbors' dofs.
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, PartitionSpec as P

from ..fem.assembly import geometry, ref_stiffness
from ..fem.spaces import FunctionSpace

__all__ = ["HaloPoisson"]

AXIS = "x"


class HaloPoisson:
    """Distributed K p = b solver (P1 stiffness) with halo-exchange SPMD.

    solve(b, rtol, maxiter) -> (x, iters): b and x are *global* host-visible
    vectors (scatter/gather to the partitioned layout happens at the edges;
    inside, everything is per-device).
    """

    def __init__(self, mesh, bc_mask=None, devices=None):
        devices = devices if devices is not None else jax.devices()
        ndev = len(devices)
        self.ndev = ndev
        self.jmesh = JMesh(np.array(devices), (AXIS,))
        space = FunctionSpace(mesh, 1)
        self.space = space
        dtype = mesh.dtype
        self.dtype = dtype
        n = space.n_dofs

        # ---- strip partition of cells and dofs -----------------------------
        cent = mesh.points_np[mesh.cells_np].mean(axis=1)
        cell_order = np.argsort(cent[:, 0], kind="stable")
        nc = mesh.n_cells
        c_per = -(-nc // ndev)
        dev_of_cell = np.empty(nc, dtype=np.int64)
        for d in range(ndev):
            dev_of_cell[cell_order[d * c_per : (d + 1) * c_per]] = d

        # dof owner: the minimum device among incident cells
        owner = np.full(n, ndev, dtype=np.int64)
        cd = space.cell_dofs_np  # [nc, 3]
        for k in range(3):
            np.minimum.at(owner, cd[:, k], dev_of_cell)
        assert owner.max() < ndev

        # renumber dofs by (owner, old id): each device's dofs contiguous
        perm = np.lexsort((np.arange(n), owner))  # new slot -> old dof
        newid = np.empty(n, dtype=np.int64)
        newid[perm] = np.arange(n)
        own_counts = np.bincount(owner, minlength=ndev)
        own_starts = np.concatenate([[0], np.cumsum(own_counts)])
        n_loc = int(own_counts.max())

        self.perm = perm
        self.own_counts = own_counts
        self.own_starts = own_starts
        self.n_loc = n_loc

        # ---- halo lists -----------------------------------------------------
        # For each device d: dofs touched by its cells but owned by d-1 / d+1.
        # The transpose exchange reuses the same lists on the owner side.
        halo_from_left = [[] for _ in range(ndev)]  # owned by d-1, needed by d
        halo_from_right = [[] for _ in range(ndev)]  # owned by d+1, needed by d
        for d in range(ndev):
            cells_d = np.where(dev_of_cell == d)[0]
            touched = np.unique(cd[cells_d].ravel())
            for t in touched:
                o = owner[t]
                if o == d - 1:
                    halo_from_left[d].append(t)
                elif o == d + 1:
                    halo_from_right[d].append(t)
                else:
                    assert o == d, (
                        "strip decomposition violated: cell touches a "
                        "non-neighbor device's dof"
                    )
        h = max(
            [1]
            + [len(v) for v in halo_from_left]
            + [len(v) for v in halo_from_right]
        )
        self.h = h

        # owner-side send lists (local slots), padded with the dummy slot.
        # send_to_right[d] = local slots (on d) of dofs d+1 needs from d
        #                  = halo_from_left[d+1] localized to d
        # recv ghost ordering matches the sender's list order.
        dummy = n_loc + 2 * h  # index of the zero dummy slot in x_ext
        send_r = np.full((ndev, h), dummy, dtype=np.int32)
        send_l = np.full((ndev, h), dummy, dtype=np.int32)
        nsr = np.zeros(ndev, dtype=np.int64)
        nsl = np.zeros(ndev, dtype=np.int64)
        for d in range(ndev):
            if d + 1 < ndev:
                lst = halo_from_left[d + 1]
                nsr[d] = len(lst)
                for i, g in enumerate(lst):
                    send_r[d, i] = newid[g] - own_starts[d]
            if d - 1 >= 0:
                lst = halo_from_right[d - 1]
                nsl[d] = len(lst)
                for i, g in enumerate(lst):
                    send_l[d, i] = newid[g] - own_starts[d]

        # local extended index of a global dof, per device:
        #   own:        newid - own_starts[d]            in [0, n_loc)
        #   from left:  n_loc + (position in halo_from_left[d])
        #   from right: n_loc + h + (position)
        ext_of = [dict() for _ in range(ndev)]
        for d in range(ndev):
            for i, g in enumerate(halo_from_left[d]):
                ext_of[d][g] = n_loc + i
            for i, g in enumerate(halo_from_right[d]):
                ext_of[d][g] = n_loc + h + i

        # per-device cell data (padded)
        geomg = geometry(mesh)
        C_np = np.asarray(geomg.C)
        c_loc = c_per
        cell_dofs_ext = np.full((ndev, c_loc, 3), dummy, dtype=np.int32)
        C_pad = np.zeros((ndev, c_loc, 2, 2), dtype=np.asarray(C_np).dtype)
        for d in range(ndev):
            cells_d = cell_order[d * c_per : (d + 1) * c_per]
            for j, c in enumerate(cells_d):
                C_pad[d, j] = C_np[c]
                for k in range(3):
                    g = cd[c, k]
                    if owner[g] == d:
                        cell_dofs_ext[d, j, k] = newid[g] - own_starts[d]
                    else:
                        cell_dofs_ext[d, j, k] = ext_of[d][g]

        # valid-dof mask per device (padding slots excluded from dots)
        valid = np.zeros((ndev, n_loc))
        for d in range(ndev):
            valid[d, : own_counts[d]] = 1.0

        # Dirichlet mask in partitioned layout
        if bc_mask is not None:
            mask_part = np.asarray(bc_mask)[perm]
            mask_pad = np.zeros((ndev, n_loc))
            for d in range(ndev):
                mask_pad[d, : own_counts[d]] = mask_part[
                    own_starts[d] : own_starts[d + 1]
                ]
            self.neumann = False
        else:
            mask_pad = np.zeros((ndev, n_loc))
            self.neumann = True

        # flatten per-device arrays for shard_map (axis 0 sharded)
        def shard(a):
            return jnp.asarray(np.reshape(a, (ndev * a.shape[1],) + a.shape[2:]))

        self.cell_dofs_ext = shard(cell_dofs_ext)
        self.C_pad = shard(np.asarray(C_pad, dtype=np.float64)).astype(dtype)
        self.send_r = shard(send_r[:, :, None])[:, 0]
        self.send_l = shard(send_l[:, :, None])[:, 0]
        self.valid = shard(valid[:, :, None])[:, 0].astype(dtype)
        self.mask = shard(mask_pad[:, :, None])[:, 0].astype(dtype)

        self.Kref = ref_stiffness(1)  # [2,2,3,3] numpy constant

        self.maxiter = 2000
        spec_c = P(AXIS)
        self._solve = jax.jit(
            jax.shard_map(
                self._solve_local,
                mesh=self.jmesh,
                in_specs=(spec_c,) * 7 + (P(),),
                out_specs=(spec_c, P()),
                check_vma=False,
            )
        )

    # ---- host-side pack/unpack ---------------------------------------------
    def to_partitioned(self, x_global):
        """global [n] -> padded partitioned [ndev*n_loc]."""
        xp = np.zeros(self.ndev * self.n_loc, dtype=np.asarray(x_global).dtype)
        xg = np.asarray(x_global)[self.perm]
        for d in range(self.ndev):
            xp[d * self.n_loc : d * self.n_loc + self.own_counts[d]] = xg[
                self.own_starts[d] : self.own_starts[d + 1]
            ]
        return jnp.asarray(xp, dtype=self.dtype)

    # ---- per-device kernels --------------------------------------------------
    def _halo_apply(self, x, cd_ext, C, send_r, send_l):
        """y = K x with halo exchange; x [n_loc] per device."""
        ndev = self.ndev
        n_loc, h = self.n_loc, self.h
        dummy = n_loc + 2 * h

        xz = jnp.concatenate([x, jnp.zeros(2 * h + 1, dtype=x.dtype)])
        # forward exchange: my boundary values -> neighbors' ghosts
        br = xz[send_r]  # values d+1 needs (order = d+1's halo_from_left)
        bl = xz[send_l]
        right_pairs = [(i, i + 1) for i in range(ndev - 1)]
        left_pairs = [(i + 1, i) for i in range(ndev - 1)]
        gl = jax.lax.ppermute(br, AXIS, right_pairs)  # arrives as ghost-left
        gr = jax.lax.ppermute(bl, AXIS, left_pairs)  # arrives as ghost-right

        x_ext = jnp.concatenate([x, gl, gr, jnp.zeros(1, dtype=x.dtype)])

        # local assembly: exact P1 stiffness contraction over this device's
        # cells (identical math to fem.assembly.stiffness_apply)
        Kref = jnp.asarray(self.Kref, dtype=x.dtype)
        ul = x_ext[cd_ext]  # [c_loc, 3]
        loc = jnp.einsum("ekl,klij,ej->ei", C, Kref, ul)
        y_ext = jnp.zeros(n_loc + 2 * h + 1, dtype=x.dtype)
        y_ext = y_ext.at[cd_ext].add(loc)

        # transpose exchange: ghost partial sums -> owners
        y_gl = y_ext[n_loc : n_loc + h]  # belongs to left neighbor
        y_gr = y_ext[n_loc + h : n_loc + 2 * h]  # belongs to right neighbor
        from_right = jax.lax.ppermute(y_gl, AXIS, left_pairs)
        from_left = jax.lax.ppermute(y_gr, AXIS, right_pairs)

        y = y_ext[:n_loc]
        # owners accumulate: positions are exactly the send lists
        yz = jnp.concatenate([y, jnp.zeros(2 * h + 1, dtype=y.dtype)])
        yz = yz.at[send_r].add(from_right)
        yz = yz.at[send_l].add(from_left)
        return yz[:n_loc]

    def _solve_local(self, b, cd_ext, C, send_r, send_l, valid, mask, rtol):
        free = (1.0 - mask) * valid

        def psum(v):
            return jax.lax.psum(v, AXIS)

        def K_bc(x):
            y = self._halo_apply(free * x, cd_ext, C, send_r, send_l)
            return free * y + mask * x

        # distributed dot products: local partial + scalar psum
        def dot(a, bb):
            return psum(jnp.sum(a * bb))

        if self.neumann:
            nglobal = psum(jnp.sum(valid))

            def proj(x):
                return (x - psum(jnp.sum(x * valid)) / nglobal) * valid

        else:

            def proj(x):
                return x

        b = proj(free * b)
        # diag of K for Jacobi: exact per-cell diagonal contraction, with the
        # halo-shared dofs completed by the same transpose exchange the
        # operator uses (ghost partial sums returned to their owners)
        ndev = self.ndev
        n_loc, hh = self.n_loc, self.h
        Kd = np.einsum("klii->kli", self.Kref)
        diag_loc = jnp.einsum("ekl,kli->ei", C, jnp.asarray(Kd, dtype=b.dtype))
        dz = jnp.zeros(n_loc + 2 * hh + 1, dtype=b.dtype)
        dz = dz.at[cd_ext].add(diag_loc)
        right_pairs = [(i, i + 1) for i in range(ndev - 1)]
        left_pairs = [(i + 1, i) for i in range(ndev - 1)]
        from_right = jax.lax.ppermute(dz[n_loc : n_loc + hh], AXIS, left_pairs)
        from_left = jax.lax.ppermute(
            dz[n_loc + hh : n_loc + 2 * hh], AXIS, right_pairs
        )
        dz2 = jnp.concatenate(
            [dz[:n_loc], jnp.zeros(2 * hh + 1, dtype=b.dtype)]
        )
        dz2 = dz2.at[send_r].add(from_right)
        dz2 = dz2.at[send_l].add(from_left)
        diag = dz2[:n_loc]
        diag = jnp.where(diag > 0, diag, 1.0)
        diag = free * diag + mask + (1.0 - valid)

        x = jnp.zeros_like(b)
        r = b
        z = proj(r / diag)
        p = z
        rz = dot(r, z)
        bnorm = jnp.sqrt(dot(b, b))
        target = rtol * bnorm

        def cond(s):
            x, r, z, p, rz, rn, k = s
            return jnp.logical_and(rn > target, k < self.maxiter)

        def body(s):
            x, r, z, p, rz, rn, k = s
            Ap = proj(K_bc(p))
            alpha = rz / dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = proj(r / diag)
            rz_new = dot(r, z)
            beta = rz_new / rz
            p = z + beta * p
            return (x, r, z, p, rz_new, jnp.sqrt(dot(r, r)), k + 1)

        rn0 = jnp.sqrt(dot(r, r))
        x, r, z, p, rz, rn, k = jax.lax.while_loop(
            cond, body, (x, r, z, p, rz, rn0, jnp.array(0))
        )
        return x, k

    def solve(self, b_global, rtol=1e-10, maxiter=2000):
        self.maxiter = maxiter  # read at (first) trace time
        bp = self.to_partitioned(b_global)
        xp, iters = self._solve(
            bp,
            self.cell_dofs_ext,
            self.C_pad,
            self.send_r,
            self.send_l,
            self.valid,
            self.mask,
            jnp.asarray(rtol, dtype=self.dtype),
        )
        xs = np.asarray(xp)
        # gather owned entries back to global order
        out = np.zeros(self.space.n_dofs, dtype=xs.dtype)
        for d in range(self.ndev):
            cnt = self.own_counts[d]
            seg = xs[d * self.n_loc : d * self.n_loc + cnt]
            out[self.perm[self.own_starts[d] : self.own_starts[d + 1]]] = seg
        return jnp.asarray(out), int(iters)
