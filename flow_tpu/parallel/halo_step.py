# Dof-partitioned halo-exchange execution of the FULL Navier-Stokes
# projection step — the scalable distributed path, extending the
# pressure-only solver (parallel/halo.py) to every operator in the step.
#
# Layout per device (strip decomposition over a 1-D ring):
#   [ owned dofs (padded to max strip size) | ghost-left | ghost-right | 0 ]
# Every operator application is: one forward ppermute pair (boundary values
# -> neighbor ghosts), local batched-einsum assembly over owned cells into
# the extended vector, one transpose ppermute pair (ghost partial sums ->
# owners). Krylov dots are scalar psums. Communication per matvec is
# O(strip boundary) = O(sqrt n) — contrast parallel/domain.py's replicated
# O(n) psum. Boundary (ds) facets are partitioned by their owning cell.
#
# The form kernels are the same fem/forms.py einsums, reached through
# duck-typed extended-layout spaces. Agreement with the single-chip path is
# verified in tests/test_halo_step.py.
from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as JMesh, PartitionSpec as P

from ..fem import assembly, forms
from ..fem.assembly import geometry
from ..fem.spaces import FunctionSpace
from ..fem.bc import combine_bcs
from ..solvers import krylov

__all__ = ["HaloSpace", "HaloProjection"]

AXIS = "x"


def _ring_pairs(ndev):
    return (
        [(i, i + 1) for i in range(ndev - 1)],
        [(i + 1, i) for i in range(ndev - 1)],
    )


class HaloSpace:
    """Partitioned layout of one FunctionSpace over a 1-D device ring:
    ownership, renumbering, halo/send tables, extended cell-dof maps."""

    def __init__(self, space: FunctionSpace, dev_of_cell, cell_order, ndev):
        self.space = space
        self.ndev = ndev
        n = space.n_dofs
        cd = space.cell_dofs_np
        nl = cd.shape[1]
        nc = cd.shape[0]
        c_per = -(-nc // ndev)
        self.c_loc = c_per

        owner = np.full(n, ndev, dtype=np.int64)
        for k in range(nl):
            np.minimum.at(owner, cd[:, k], dev_of_cell)
        assert owner.max() < ndev
        self.owner = owner

        perm = np.lexsort((np.arange(n), owner))  # new slot -> old dof
        newid = np.empty(n, dtype=np.int64)
        newid[perm] = np.arange(n)
        own_counts = np.bincount(owner, minlength=ndev)
        own_starts = np.concatenate([[0], np.cumsum(own_counts)])
        n_loc = int(own_counts.max())
        self.perm = perm
        self.newid = newid
        self.own_counts = own_counts
        self.own_starts = own_starts
        self.n_loc = n_loc

        halo_from_left = [[] for _ in range(ndev)]
        halo_from_right = [[] for _ in range(ndev)]
        for d in range(ndev):
            cells_d = np.where(dev_of_cell == d)[0]
            touched = np.unique(cd[cells_d].ravel())
            for t in touched:
                o = owner[t]
                if o == d - 1:
                    halo_from_left[d].append(int(t))
                elif o == d + 1:
                    halo_from_right[d].append(int(t))
                else:
                    assert o == d, "strip decomposition violated"
        h = max(
            [1]
            + [len(v) for v in halo_from_left]
            + [len(v) for v in halo_from_right]
        )
        self.h = h
        self.dummy = n_loc + 2 * h
        self.n_ext = n_loc + 2 * h + 1

        # send tables: device d sends send_r[d] (its local slots) to d+1,
        # arriving as d+1's ghost-left in the same order; similarly send_l.
        send_r = np.full((ndev, h), self.dummy, dtype=np.int32)
        send_l = np.full((ndev, h), self.dummy, dtype=np.int32)
        for d in range(ndev):
            if d + 1 < ndev:
                for i, g in enumerate(halo_from_left[d + 1]):
                    send_r[d, i] = newid[g] - own_starts[d]
            if d - 1 >= 0:
                for i, g in enumerate(halo_from_right[d - 1]):
                    send_l[d, i] = newid[g] - own_starts[d]
        self.send_r_np = send_r
        self.send_l_np = send_l

        ext_of = [dict() for _ in range(ndev)]
        for d in range(ndev):
            for i, g in enumerate(halo_from_left[d]):
                ext_of[d][g] = n_loc + i
            for i, g in enumerate(halo_from_right[d]):
                ext_of[d][g] = n_loc + h + i
        self.ext_of = ext_of

        cell_dofs_ext = np.full((ndev, c_per, nl), self.dummy, dtype=np.int32)
        for d in range(ndev):
            cells_d = cell_order[d * c_per : (d + 1) * c_per]
            for j, c in enumerate(cells_d):
                for k in range(nl):
                    cell_dofs_ext[d, j, k] = self.ext_index(d, cd[c, k])
        self.cell_dofs_ext_np = cell_dofs_ext

        valid = np.zeros((ndev, n_loc))
        for d in range(ndev):
            valid[d, : own_counts[d]] = 1.0
        self.valid_np = valid

    def ext_index(self, d, g):
        """Extended-local index of global dof g on device d."""
        if self.owner[g] == d:
            return int(self.newid[g] - self.own_starts[d])
        return self.ext_of[d].get(int(g), self.dummy)

    def to_partitioned(self, x_global):
        x = np.asarray(x_global)
        tail = x.shape[1:]
        xp = np.zeros((self.ndev * self.n_loc,) + tail, dtype=x.dtype)
        xs = x[self.perm]
        for d in range(self.ndev):
            cnt = self.own_counts[d]
            xp[d * self.n_loc : d * self.n_loc + cnt] = xs[
                self.own_starts[d] : self.own_starts[d + 1]
            ]
        return jnp.asarray(xp)

    def from_partitioned(self, xp):
        xp = np.asarray(xp)
        tail = xp.shape[1:]
        out_sorted = np.zeros((self.space.n_dofs,) + tail, dtype=xp.dtype)
        for d in range(self.ndev):
            cnt = self.own_counts[d]
            out_sorted[self.own_starts[d] : self.own_starts[d + 1]] = xp[
                d * self.n_loc : d * self.n_loc + cnt
            ]
        out = np.zeros_like(out_sorted)
        out[self.perm] = out_sorted
        return jnp.asarray(out)


class _ExtLocalSpace:
    """Duck-typed FunctionSpace over the per-device extended layout. dof_sum
    returns extended vectors — the caller applies the transpose exchange once
    per operator application."""

    def __init__(self, degree, n_components, n_ext, cell_dofs_ext, dtype, dim=2):
        self.degree = degree
        self.n_components = n_components
        self.n_ext = n_ext
        self.cell_dofs = cell_dofs_ext
        self.mesh = SimpleNamespace(dtype=dtype, dim=dim)

    def gather(self, U_ext):
        return U_ext[self.cell_dofs]

    def dof_sum(self, loc):
        out = jnp.zeros((self.n_ext,) + loc.shape[2:], dtype=loc.dtype)
        return out.at[self.cell_dofs].add(loc)


class HaloProjection:
    """Full projection step over dof-partitioned state with ppermute halo
    exchange. step(U_part, P_part, dt) -> (U1_part, P1_part); use
    .Vh/.Qh to_partitioned/from_partitioned at the edges."""

    def __init__(
        self,
        V: FunctionSpace,
        Q: FunctionSpace,
        u_bcs,
        p_bcs,
        rho,
        mu,
        f=None,
        devices=None,
        time_step_method="backward euler",
        rotational_form=True,
        newton_tol=1.0e-10,
        newton_maxiter=10,
        linear_rtol=1.0e-7,
        pressure_rtol=1.0e-10,
        correction_rtol=1.0e-10,
        mesh_hierarchy=None,
        smoother_degree=3,
        cfl_target=1.0,
        dt_max=1.0,
        convection="newton",
    ):
        mesh = V.mesh
        dtype = mesh.dtype
        self.dtype = dtype
        self.dim = getattr(mesh, "dim", 2)
        self.Q = Q
        devices = devices if devices is not None else jax.devices()
        ndev = len(devices)
        self.ndev = ndev
        self.jmesh = JMesh(np.array(devices), (AXIS,))

        cent = mesh.points_np[mesh.cells_np].mean(axis=1)
        cell_order = np.argsort(cent[:, 0], kind="stable")
        nc = mesh.n_cells
        c_per = -(-nc // ndev)
        dev_of_cell = np.empty(nc, dtype=np.int64)
        for d in range(ndev):
            dev_of_cell[cell_order[d * c_per : (d + 1) * c_per]] = d

        self.Vh = HaloSpace(V, dev_of_cell, cell_order, ndev)
        self.Qh = HaloSpace(Q, dev_of_cell, cell_order, ndev)

        geomg = geometry(mesh)
        ntot = c_per * ndev
        pad = ntot - nc

        def pad_cells(a, fill=0.0):
            a = np.asarray(a)[cell_order]
            if pad:
                a = np.concatenate(
                    [a, np.full((pad,) + a.shape[1:], fill, dtype=a.dtype)]
                )
            return jnp.asarray(a, dtype=dtype)

        self.detJ = pad_cells(np.asarray(geomg.detJ))
        self.G = pad_cells(np.asarray(geomg.G))
        self.C = pad_cells(np.asarray(geomg.C))

        # stationary body force, evaluated at the volume quadrature points of
        # each (reordered, padded) cell and sharded with them
        self.has_f = f is not None
        if self.has_f:
            from ..fem.interpolate import eval_callable

            tabF = assembly.tabulation(V, 6)
            xq = geomg.physical_points(jnp.asarray(tabF.ref_pts, dtype=dtype))
            fq = np.asarray(eval_callable(f, xq))  # [nc, q, m]
            self.Fq = pad_cells(fq)
        else:
            self.Fq = jnp.zeros((ntot, 1, V.n_components), dtype=dtype)

        mask_u, val_u = combine_bcs(V, u_bcs)
        self.mask_u = jnp.asarray(
            self.Vh.to_partitioned(np.asarray(mask_u)), dtype=dtype
        )
        self.val_u = jnp.asarray(
            self.Vh.to_partitioned(np.asarray(val_u)), dtype=dtype
        )
        self.has_p_bcs = bool(p_bcs)
        if self.has_p_bcs:
            mask_p, val_p = combine_bcs(Q, p_bcs)
            self._mask_p_global_np = np.asarray(mask_p)
            self.mask_p = jnp.asarray(
                self.Qh.to_partitioned(np.asarray(mask_p)), dtype=dtype
            )
            self.val_p = jnp.asarray(
                self.Qh.to_partitioned(np.asarray(val_p)), dtype=dtype
            )
        else:
            self._mask_p_global_np = None
            self.mask_p = jnp.zeros(ndev * self.Qh.n_loc, dtype=dtype)
            self.val_p = self.mask_p
        self.valid_V = jnp.asarray(self.Vh.valid_np.reshape(-1), dtype=dtype)
        self.valid_Q = jnp.asarray(self.Qh.valid_np.reshape(-1), dtype=dtype)

        ncomp = V.n_components
        md = np.asarray(assembly.mass_diag(V, geomg))
        sd = np.asarray(assembly.stiffness_diag(V, geomg))
        self.mass_diag_V = jnp.asarray(
            self.Vh.to_partitioned(np.repeat(md[:, None], ncomp, 1)), dtype=dtype
        )
        self.stiff_diag_V = jnp.asarray(
            self.Vh.to_partitioned(np.repeat(sd[:, None], ncomp, 1)), dtype=dtype
        )
        self.stiff_diag_Q = jnp.asarray(
            self.Qh.to_partitioned(np.asarray(assembly.stiffness_diag(Q, geomg))),
            dtype=dtype,
        )

        self.send_r_V = jnp.asarray(self.Vh.send_r_np.reshape(-1))
        self.send_l_V = jnp.asarray(self.Vh.send_l_np.reshape(-1))
        self.send_r_Q = jnp.asarray(self.Qh.send_r_np.reshape(-1))
        self.send_l_Q = jnp.asarray(self.Qh.send_l_np.reshape(-1))
        self.cd_V = jnp.asarray(self.Vh.cell_dofs_ext_np.reshape(ntot, -1))
        self.cd_Q = jnp.asarray(self.Qh.cell_dofs_ext_np.reshape(ntot, -1))

        self._build_boundary(V, Q, mesh, dev_of_cell, geomg)

        self.rho = float(rho)
        self.mu = float(mu)
        self.rotational = rotational_form
        self.bdf2 = time_step_method == "bdf2"
        if time_step_method == "forward euler":
            self.theta = (1.0, 0.0)
        elif time_step_method in ("backward euler", "bdf2"):
            # BDF2 through the BE machinery via the u-hat reformulation
            # (same trick as FastStepper._bdf2_hat): a BE step from
            # uhat = ((1+r)^2 U - r^2 Um1)/(1+2r) with dt* = dt(1+r)/(1+2r)
            self.theta = (0.0, 1.0)
        else:
            assert time_step_method == "crank-nicolson"
            self.theta = (0.5, 0.5)
        self.newton_tol = newton_tol
        self.newton_maxiter = newton_maxiter
        self.linear_rtol = linear_rtol
        # semi-implicit (lagged/extrapolated) convection, matching
        # FastStepper(convection="lagged"): one linear momentum solve per
        # step (transport = u^n / BDF2 extrapolation) instead of Newton
        assert convection in ("newton", "lagged"), convection
        self.lagged = convection == "lagged"
        self.pressure_rtol = pressure_rtol
        self.correction_rtol = correction_rtol
        # increment-form pressure/correction solves, matching FastStepper
        # (see navier_stokes/fast.py _pressure_solve_mg): the Krylov rtol
        # then measures the increment scale, which keeps small-amplitude
        # dynamics from being filtered by the truncation floor
        import os as _os

        self.increment_form = _os.environ.get("FLOW_ABS_SOLVES", "") != "1"
        self.degV, self.degQ = V.degree, Q.degree
        self.ncomp = ncomp
        self.cfl_target = cfl_target
        self.dt_max_run = dt_max
        self.hmax = float(mesh.hmax)

        # distributed geometric multigrid for the pressure solve (the
        # BoomerAMG-under-MPI replacement, reference
        # pressure_correction.py:414-419): finest level smoothed with
        # halo-exchange matvecs, coarser levels replicated
        self._mg = None
        if mesh_hierarchy is not None and len(mesh_hierarchy) > 1:
            self._build_mg(mesh_hierarchy, smoother_degree)

        # gather-free window kernels for the per-device momentum matvec
        # (parallel/halo_win.py; FLOW_WINKERNEL=1, same knob as FastStepper)
        self.winkernel = _os.environ.get("FLOW_WINKERNEL", "") == "1"
        if self.winkernel:
            from ..utils.winguard import winkernel_size_ok

            # per-device operator rows = the extended (owned + halo) dof set
            self.winkernel = winkernel_size_ok(
                int(self.Vh.n_ext), "halo momentum winkernel"
            )
        self._win_tabs = None
        if self.winkernel:
            from ..attic.halo_win import build_halo_window_tables

            self._win_meta, self._win_tabs, self._win_sm, self._win_tab = (
                build_halo_window_tables(
                    self.Vh,
                    np.asarray(self.detJ),
                    np.asarray(self.G),
                    np.asarray(self.C),
                    self.dim,
                )
            )
            self._win_interp = jax.default_backend() == "cpu"

        spec_c = P(AXIS)
        spec_r = P()
        # sharded args: everything except dt
        in_specs = tuple(
            [spec_c, spec_c, spec_r]
            + [spec_c] * 19
            + ([spec_c] * 8 if self._nb_loc else [])
            # one pytree arg; the spec broadcasts over its leaves
            + ([spec_c] if self._win_tabs else [])
        )
        self._in_specs = in_specs
        self._step = jax.jit(
            jax.shard_map(
                self._step_local,
                mesh=self.jmesh,
                in_specs=in_specs,
                out_specs=(spec_c, spec_c),
                check_vma=False,
            )
        )
        self._run_cache = {}
        self._step_bdf2_fn = None

    # ---- boundary facets, partitioned by owning cell -----------------------
    def _build_boundary(self, V, Q, mesh, dev_of_cell, geomg):
        from ..fem.assembly import BoundaryTab, BoundaryFaceTab

        if self.dim == 2:
            btV = BoundaryTab(V, rule_degree=6)
            btQ = BoundaryTab(Q, rule_degree=6)
        else:
            btV = BoundaryFaceTab(V, rule_degree=6)
            btQ = BoundaryFaceTab(Q, rule_degree=6)
        ndev = self.ndev
        cells_b = np.asarray(mesh.boundary_cells_np, dtype=np.int64)
        dev_b = dev_of_cell[cells_b]
        nb_loc = (
            int(np.bincount(dev_b, minlength=ndev).max()) if len(cells_b) else 0
        )
        self._nb_loc = nb_loc
        if nb_loc == 0:
            return
        nq1 = btV.nq1
        nlV, nlQ = V.n_local, Q.n_local
        dim = self.dim

        phiV = np.zeros((ndev, nb_loc, nq1, nlV))
        dphiV = np.zeros((ndev, nb_loc, nq1, nlV, dim))
        phiQ = np.zeros((ndev, nb_loc, nq1, nlQ))
        wl = np.zeros((ndev, nb_loc, nq1))
        normals = np.zeros((ndev, nb_loc, dim))
        Gb = np.zeros((ndev, nb_loc, dim, dim))
        cdV_b = np.full((ndev, nb_loc, nlV), self.Vh.dummy, dtype=np.int32)
        cdQ_b = np.full((ndev, nb_loc, nlQ), self.Qh.dummy, dtype=np.int32)

        Gg = np.asarray(geomg.G)
        cdV_np, cdQ_np = V.cell_dofs_np, Q.cell_dofs_np
        fill = np.zeros(ndev, dtype=np.int64)
        for b, c in enumerate(cells_b):
            d = dev_b[b]
            j = fill[d]
            fill[d] += 1
            phiV[d, j] = np.asarray(btV.phi)[b]
            dphiV[d, j] = np.asarray(btV.dphi)[b]
            phiQ[d, j] = np.asarray(btQ.phi)[b]
            wl[d, j] = np.asarray(btV.wl)[b]
            normals[d, j] = np.asarray(btV.normals)[b]
            Gb[d, j] = Gg[c]
            for k in range(nlV):
                cdV_b[d, j, k] = self.Vh.ext_index(d, cdV_np[c, k])
            for k in range(nlQ):
                cdQ_b[d, j, k] = self.Qh.ext_index(d, cdQ_np[c, k])

        def fl(a):
            return jnp.asarray(
                a.reshape((ndev * nb_loc,) + a.shape[2:]), dtype=self.dtype
            )

        self.b_phiV = fl(phiV)
        self.b_dphiV = fl(dphiV)
        self.b_phiQ = fl(phiQ)
        self.b_wl = fl(wl)
        self.b_normals = fl(normals)
        self.b_Gb = fl(Gb)
        self.b_cdV = jnp.asarray(cdV_b.reshape(ndev * nb_loc, -1))
        self.b_cdQ = jnp.asarray(cdQ_b.reshape(ndev * nb_loc, -1))

    # ---- distributed multigrid --------------------------------------------
    def _build_mg(self, meshes, smoother_degree):
        """Distributed V-cycle data. The finest level is smoothed in the
        partitioned layout (Chebyshev; matvecs = halo exchanges); the
        residual is restricted onto a REPLICATED coarse hierarchy (plain
        P1Hierarchy on meshes[:-1]) whose V-cycle every device runs
        redundantly. All transfer operators are index arithmetic, so the
        cycle is bitwise the single-chip V-cycle — CG iteration counts
        match single-chip GMG exactly. Communication per V-cycle: one
        all_gather of the fine residual + the smoothers' O(sqrt n) halos."""
        from ..solvers.multigrid import P1Hierarchy
        from ..solvers.chebyshev import power_iteration_lmax

        Q, mesh = self.Q, self.Q.mesh
        dtype = self.dtype
        assert meshes[-1].n_points == mesh.n_points, (
            "mesh_hierarchy[-1] must be the stepper's mesh"
        )
        n = Q.n_dofs
        geomg = geometry(mesh)
        diag_g = assembly.stiffness_diag(Q, geomg)
        diag_g = jnp.where(diag_g > 0, diag_g, 1.0)
        if self.has_p_bcs:
            mask_g = jnp.asarray(self._mask_p_global_np, dtype=dtype)
            free_g = 1.0 - mask_g

            def Kg(x):
                return free_g * assembly.stiffness_apply(
                    Q, geomg, free_g * x
                ) + mask_g * x

            diag_pw = free_g * diag_g + mask_g
            cmask = self._mask_p_global_np[: meshes[-2].n_points]
            coarse = P1Hierarchy(
                meshes[:-1], bc_mask=cmask, smoother_degree=smoother_degree
            )
            free_g_np = free_g
        else:

            def Kg(x):
                return assembly.stiffness_apply(Q, geomg, x)

            diag_pw = diag_g
            coarse = P1Hierarchy(
                meshes[:-1], bc_mask=None, smoother_degree=smoother_degree
            )
            free_g_np = None

        lmax = power_iteration_lmax(Kg, diag_pw, n, dtype=dtype)
        lmax_s, lmin_s = 1.05 * lmax, 0.30 * lmax

        # partitioned <-> replicated-global index tables
        Qh = self.Qh
        ndev, n_loc = self.ndev, Qh.n_loc
        inv_slot = np.zeros(n, dtype=np.int32)  # global dof -> gathered slot
        own_global = np.zeros(ndev * n_loc, dtype=np.int32)  # slot -> dof
        for d in range(ndev):
            cnt = Qh.own_counts[d]
            gl = Qh.perm[Qh.own_starts[d] : Qh.own_starts[d + 1]]
            inv_slot[gl] = d * n_loc + np.arange(cnt)
            own_global[d * n_loc : d * n_loc + cnt] = gl
        ccoarse_mask = None
        if coarse.levels[-1].mask is not None:
            ccoarse_mask = coarse.levels[-1].mask
        self._mg = dict(
            coarse=coarse,
            theta=0.5 * (lmax_s + lmin_s),
            delta=0.5 * (lmax_s - lmin_s),
            deg=smoother_degree,
            inv_slot=jnp.asarray(inv_slot),
            own_global=jnp.asarray(own_global),
            edges=jnp.asarray(meshes[-2].edges_np),
            ncoarse=int(meshes[-2].n_points),
            free_g=free_g_np,
            coarse_mask=ccoarse_mask,
        )

    def _cheb_smooth(self, K, diag, b, x=None):
        """Chebyshev smoothing on K x = b (same recurrence as
        P1Hierarchy._smooth), degree self._mg['deg']."""
        mg = self._mg
        sigma = mg["theta"] / mg["delta"]
        rho_ = 1.0 / sigma
        r = b if x is None else b - K(x)
        d = (r / diag) / mg["theta"]
        x = d if x is None else x + d
        for _ in range(mg["deg"] - 1):
            r = r - K(d)
            rho_new = 1.0 / (2.0 * sigma - rho_)
            d = rho_new * rho_ * d + (2.0 * rho_new / mg["delta"]) * (r / diag)
            x = x + d
            rho_ = rho_new
        return x

    def _mg_precond(self, K, diag, valid_Q, proj):
        """The per-device V-cycle callable M(r) for _dist_cg."""
        mg = self._mg
        n_loc = self.Qh.n_loc
        inv_slot = mg["inv_slot"]
        own_global = mg["own_global"]
        e = mg["edges"]
        ncoarse = mg["ncoarse"]
        idx = jax.lax.axis_index(AXIS)
        og = jax.lax.dynamic_slice_in_dim(own_global, idx * n_loc, n_loc)

        def M(r):
            # pre-smooth (partitioned, halo matvecs)
            x = self._cheb_smooth(K, diag, r)
            res = r - K(x)
            if proj is not None:
                res = proj(res)
            # gather residual to the replicated global numbering
            rg = jax.lax.all_gather(res, AXIS, tiled=True)[inv_slot]
            # restrict to the coarse level (index arithmetic) + coarse mask
            rc = rg[:ncoarse]
            half = 0.5 * rg[ncoarse:]
            rc = rc.at[e[:, 0]].add(half)
            rc = rc.at[e[:, 1]].add(half)
            if mg["coarse_mask"] is not None:
                rc = (1.0 - mg["coarse_mask"]) * rc
            # replicated coarse V-cycle (identical on every device)
            xc = mg["coarse"].v_cycle(rc)
            # prolong back to fine-global, mask, pick up this device's slots
            corr_g = jnp.concatenate(
                [xc, 0.5 * (xc[e[:, 0]] + xc[e[:, 1]])]
            )
            if mg["free_g"] is not None:
                corr_g = mg["free_g"] * corr_g
            x = x + corr_g[og] * valid_Q
            # post-smooth
            x = self._cheb_smooth(K, diag, r, x)
            if proj is not None:
                x = proj(x)
            return x

        return M

    # ---- public entry ---------------------------------------------------------
    def _table_args(self):
        args = [
            self.cd_V,
            self.cd_Q,
            self.detJ,
            self.G,
            self.C,
            self.mask_u,
            self.val_u,
            self.mask_p,
            self.val_p,
            self.valid_V,
            self.valid_Q,
            self.send_r_V,
            self.send_l_V,
            self.send_r_Q,
            self.send_l_Q,
            self.mass_diag_V,
            self.stiff_diag_V,
            self.stiff_diag_Q,
            self.Fq,
        ]
        if self._nb_loc:
            args += [
                self.b_cdV,
                self.b_cdQ,
                self.b_phiV,
                self.b_dphiV,
                self.b_phiQ,
                self.b_wl,
                self.b_normals,
                self.b_Gb,
            ]
        if self._win_tabs:
            args += [self._win_tabs]  # one pytree arg, all leaves sharded
        return args

    def step(self, U_part, P_part, dt):
        return self._step(
            U_part, P_part, jnp.asarray(dt, dtype=self.dtype),
            *self._table_args(),
        )

    @staticmethod
    def _bdf2_hat(U, Um1, dt, dtp):
        r = dt / dtp
        uhat = ((1.0 + r) ** 2 * U - r * r * Um1) / (1.0 + 2.0 * r)
        dt_eff = dt * (1.0 + r) / (1.0 + 2.0 * r)
        return uhat, dt_eff, r

    def step_bdf2(self, U_part, Um1_part, P_part, dt, dtp):
        """One variable-step BDF2 step on partitioned state."""
        assert self.bdf2
        if self._step_bdf2_fn is None:
            spec_c = P(AXIS)
            spec_r = P()

            def _one(U, Um1, Pv, dt, dtp, *tables):
                uhat, dt_eff, r = self._bdf2_hat(U, Um1, dt, dtp)
                x0 = (1.0 + r) * U - r * Um1
                U1, P1, _ = self._substep_core(uhat, Pv, dt_eff, *tables, x0=x0)
                return U1, P1

            self._step_bdf2_fn = jax.jit(
                jax.shard_map(
                    _one,
                    mesh=self.jmesh,
                    in_specs=(spec_c, spec_c, spec_c, spec_r, spec_r)
                    + self._in_specs[3:],
                    out_specs=(spec_c, spec_c),
                    check_vma=False,
                )
            )
        return self._step_bdf2_fn(
            U_part,
            Um1_part,
            P_part,
            jnp.asarray(dt, dtype=self.dtype),
            jnp.asarray(dtp, dtype=self.dtype),
            *self._table_args(),
        )

    def _run_bdf2(self, U_part, P_part, dt0, n_steps, Um1_part, dtp0):
        """Fused BDF2 scan: carry additionally holds (Um1, dtp); defaults
        re-bootstrap (Um1=U, dtp=dt0 makes the first step BE-consistent).
        Returns (U, P, dt, telemetry, (Um1, dtp))."""
        if Um1_part is None:
            Um1_part = U_part
        if dtp0 is None:
            dtp0 = dt0
        fn = self._run_cache.get(("bdf2", n_steps))
        if fn is None:
            spec_c = P(AXIS)
            spec_r = P()

            def _run(U, Um1, Pv, dt0, dtp0, *tables):
                valid_V = tables[9]

                def body(carry, _):
                    U, Um1, Pv, dt, dtp, t = carry
                    uhat, dt_eff, r = self._bdf2_hat(U, Um1, dt, dtp)
                    x0 = (1.0 + r) * U - r * Um1
                    U1, P1, stats = self._substep_core(
                        uhat, Pv, dt_eff, *tables, x0=x0
                    )
                    t = t + dt
                    um2 = jax.lax.pmax(
                        jnp.max(jnp.sum(U1 * U1, axis=1) * valid_V), AXIS
                    )
                    umax = jnp.sqrt(um2)
                    target_dt = (
                        self.cfl_target * self.hmax / jnp.maximum(umax, 1e-30)
                    )
                    dt_new = jnp.minimum(
                        self.dt_max_run,
                        dt * jnp.minimum(2.0, 1.0 + 0.5 * (target_dt - dt) / dt),
                    )
                    out = {
                        "t": t,
                        "dt": dt,
                        "pressure_iters": stats["pressure_iters"],
                        "correction_iters": stats["correction_iters"],
                    }
                    return (U1, U, P1, dt_new, dt, t), out

                (U, Um1, Pv, dt, dtp, t), tel = jax.lax.scan(
                    body,
                    (U, Um1, Pv, dt0, dtp0, jnp.asarray(0.0, dtype=U.dtype)),
                    None,
                    length=n_steps,
                )
                return U, Um1, Pv, dt, dtp, tel

            tel_spec = {
                "t": spec_r,
                "dt": spec_r,
                "pressure_iters": spec_r,
                "correction_iters": spec_r,
            }
            fn = jax.jit(
                jax.shard_map(
                    _run,
                    mesh=self.jmesh,
                    in_specs=(spec_c, spec_c, spec_c, spec_r, spec_r)
                    + self._in_specs[3:],
                    out_specs=(spec_c, spec_c, spec_c, spec_r, spec_r, tel_spec),
                    check_vma=False,
                )
            )
            self._run_cache[("bdf2", n_steps)] = fn
        U, Um1, Pv, dt, dtp, tel = fn(
            U_part,
            Um1_part,
            P_part,
            jnp.asarray(dt0, dtype=self.dtype),
            jnp.asarray(dtp0, dtype=self.dtype),
            *self._table_args(),
        )
        return U, Pv, dt, tel, (Um1, dtp)

    def run(self, U_part, P_part, dt0, n_steps, Um1=None, dtp0=None):
        """Fused lax.scan over n_steps full projection steps with the
        on-device CFL dt controller — the distributed twin of
        FastStepper._run_impl. Returns (U, P, dt, telemetry) with
        telemetry arrays (t, dt, pressure_iters, correction_iters)
        replicated across devices; BDF2 returns a 5th element (Um1, dtp)
        for checkpoint chaining."""
        if self.bdf2:
            return self._run_bdf2(U_part, P_part, dt0, n_steps, Um1, dtp0)
        fn = self._run_cache.get(n_steps)
        if fn is None:
            spec_c = P(AXIS)
            spec_r = P()

            def _run(U, Pv, dt0, *tables):
                # tables[9] is valid_V (see _table_args order)
                valid_V = tables[9]

                def body(carry, _):
                    U, Pv, dt, t = carry
                    U1, P1, stats = self._substep_core(U, Pv, dt, *tables)
                    t = t + dt
                    um2 = jax.lax.pmax(
                        jnp.max(jnp.sum(U1 * U1, axis=1) * valid_V), AXIS
                    )
                    umax = jnp.sqrt(um2)
                    target_dt = (
                        self.cfl_target * self.hmax / jnp.maximum(umax, 1e-30)
                    )
                    dt_new = jnp.minimum(
                        self.dt_max_run,
                        dt * jnp.minimum(2.0, 1.0 + 0.5 * (target_dt - dt) / dt),
                    )
                    out = {
                        "t": t,
                        "dt": dt,
                        "pressure_iters": stats["pressure_iters"],
                        "correction_iters": stats["correction_iters"],
                    }
                    return (U1, P1, dt_new, t), out

                (U, Pv, dt, t), tel = jax.lax.scan(
                    body,
                    (U, Pv, dt0, jnp.asarray(0.0, dtype=U.dtype)),
                    None,
                    length=n_steps,
                )
                return U, Pv, dt, tel

            tel_spec = {
                "t": spec_r,
                "dt": spec_r,
                "pressure_iters": spec_r,
                "correction_iters": spec_r,
            }
            fn = jax.jit(
                jax.shard_map(
                    _run,
                    mesh=self.jmesh,
                    in_specs=self._in_specs,
                    out_specs=(spec_c, spec_c, spec_r, tel_spec),
                    check_vma=False,
                )
            )
            self._run_cache[n_steps] = fn
        return fn(
            U_part, P_part, jnp.asarray(dt0, dtype=self.dtype),
            *self._table_args(),
        )

    # ---- per-device exchange helpers -------------------------------------------
    def _fwd(self, x_own, send_r, send_l, h):
        right, left = _ring_pairs(self.ndev)
        tail = x_own.shape[1:]
        xz = jnp.concatenate(
            [x_own, jnp.zeros((2 * h + 1,) + tail, dtype=x_own.dtype)]
        )
        gl = jax.lax.ppermute(xz[send_r], AXIS, right)
        gr = jax.lax.ppermute(xz[send_l], AXIS, left)
        return jnp.concatenate(
            [x_own, gl, gr, jnp.zeros((1,) + tail, dtype=x_own.dtype)]
        )

    def _bwd(self, y_ext, send_r, send_l, n_loc, h):
        right, left = _ring_pairs(self.ndev)
        from_right = jax.lax.ppermute(y_ext[n_loc : n_loc + h], AXIS, left)
        from_left = jax.lax.ppermute(
            y_ext[n_loc + h : n_loc + 2 * h], AXIS, right
        )
        tail = y_ext.shape[1:]
        yz = jnp.concatenate(
            [y_ext[:n_loc], jnp.zeros((2 * h + 1,) + tail, dtype=y_ext.dtype)]
        )
        yz = yz.at[send_r].add(from_right)
        yz = yz.at[send_l].add(from_left)
        return yz[:n_loc]

    # ---- the step --------------------------------------------------------------
    def _step_local(self, *args):
        U1, P1, _stats = self._substep_core(*args)
        return U1, P1

    def _substep_core(self, U, Pv, dt, *tables, x0=None):
        # self-unpack by the STATIC table-group flags (boundary facets,
        # window kernels): optional positional groups would otherwise
        # misbind when an earlier group is absent
        it = iter(tables)
        (
            cd_V, cd_Q, detJ, G, C, mask_u, val_u, mask_p, val_p,
            valid_V, valid_Q, send_r_V, send_l_V, send_r_Q, send_l_Q,
            mass_diag_V, stiff_diag_V, stiff_diag_Q, Fq,
        ) = (next(it) for _ in range(19))
        if self._nb_loc:
            (b_cdV, b_cdQ, b_phiV, b_dphiV, b_phiQ, b_wl, b_normals,
             b_Gb) = (next(it) for _ in range(8))
        else:
            b_cdV = b_cdQ = b_phiV = b_dphiV = b_phiQ = None
            b_wl = b_normals = b_Gb = None
        win = next(it) if self._win_tabs else None
        rest = list(it)
        assert not rest, f"unconsumed table args: {len(rest)}"
        dtype = self.dtype
        Vh, Qh = self.Vh, self.Qh
        Vl = _ExtLocalSpace(self.degV, self.ncomp, Vh.n_ext, cd_V, dtype, self.dim)
        Ql = _ExtLocalSpace(self.degQ, 1, Qh.n_ext, cd_Q, dtype, self.dim)
        gm = SimpleNamespace(detJ=detJ, G=G, C=C, dim=self.dim)
        rho, mu = self.rho, self.mu
        nV, hV = Vh.n_loc, Vh.h
        nQ, hQ = Qh.n_loc, Qh.h

        def psum(x):
            return jax.lax.psum(x, AXIS)

        def fwd_V(x):
            return self._fwd(x, send_r_V, send_l_V, hV)

        def bwd_V(y):
            return self._bwd(y, send_r_V, send_l_V, nV, hV)

        def fwd_Q(x):
            return self._fwd(x, send_r_Q, send_l_Q, hQ)

        def bwd_Q(y):
            return self._bwd(y, send_r_Q, send_l_Q, nQ, hQ)

        def dot(a, b):
            return psum(jnp.sum(a * b))

        # ---- boundary (ds) terms: facets owned by this device --------------
        def boundary_terms_ext(W_ext, P_ext, T_ext=None):
            if b_cdV is None:
                return jnp.zeros((Vh.n_ext, self.ncomp), dtype=dtype)
            wloc = W_ext[b_cdV]  # [nb, nlV, m]
            ploc = P_ext[b_cdQ]  # [nb, nlQ]
            pq = jnp.einsum("bql,bl->bq", b_phiQ, ploc)
            gw = jnp.einsum("bqlk,bdk,blm->bqmd", b_dphiV, b_Gb, wloc)
            val = -pq[:, :, None] * b_normals[:, None, :]
            # + mu (grad u)^T n: out_a = sum_m du_m/dx_a n_m (matches the
            # single-chip _rhs_weak_bnd after the transposed-einsum fix)
            val = val + mu * jnp.einsum("bqma,bm->bqa", gw, b_normals)
            # directional do-nothing outflow flux (single-chip parity:
            # _rhs_weak_bnd) — restores the skew form's boundary
            # compensation where w.n > 0, energy-stable under backflow.
            # T_ext (lagged mode): fixed transport for the (w.n)+ factor
            wb = jnp.einsum("bqi,bim->bqm", b_phiV, wloc)
            tb = wb if T_ext is None else jnp.einsum(
                "bqi,bim->bqm", b_phiV, T_ext[b_cdV]
            )
            tn = jnp.einsum("bqm,bm->bq", tb, b_normals)
            val = val - 0.5 * rho * jnp.maximum(tn, 0.0)[:, :, None] * wb
            loc = jnp.einsum("bqm,bq,bqi->bim", val, b_wl, b_phiV)
            out = jnp.zeros((Vh.n_ext, self.ncomp), dtype=dtype)
            return out.at[b_cdV].add(loc)

        def bnd_tangent_ext(v_ext, tsrc_ext, frozen_transport):
            """Tangent of the x-dependent ds-terms at state tsrc_ext (for
            the window-kernel momentum solves): stress is linear; the
            do-nothing term keeps the (t.n)+ v piece and, unless the
            transport is frozen (lagged), adds H(t.n)(v.n) t."""
            if b_cdV is None:
                return None
            wloc = v_ext[b_cdV]
            gw = jnp.einsum("bqlk,bdk,blm->bqmd", b_dphiV, b_Gb, wloc)
            val = mu * jnp.einsum("bqma,bm->bqa", gw, b_normals)
            tb = jnp.einsum("bqi,bim->bqm", b_phiV, tsrc_ext[b_cdV])
            tn = jnp.einsum("bqm,bm->bq", tb, b_normals)
            wb = jnp.einsum("bqi,bim->bqm", b_phiV, wloc)
            val = val - 0.5 * rho * jnp.maximum(tn, 0.0)[:, :, None] * wb
            if not frozen_transport:
                wn = jnp.einsum("bqm,bm->bq", wb, b_normals)
                pos = (tn > 0.0).astype(wb.dtype)
                val = val - 0.5 * rho * (pos * wn)[:, :, None] * tb
            loc = jnp.einsum("bqm,bq,bqi->bim", val, b_wl, b_phiV)
            out = jnp.zeros((Vh.n_ext, self.ncomp), dtype=dtype)
            return out.at[b_cdV].add(loc)

        # ---- momentum residual (fused: one gather, one extended scatter,
        # one transpose exchange per evaluation) -------------------------------
        free_u = (1.0 - mask_u) * valid_V[:, None]

        def rhs_weak_loc(Wloc, Ploc):
            loc = -rho * forms.skew_convection_combined_loc(
                Vl, gm, Wloc, rule_degree=5
            )
            loc = loc - forms.sym_grad_loc(Vl, gm, Wloc, mu)
            loc = loc + forms.pressure_grad_loc(Vl, Ql, gm, Ploc)
            if self.has_f:
                loc = loc + forms.body_force_loc(Vl, gm, Fq, rule_degree=6)
            return loc

        U_ext0 = fwd_V(U)
        P_ext0 = fwd_Q(Pv)
        U0loc = U_ext0[cd_V]
        Ploc0 = P_ext0[cd_Q]

        def residual(x):
            x_ext = fwd_V(x)
            xloc = x_ext[cd_V]
            loc = forms.mass_loc(Vl, gm, xloc - U0loc)
            w_ex, w_im = self.theta
            if w_ex:
                loc = loc - (dt / rho) * w_ex * rhs_weak_loc(U0loc, Ploc0)
            if w_im:
                loc = loc - (dt / rho) * w_im * rhs_weak_loc(xloc, Ploc0)
            r_ext = Vl.dof_sum(loc)
            w_tot_bnd = None
            if w_ex:
                w_tot_bnd = (dt / rho) * w_ex * boundary_terms_ext(U_ext0, P_ext0)
            if w_im:
                b = (dt / rho) * w_im * boundary_terms_ext(x_ext, P_ext0)
                w_tot_bnd = b if w_tot_bnd is None else w_tot_bnd + b
            if w_tot_bnd is not None:
                r_ext = r_ext - w_tot_bnd
            r = bwd_V(r_ext)
            return free_u * r + mask_u * (x - val_u)

        w_im = self.theta[1]
        diag = mass_diag_V + (dt / rho) * w_im * (2.0 * mu) * stiff_diag_V
        diag = free_u * diag + mask_u + (1.0 - valid_V)[:, None]
        x0 = free_u * (U if x0 is None else x0) + mask_u * val_u

        if self.lagged:
            # affine system: transport the implicit convection (volume +
            # directional do-nothing ds-term) with x0 = u^n / the BDF2
            # extrapolation; one psum-dot BiCGStab solve replaces Newton
            x0_ext = fwd_V(x0)
            T_loc = x0_ext[cd_V]

            def rhs_weak_loc_lag(Wloc, Ploc):
                loc = -rho * forms.skew_convection_lagged_loc(
                    Vl, gm, T_loc, Wloc, rule_degree=5
                )
                loc = loc - forms.sym_grad_loc(Vl, gm, Wloc, mu)
                loc = loc + forms.pressure_grad_loc(Vl, Ql, gm, Ploc)
                if self.has_f:
                    loc = loc + forms.body_force_loc(Vl, gm, Fq, rule_degree=6)
                return loc

            def residual_lag(x):
                x_ext = fwd_V(x)
                xloc = x_ext[cd_V]
                loc = forms.mass_loc(Vl, gm, xloc - U0loc)
                w_ex, w_im = self.theta
                if w_ex:
                    loc = loc - (dt / rho) * w_ex * rhs_weak_loc(U0loc, Ploc0)
                if w_im:
                    loc = loc - (dt / rho) * w_im * rhs_weak_loc_lag(xloc, Ploc0)
                r_ext = Vl.dof_sum(loc)
                w_tot_bnd = None
                if w_ex:
                    w_tot_bnd = (dt / rho) * w_ex * boundary_terms_ext(
                        U_ext0, P_ext0
                    )
                if w_im:
                    b = (dt / rho) * w_im * boundary_terms_ext(
                        x_ext, P_ext0, T_ext=x0_ext
                    )
                    w_tot_bnd = b if w_tot_bnd is None else w_tot_bnd + b
                if w_tot_bnd is not None:
                    r_ext = r_ext - w_tot_bnd
                r = bwd_V(r_ext)
                return free_u * r + mask_u * (x - val_u)

            r0 = residual_lag(x0)
            if win is not None:
                # gather-free per-device momentum matvec (halo_win.py)
                from ..attic.halo_win import halo_transport_q, halo_window_momentum

                meta, sm, wtab = self._win_meta, self._win_sm, self._win_tab
                s = (dt / rho) * w_im
                Tqw = halo_transport_q(meta, wtab, win["cells"], cd_V, x0_ext)

                def Jv(v):
                    v_ext = fwd_V(v)
                    av = halo_window_momentum(
                        meta, sm, win, v_ext, Tqw, 1.0, s * rho, s * mu,
                        interpret=self._win_interp,
                    )
                    bt = bnd_tangent_ext(v_ext, x0_ext, True)
                    if bt is not None:
                        av = av - s * bt
                    r = bwd_V(av)
                    return free_u * r + mask_u * v
            else:
                _, Jv = jax.linearize(residual_lag, x0)
            dx, _ = krylov.bicgstab(
                Jv, -r0, M=lambda t: t / diag,
                rtol=self.linear_rtol, atol=0.05 * self.newton_tol,
                maxiter=300, dot=dot,
            )
            Ui = x0 + dx
        else:

            def newton_body(state):
                x, rnorm, k = state
                if win is not None:
                    # window-kernel Newton tangent (reaction term in-kernel)
                    from ..attic.halo_win import halo_state_q, halo_window_momentum

                    meta, sm = self._win_meta, self._win_sm
                    wtab = self._win_tab
                    s = (dt / rho) * w_im
                    r = residual(x)
                    x_ext = fwd_V(x)
                    Tqw, Uqw, Guw = halo_state_q(
                        meta, wtab, win["cells"], cd_V, G, x_ext
                    )

                    def Jv(v):
                        v_ext = fwd_V(v)
                        av = halo_window_momentum(
                            meta, sm, win, v_ext, Tqw, 1.0, s * rho, s * mu,
                            Uq=Uqw, Gu=Guw, interpret=self._win_interp,
                        )
                        bt = bnd_tangent_ext(v_ext, x_ext, False)
                        if bt is not None:
                            av = av - s * bt
                        rr = bwd_V(av)
                        return free_u * rr + mask_u * v
                else:
                    r, Jv = jax.linearize(residual, x)
                dx, _ = krylov.bicgstab(
                    Jv, -r, M=lambda t: t / diag,
                    rtol=self.linear_rtol, atol=0.05 * self.newton_tol,
                    maxiter=300,
                    dot=dot,  # psum inner products: SPMD-identical decisions
                )
                x = x + dx
                rn = residual(x)
                return (x, jnp.sqrt(dot(rn, rn)), k + 1)

            def newton_cond(state):
                _, rnorm, k = state
                return jnp.logical_and(
                    rnorm > self.newton_tol, k < self.newton_maxiter
                )

            r0 = residual(x0)
            Ui, _, _ = jax.lax.while_loop(
                newton_cond, newton_body,
                (x0, jnp.sqrt(dot(r0, r0)), jnp.array(0)),
            )

        # ---- pressure Poisson ----------------------------------------------
        def K_own(p):
            p_ext = fwd_Q(p)
            return bwd_Q(assembly.stiffness_apply(Ql, gm, p_ext))

        Ui_ext = fwd_V(Ui)
        L2_ext = -(rho / dt) * forms.div_rhs(Vl, Ql, gm, Ui_ext)
        if self.rotational:
            L2_ext = L2_ext - mu * forms.grad_div_ustar_rhs(Vl, Ql, gm, Ui_ext)
        incr = self.increment_form
        L2 = bwd_Q(L2_ext) if incr else bwd_Q(L2_ext) + K_own(Pv)

        diag_Q = jnp.where(stiff_diag_Q > 0, stiff_diag_Q, 1.0)
        diag_Q = diag_Q + (1.0 - valid_Q)
        if not self.has_p_bcs:
            nglobal = psum(jnp.sum(valid_Q))

            def proj(x):
                return (x - psum(jnp.sum(x * valid_Q)) / nglobal) * valid_Q

            M = (
                self._mg_precond(K_own, diag_Q, valid_Q, proj)
                if self._mg is not None
                else None
            )
            P1, piters = _dist_cg(
                K_own, proj(L2), diag_Q, dot, self.pressure_rtol, 1000, proj,
                M=M,
            )
        else:
            free_p = (1.0 - mask_p) * valid_Q

            def K_bc(p):
                return free_p * K_own(free_p * p) + mask_p * p

            pin = mask_p * (val_p - Pv) if incr else mask_p * val_p
            rhs = free_p * (L2 - K_own(pin)) + pin
            dq = free_p * diag_Q + mask_p + (1.0 - valid_Q)
            M = (
                self._mg_precond(K_bc, dq, valid_Q, None)
                if self._mg is not None
                else None
            )
            P1, piters = _dist_cg(
                K_bc, rhs, dq, dot, self.pressure_rtol, 1000, None, M=M
            )
        if incr:
            P1 = Pv + P1

        # ---- velocity correction ---------------------------------------------
        P1_ext = fwd_Q(P1)
        phi_ext = P1_ext - P_ext0
        div_part = None
        if self.rotational:
            div_part = mu * forms.grad_div_ustar(Vl, gm, Ui_ext)
        gphi_ext = (dt / rho) * forms.grad_phi_rhs(
            Vl, Ql, gm, phi_ext, div_part=div_part, rule_degree=4
        )

        def M_bc(u):
            u_ext = fwd_V(free_u * u)
            y = bwd_V(assembly.mass_apply(Vl, gm, u_ext))
            return free_u * y + mask_u * u

        dm = free_u * mass_diag_V + mask_u + (1.0 - valid_V)[:, None]
        if incr:
            # solve for d = u1 - u*: M d = -(dt/rho) grad(phi); stopping is
            # increment-relative (same rationale as the pressure solve)
            L3 = bwd_V(-gphi_ext)
            dmask = mask_u * (val_u - Ui)
            dmask_ext = fwd_V(dmask)
            rhs_u = (
                free_u * (L3 - bwd_V(assembly.mass_apply(Vl, gm, dmask_ext)))
                + dmask
            )
            d, citers = _dist_cg(
                M_bc, rhs_u, dm, dot, self.correction_rtol, 500, None
            )
            U1 = Ui + d
        else:
            L3 = bwd_V(assembly.mass_apply(Vl, gm, Ui_ext) - gphi_ext)
            gval_ext = fwd_V(mask_u * val_u)
            rhs_u = (
                free_u * (L3 - bwd_V(assembly.mass_apply(Vl, gm, gval_ext)))
                + mask_u * val_u
            )
            U1, citers = _dist_cg(
                M_bc, rhs_u, dm, dot, self.correction_rtol, 500, None
            )
        return U1, P1, {"pressure_iters": piters, "correction_iters": citers}


def _dist_cg(A, b, diag, dot, rtol, maxiter, proj, M=None):
    """Distributed PCG: operator A does its own halo exchange; `dot` psums.
    M (optional) replaces Jacobi as the preconditioner (e.g. the distributed
    multigrid V-cycle); it must be SPD and do its own exchanges.
    Returns (x, iters)."""
    if proj is None:
        proj = lambda x: x
    if M is None:
        M = lambda r: r / diag
    b = proj(b)
    x = jnp.zeros_like(b)
    r = b
    z = proj(M(r))
    p = z
    rz = dot(r, z)
    target = rtol * jnp.sqrt(dot(b, b))

    def cond(s):
        x, r, z, p, rz, rn, k = s
        return jnp.logical_and(rn > target, k < maxiter)

    def body(s):
        x, r, z, p, rz, rn, k = s
        Ap = proj(A(p))
        pAp = dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = proj(M(r))
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, jnp.sqrt(dot(r, r)), k + 1)

    rn0 = jnp.sqrt(dot(r, r))
    x, r, z, p, rz, rn, k = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, rn0, jnp.array(0))
    )
    return x, k
