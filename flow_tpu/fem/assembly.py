# Assembly primitives: the TPU-native replacement for DOLFIN's C++ assembly
# loop + FFC-generated element kernels (SURVEY.md §2.2 rows 1-2).
#
# Design (idiomatic XLA rather than a translated assembly loop):
#   * per-element geometry is two tiny tensors: detJ [nc] and G = J^{-T}
#     [nc,2,2], computed once per mesh;
#   * bilinear forms with constant coefficients use *exact* factored reference
#     tensors (e.g. stiffness: out = einsum over C[e]=detJ*G^T G and a static
#     [2,2,nl,nl] reference tensor) — no quadrature loop, no stored element
#     matrices, MXU-friendly batched contractions;
#   * forms with varying coefficients (convection, SUPG, sources) evaluate at
#     quadrature points via einsum chains that XLA fuses;
#   * global "scatter" is the gather-based FunctionSpace.dof_sum — scatter-free.
#
# Everything here takes and returns plain jnp arrays and is jit-traceable.
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from . import elements, quadrature
from .spaces import FunctionSpace

# quadrature degree for the trilinear convection terms (the scheme layer
# re-exports this; the window kernels must tabulate at the same rule so
# their tangents match the einsum residual's linearization)
CONV_RULE = 5

__all__ = [
    "CONV_RULE",
    "Geometry",
    "geometry",
    "Tab",
    "tabulation",
    "ref_mass",
    "ref_stiffness",
    "values_at_qp",
    "grads_at_qp",
    "integrate_rhs",
    "mass_apply",
    "stiffness_apply",
    "mass_diag",
    "stiffness_diag",
    "mass_local",
    "stiffness_local",
    "BoundaryTab",
    "boundary_tabulation",
    "integral",
    "lumped_mass_diag",
]


class Geometry:
    """Per-element affine geometry: detJ [nc], G = J^{-T} [nc,dim,dim].

    grad_phys[d] = G[d,k] grad_ref[k];  C = detJ * G^T G is the exact
    stiffness geometric factor. Works for 2-D triangles and 3-D tets."""

    def __init__(self, mesh):
        # one-time per-mesh setup: keep it off the (remote-compiling) TPU
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(mesh)

    def _build(self, mesh):
        p = mesh.points
        c = mesh.cells
        dim = getattr(mesh, "dim", 2)
        self.dim = dim
        # edge vectors J columns: dvec[:, :, k] = p_{k+1} - p_0
        dvecs = jnp.stack(
            [p[c[:, k + 1]] - p[c[:, 0]] for k in range(dim)], axis=-1
        )  # [nc, dim(space), dim(ref)]
        if dim == 2:
            d0 = dvecs[:, :, 0]
            d1 = dvecs[:, :, 1]
            detJ = d0[:, 0] * d1[:, 1] - d0[:, 1] * d1[:, 0]  # > 0 (CCW)
            inv = jnp.stack(
                [
                    jnp.stack([d1[:, 1], -d0[:, 1]], axis=-1),
                    jnp.stack([-d1[:, 0], d0[:, 0]], axis=-1),
                ],
                axis=-2,
            ) / detJ[:, None, None]
        else:
            d0 = dvecs[:, :, 0]
            d1 = dvecs[:, :, 1]
            d2 = dvecs[:, :, 2]
            c0 = jnp.cross(d1, d2)
            c1 = jnp.cross(d2, d0)
            c2 = jnp.cross(d0, d1)
            detJ = jnp.einsum("ed,ed->e", d0, c0)
            # J^{-T} columns are the cross products / det
            inv = jnp.stack([c0, c1, c2], axis=-1) / detJ[:, None, None]
        self.detJ = detJ
        self.G = inv  # grad_phys[d] = G[d,k] grad_ref[k]
        self.C = jnp.einsum("edk,edl->ekl", inv, inv) * detJ[:, None, None]
        self.cell_x0 = p[c[:, 0]]
        self.dvecs = dvecs
        # 2-D compatibility aliases
        if dim == 2:
            self.cell_d0 = dvecs[:, :, 0]
            self.cell_d1 = dvecs[:, :, 1]

    def physical_points(self, ref_pts):
        """Map reference points [nq,dim] to physical [nc,nq,dim]."""
        r = jnp.asarray(ref_pts, dtype=self.cell_x0.dtype)
        return self.cell_x0[:, None, :] + jnp.einsum(
            "qk,edk->eqd", r, self.dvecs
        )


def geometry(mesh) -> Geometry:
    # cached on the mesh itself (id()-keyed dicts break after GC reuses ids)
    if not hasattr(mesh, "_geom_cache"):
        mesh._geom_cache = Geometry(mesh)
    return mesh._geom_cache


class Tab:
    """Static tabulation of a basis at a quadrature rule.

    Stored as host numpy arrays: they are compile-time constants, and numpy
    storage makes the cache safe to build/reuse inside any jit trace (device
    arrays created under a trace would leak tracers)."""

    def __init__(self, degree, rule_degree, dtype, dim=2):
        pts, w = quadrature.simplex_rule(rule_degree, dim)
        phi, dphi = elements.tabulate(degree, pts, dim=dim)
        npdt = np.dtype(dtype)
        self.ref_pts = pts
        self.w = np.asarray(w, dtype=npdt)
        self.phi = np.asarray(phi, dtype=npdt)
        self.dphi = np.asarray(dphi, dtype=npdt)
        self.hess = np.asarray(elements.hessian_ref(degree, dim), dtype=npdt)
        self.nq = len(w)
        self.nl = phi.shape[1]


@lru_cache(maxsize=None)
def _tab_cached(degree, rule_degree, dtype_name, dim):
    return Tab(degree, rule_degree, jnp.dtype(dtype_name), dim=dim)


def _dim(space):
    return getattr(space.mesh, "dim", 2)


def tabulation(space: FunctionSpace, rule_degree) -> Tab:
    return _tab_cached(
        space.degree, rule_degree, jnp.dtype(space.mesh.dtype).name, _dim(space)
    )


# ---------------------------------------------------------------------------
# Exact reference tensors (small numpy, computed once)
# ---------------------------------------------------------------------------
@lru_cache(maxsize=None)
def ref_mass(degree, dim=2):
    """Mref[i,j] = int_ref phi_i phi_j (exact)."""
    pts, w = quadrature.simplex_rule(2 * degree, dim)
    phi, _ = elements.tabulate(degree, pts, dim=dim)
    return np.einsum("q,qi,qj->ij", w, phi, phi)


@lru_cache(maxsize=None)
def ref_stiffness(degree, dim=2):
    """Kref[k,l,i,j] = int_ref d_k phi_i d_l phi_j (exact)."""
    pts, w = quadrature.simplex_rule(max(1, 2 * (degree - 1)), dim)
    _, dphi = elements.tabulate(degree, pts, dim=dim)
    return np.einsum("q,qik,qjl->klij", w, dphi, dphi)


@lru_cache(maxsize=None)
def ref_mixed(deg_test, deg_trial, dim=2):
    """Bref[k,i,j] = int_ref phi^test_i d_k phi^trial_j (exact).

    Used for div/grad coupling between velocity (P2) and pressure (P1)."""
    pts, w = quadrature.simplex_rule(deg_test + deg_trial, dim)
    phi_t, _ = elements.tabulate(deg_test, pts, dim=dim)
    _, dphi_u = elements.tabulate(deg_trial, pts, dim=dim)
    return np.einsum("q,qi,qjk->kij", w, phi_t, dphi_u)


# ---------------------------------------------------------------------------
# Quadrature-point evaluation
# ---------------------------------------------------------------------------
def values_at_qp(tab: Tab, Uloc):
    """Uloc [nc,nl(,m)] -> values at qp [nc,nq(,m)]."""
    if Uloc.ndim == 2:
        return jnp.einsum("ql,el->eq", tab.phi, Uloc)
    return jnp.einsum("ql,elm->eqm", tab.phi, Uloc)


def grads_at_qp(tab: Tab, geom: Geometry, Uloc):
    """Uloc [nc,nl(,m)] -> physical gradients [nc,nq(,m),2]."""
    if Uloc.ndim == 2:
        return jnp.einsum("qlk,edk,el->eqd", tab.dphi, geom.G, Uloc)
    return jnp.einsum("qlk,edk,elm->eqmd", tab.dphi, geom.G, Uloc)


def integrate_rhs(space, tab: Tab, geom: Geometry, val=None, grad=None):
    """Assemble sum_e int_e (val . phi_i + grad : grad(phi_i)) into [n_dofs(,m)].

    val: [nc,nq(,m)] multiplies the test function value;
    grad: [nc,nq(,m),2] contracts with the test function gradient.
    """
    wd = tab.w[None, :] * geom.detJ[:, None]  # [nc, nq]
    loc = None
    if val is not None:
        if val.ndim == 2:
            loc = jnp.einsum("eq,qi->ei", wd * val, tab.phi)
        else:
            loc = jnp.einsum("eqm,eq,qi->eim", val, wd, tab.phi)
    if grad is not None:
        if grad.ndim == 3:
            g = jnp.einsum("eqd,eq,qik,edk->ei", grad, wd, tab.dphi, geom.G)
        else:
            g = jnp.einsum("eqmd,eq,qik,edk->eim", grad, wd, tab.dphi, geom.G)
        loc = g if loc is None else loc + g
    return space.dof_sum(loc)


# ---------------------------------------------------------------------------
# Exact constant-coefficient operators (matrix-free applies + diagonals)
# ---------------------------------------------------------------------------
def mass_apply(space: FunctionSpace, geom: Geometry, U, coeff=None):
    """y = M U with M_ij = int c phi_i phi_j (c constant or per-cell [nc])."""
    Mref = jnp.asarray(ref_mass(space.degree, _dim(space)), dtype=U.dtype)
    Uloc = space.gather(U)
    scale = geom.detJ if coeff is None else geom.detJ * coeff
    if U.ndim == 1:
        loc = jnp.einsum("ij,ej,e->ei", Mref, Uloc, scale)
    else:
        loc = jnp.einsum("ij,ejm,e->eim", Mref, Uloc, scale)
    return space.dof_sum(loc)


def stiffness_apply(space: FunctionSpace, geom: Geometry, U, coeff=None):
    """y = K U with K_ij = int c grad(phi_i).grad(phi_j)."""
    Kref = jnp.asarray(ref_stiffness(space.degree, _dim(space)), dtype=U.dtype)
    Uloc = space.gather(U)
    C = geom.C if coeff is None else geom.C * coeff[:, None, None]
    if U.ndim == 1:
        loc = jnp.einsum("ekl,klij,ej->ei", C, Kref, Uloc)
    else:
        loc = jnp.einsum("ekl,klij,ejm->eim", C, Kref, Uloc)
    return space.dof_sum(loc)


def mass_diag(space, geom, coeff=None):
    Mref = jnp.asarray(np.diag(ref_mass(space.degree, _dim(space))), dtype=geom.detJ.dtype)
    scale = geom.detJ if coeff is None else geom.detJ * coeff
    loc = Mref[None, :] * scale[:, None]
    return space.dof_sum(loc)


def stiffness_diag(space, geom, coeff=None):
    Kd = np.einsum("klii->kli", ref_stiffness(space.degree, _dim(space)))
    Kd = jnp.asarray(Kd, dtype=geom.detJ.dtype)
    C = geom.C if coeff is None else geom.C * coeff[:, None, None]
    loc = jnp.einsum("ekl,kli->ei", C, Kd)
    return space.dof_sum(loc)


def lumped_mass_diag(space, geom):
    """Vertex-quadrature ('lumped') mass diagonal.

    For P2 this matches the reference's vertex-rule mass matrix
    (/root/reference/flow/heat.py:39-45): rows/cols of edge-midpoint dofs are
    zero — an intentionally singular M-matrix-friendly lumping.
    """
    pts, w = quadrature.simplex_rule(quadrature.VERTEX, _dim(space))
    phi, _ = elements.tabulate(space.degree, pts, dim=_dim(space))
    d = np.einsum("q,qi,qi->i", w, phi, phi)
    loc = jnp.asarray(d, dtype=geom.detJ.dtype)[None, :] * geom.detJ[:, None]
    return space.dof_sum(loc)


def mass_local(space, geom, coeff=None):
    """Explicit element mass matrices [nc, nl, nl] (for small direct solves)."""
    Mref = jnp.asarray(ref_mass(space.degree, _dim(space)), dtype=geom.detJ.dtype)
    scale = geom.detJ if coeff is None else geom.detJ * coeff
    return Mref[None] * scale[:, None, None]


def stiffness_local(space, geom, coeff=None):
    Kref = jnp.asarray(ref_stiffness(space.degree, _dim(space)), dtype=geom.detJ.dtype)
    C = geom.C if coeff is None else geom.C * coeff[:, None, None]
    return jnp.einsum("ekl,klij->eij", C, Kref)


def integral(space: FunctionSpace, geom: Geometry, U, rule_degree=None):
    """int_Omega u dx for a scalar FE function (dolfin assemble(u*dx))."""
    tab = tabulation(space, rule_degree or 2 * space.degree)
    vals = values_at_qp(tab, space.gather(U))
    return jnp.einsum("eq,q,e->", vals, tab.w, geom.detJ)


# ---------------------------------------------------------------------------
# Boundary (facet) tabulation — for ds-integrals
# ---------------------------------------------------------------------------
class BoundaryTab:
    """Tabulation of the basis on each local edge at 1-D Gauss points.

    Provides, for all boundary facets at once:
      phi  [nb, nq1, nl]   basis values at facet quadrature points
      dphi [nb, nq1, nl, 2] reference gradients there
      wl   [nb, nq1]       quadrature weight * facet length
    (facet data gathered per boundary facet from the static per-local-edge
    tabulations — everything stays fixed-shape).
    """

    def __init__(self, space: FunctionSpace, rule_degree=4):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(space, rule_degree)

    def _build(self, space: FunctionSpace, rule_degree):
        mesh = space.mesh
        dtype = mesh.dtype
        s, w1 = quadrature.edge_rule(rule_degree)
        nq1 = len(s)
        # reference coords of edge k at parameter s: v_{k+1}(1-s) + v_{k+2}s
        ref_v = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        phi_k = np.empty((3, nq1, space.n_local))
        dphi_k = np.empty((3, nq1, space.n_local, 2))
        pts_k = np.empty((3, nq1, 2))
        for k in range(3):
            a, b = (k + 1) % 3, (k + 2) % 3
            pts = ref_v[a][None] * (1 - s)[:, None] + ref_v[b][None] * s[:, None]
            pts_k[k] = pts
            phi_k[k], dphi_k[k] = elements.tabulate(space.degree, pts)

        loc = mesh.boundary_local_np
        self.phi = jnp.asarray(phi_k[loc], dtype=dtype)  # [nb,nq1,nl]
        self.dphi = jnp.asarray(dphi_k[loc], dtype=dtype)  # [nb,nq1,nl,2]
        self.ref_pts = pts_k[loc]  # np [nb,nq1,2]
        self.wl = jnp.asarray(
            w1[None, :] * mesh.boundary_lengths_np[:, None], dtype=dtype
        )
        self.cells = mesh.boundary_cells  # [nb]
        self.normals = mesh.boundary_normals  # [nb,2]
        self.cell_dofs = space.cell_dofs[self.cells]  # [nb,nl]
        self.space = space
        self.nq1 = nq1

        # physical coordinates of facet quadrature points [nb,nq1,2]
        p0 = mesh.points_np[mesh.cells_np[np.asarray(self.cells), 0]]
        d0 = (
            mesh.points_np[mesh.cells_np[np.asarray(self.cells), 1]] - p0
        )
        d1 = (
            mesh.points_np[mesh.cells_np[np.asarray(self.cells), 2]] - p0
        )
        xq = (
            p0[:, None, :]
            + self.ref_pts[:, :, 0, None] * d0[:, None, :]
            + self.ref_pts[:, :, 1, None] * d1[:, None, :]
        )
        self.x_np = xq
        self.x = jnp.asarray(xq, dtype=dtype)

    def gather(self, U):
        return U[self.cell_dofs]  # [nb,nl(,m)]

    def values(self, U):
        Uloc = self.gather(U)
        if Uloc.ndim == 2:
            return jnp.einsum("bql,bl->bq", self.phi, Uloc)
        return jnp.einsum("bql,blm->bqm", self.phi, Uloc)

    def grads(self, U, geom: Geometry):
        Uloc = self.gather(U)
        Gb = geom.G[self.cells]  # [nb,2,2]
        if Uloc.ndim == 2:
            return jnp.einsum("bqlk,bdk,bl->bqd", self.dphi, Gb, Uloc)
        return jnp.einsum("bqlk,bdk,blm->bqmd", self.dphi, Gb, Uloc)

    def integrate_rhs(self, val):
        """sum_facets int (val . phi_i) ds -> [n_dofs(,m)].

        val: [nb,nq1(,m)]."""
        if val.ndim == 2:
            loc = jnp.einsum("bq,bq,bqi->bi", val, self.wl, self.phi)
        else:
            loc = jnp.einsum("bqm,bq,bqi->bim", val, self.wl, self.phi)
        flat_dofs = self.cell_dofs.reshape(-1)
        flat = loc.reshape((-1,) + loc.shape[2:])
        out = jnp.zeros(
            (self.space.n_dofs,) + flat.shape[1:], dtype=flat.dtype
        )
        return out.at[flat_dofs].add(flat)

    def integrate_scalar(self, val):
        """sum_facets int val ds (a number). val: [nb, nq1]."""
        return jnp.einsum("bq,bq->", val, self.wl)


class BoundaryFaceTab:
    """3-D facet (triangle-face) tabulation — the tet analog of BoundaryTab,
    enabling ds-integrals on TetMesh boundaries (open-boundary 3-D NS terms,
    3-D force probes).

    Same interface as BoundaryTab: phi/dphi gathered per boundary face, wl
    (quadrature weight x 2 x face area), outward unit normals, physical
    quadrature points.
    """

    _TET_FACES = [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)]
    _REF_V = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )

    def __init__(self, space: FunctionSpace, rule_degree=4):
        from ..utils.hostsetup import setup_on_cpu

        with setup_on_cpu():
            self._build(space, rule_degree)

    def _build(self, space: FunctionSpace, rule_degree):
        mesh = space.mesh
        assert getattr(mesh, "dim", 2) == 3
        dtype = mesh.dtype
        tpts, tw = quadrature.triangle_rule(rule_degree)  # weights sum to 1/2
        nq = len(tw)

        # reference tet coords of face k at triangle barycentric points
        phi_k = np.empty((4, nq, space.n_local))
        dphi_k = np.empty((4, nq, space.n_local, 3))
        pts_k = np.empty((4, nq, 3))
        for k, (a, b, c) in enumerate(self._TET_FACES):
            lam_a = 1.0 - tpts[:, 0] - tpts[:, 1]
            pts = (
                lam_a[:, None] * self._REF_V[a]
                + tpts[:, 0:1] * self._REF_V[b]
                + tpts[:, 1:2] * self._REF_V[c]
            )
            pts_k[k] = pts
            phi_k[k], dphi_k[k] = elements.tabulate(space.degree, pts, dim=3)

        loc = mesh.boundary_local_np
        cells = mesh.boundary_cells_np
        self.phi = jnp.asarray(phi_k[loc], dtype=dtype)  # [nb,nq,nl]
        self.dphi = jnp.asarray(dphi_k[loc], dtype=dtype)  # [nb,nq,nl,3]
        self.cells = jnp.asarray(cells)
        self.cell_dofs = space.cell_dofs[self.cells]
        self.space = space
        self.nq1 = nq

        # geometry: face vertex coords, outward normal, area
        p = mesh.points_np
        f = mesh.boundary_faces_np  # sorted triples; orientation fixed below
        d1 = p[f[:, 1]] - p[f[:, 0]]
        d2 = p[f[:, 2]] - p[f[:, 0]]
        cr = np.cross(d1, d2)
        area2 = np.linalg.norm(cr, axis=1)  # = 2*area
        n = cr / area2[:, None]
        # orient outward: away from the cell centroid
        cent_cell = p[mesh.cells_np[cells]].mean(axis=1)
        cent_face = p[f].mean(axis=1)
        flip = np.einsum("bd,bd->b", n, cent_face - cent_cell) < 0
        n[flip] *= -1.0
        self.normals = jnp.asarray(n, dtype=dtype)
        self.wl = jnp.asarray(
            tw[None, :] * (2.0 * 0.5 * area2)[:, None], dtype=dtype
        )  # w_q * 2 * area  (tw sums to 1/2)

        # physical quadrature points
        x0 = p[mesh.cells_np[cells][:, 0]]
        dv = np.stack(
            [p[mesh.cells_np[cells][:, k + 1]] - x0 for k in range(3)], axis=-1
        )
        xq = x0[:, None, :] + np.einsum("bqk,bdk->bqd", pts_k[loc], dv)
        self.x_np = xq
        self.x = jnp.asarray(xq, dtype=dtype)

    def gather(self, U):
        return U[self.cell_dofs]

    def values(self, U):
        Uloc = self.gather(U)
        if Uloc.ndim == 2:
            return jnp.einsum("bql,bl->bq", self.phi, Uloc)
        return jnp.einsum("bql,blm->bqm", self.phi, Uloc)

    def grads(self, U, geom: Geometry):
        Uloc = self.gather(U)
        Gb = geom.G[self.cells]
        if Uloc.ndim == 2:
            return jnp.einsum("bqlk,bdk,bl->bqd", self.dphi, Gb, Uloc)
        return jnp.einsum("bqlk,bdk,blm->bqmd", self.dphi, Gb, Uloc)

    def integrate_rhs(self, val):
        if val.ndim == 2:
            locv = jnp.einsum("bq,bq,bqi->bi", val, self.wl, self.phi)
        else:
            locv = jnp.einsum("bqm,bq,bqi->bim", val, self.wl, self.phi)
        flat_dofs = self.cell_dofs.reshape(-1)
        flat = locv.reshape((-1,) + locv.shape[2:])
        out = jnp.zeros((self.space.n_dofs,) + flat.shape[1:], dtype=flat.dtype)
        return out.at[flat_dofs].add(flat)

    def integrate_scalar(self, val):
        return jnp.einsum("bq,bq->", val, self.wl)
