#!/usr/bin/env python
# Semi-discrete linear-stability eigensolver for the Schafer-Turek base flow
# — the spatial-vs-temporal bisection for the refined-mesh shedding
# suppression (VERDICT r02 item 1; BENCH_NOTES stage-2 / stability-probe
# sections).
#
# The nonlinear BDF2+projection probe (scripts/stability_probe.py) measures
# the stability of the TIME-DISCRETE map. This script assembles the exact
# SEMI-DISCRETE linearization about the same base flow as scipy sparse
# matrices and computes the rightmost eigenvalues of the constrained pencil
#
#     lambda [M 0; 0 0] [u'; p'] = [A_u  G; D  0] [u'; p']
#
# with A_u = (1/rho) d/du [ -rho c_skew(u;u,v) - 2 mu (eps(u),eps(v))
#                           + mu ((grad u)^T n, v)_ds - rho/2 ((u.n)+ u, v)_ds ],
# G the full pressure coupling (volume p div v  minus the (p n, v)_ds term),
# D the divergence constraint (= transpose of the volume p-div-v block), all
# matching flow_tpu/navier_stokes/pressure_correction.py's _residual exactly
# (verified here against jax.linearize to ~1e-12 before solving).
#
# If the semi-discrete spectrum is UNSTABLE (Re lambda > 0, physical) while
# the BDF2-projection probe decays, the defect is in the time splitting; if
# it is stable, the defect is spatial — and the in-matrix term ablations
# (--ablate) then isolate which term, with no re-settling cost.
#
# Also provides --polish: monolithic steady Newton (bordered sparse LU) that
# sharpens the BE-settled base onto the exact discrete steady branch.
#
# CPU f64. Usage:
#   python scripts/eig_probe.py <refine> [--base FILE] [--polish]
#       [--ablate none|stress|dn|bothds] [--shift RE,IM] [--save FILE]
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from flow_tpu.fem import assembly, forms
from flow_tpu.fem.bc import combine_bcs
from flow_tpu.models import karman
from flow_tpu.navier_stokes.pressure_correction import _get_ctx, CONV_RULE


def build_problem(refine, snap=True):
    prob = karman.schafer_turek_problem(
        lcar=0.03, n_refine=refine, dtype=np.float64, snap=snap
    )
    print(
        f"refine={refine} cells={prob.mesh.n_cells} "
        f"dofs={2 * prob.V.n_dofs + prob.Q.n_dofs} Re={prob.reynolds:.1f}",
        flush=True,
    )
    return prob


class Blocks:
    """Exact sparse blocks of the linearization about (U0, P0)."""

    def __init__(self, prob, U0, ablate="none"):
        V, Q = prob.V, prob.Q
        ctx = _get_ctx(V, Q)
        self.ctx = ctx
        self.rho, self.mu = float(prob.rho), float(prob.mu)
        rho, mu = self.rho, self.mu
        geom = ctx.geom
        nV, nQ = V.n_dofs, Q.n_dofs
        self.nV, self.nQ = nV, nQ
        nu = 2 * nV
        cd = np.asarray(V.cell_dofs_np, dtype=np.int64)
        cdQ = np.asarray(Q.cell_dofs_np, dtype=np.int64)
        nc, nl = cd.shape
        nlq = cdQ.shape[1]
        detJ = np.asarray(geom.detJ, dtype=np.float64)
        G = np.asarray(geom.G, dtype=np.float64)
        C = np.asarray(geom.C, dtype=np.float64)
        Mref = assembly.ref_mass(V.degree, 2)
        Kref = assembly.ref_stiffness(V.degree, 2)

        t0 = time.time()

        # --- volume element blocks -------------------------------------
        Mel = Mref[None, :, :] * detJ[:, None, None]  # [e,i,j] (delta_ab)
        K1 = np.einsum("ekl,klij->eij", C, Kref)  # delta_ab part
        K2 = np.einsum("e,eak,ebl,klji->eijab", detJ, G, G, Kref)
        Uloc = np.asarray(U0)[cd]  # [e,nl,2]
        Cjac = np.asarray(
            forms.conv_jacobian_loc(
                V, geom, jnp.asarray(Uloc), rule_degree=CONV_RULE
            )
        )  # [e,i,j,a,b]

        # pressure coupling (volume): Gv[e,i,a,m] = int p_m d_a phi_i
        Bref = assembly.ref_mixed(Q.degree, V.degree, 2)  # [k,m,i]
        Gv = np.einsum("e,eak,kmi->eiam", detJ, G, Bref)

        # --- scatter volume blocks -------------------------------------
        def scat_scalar(el):
            # el [e,i,j] acting identically on both components
            r = (2 * cd[:, :, None] + np.arange(2)[None, None, :])  # [e,i,a]
            rows = np.repeat(r[:, :, None, :], nl, axis=2)  # [e,i,j,a]
            c = (2 * cd[:, None, :, None] + np.arange(2)[None, None, None, :])
            cols = np.broadcast_to(c[:, None, :, 0, :], rows.shape)
            # cols[e,i,j,a] = 2*cd[e,j] + a
            cols = 2 * cd[:, None, :, None] + np.arange(2)[None, None, None, :]
            cols = np.broadcast_to(cols, rows.shape)
            v = np.repeat(el[:, :, :, None], 2, axis=3)
            return rows.ravel(), cols.ravel(), v.ravel()

        def scat_full(el):
            # el [e,i,j,a,b]
            rows = 2 * cd[:, :, None, None, None] + np.arange(2)[
                None, None, None, :, None
            ]
            cols = 2 * cd[:, None, :, None, None] + np.arange(2)[
                None, None, None, None, :
            ]
            rows = np.broadcast_to(rows, el.shape)
            cols = np.broadcast_to(cols, el.shape)
            return rows.ravel(), cols.ravel(), el.ravel()

        def coo(nrows, ncols, parts):
            rows = np.concatenate([p[0] for p in parts])
            cols = np.concatenate([p[1] for p in parts])
            vals = np.concatenate([p[2] for p in parts])
            return sp.coo_matrix(
                (vals, (rows, cols)), shape=(nrows, ncols)
            ).tocsr()

        self.M = coo(nu, nu, [scat_scalar(Mel)])

        # A_u = d F_u / d u, F_u = (1/rho)(rhs_weak + bnd)
        au_parts = [
            scat_full(-Cjac),
            scat_scalar(-(mu / rho) * K1),
            scat_full(-(mu / rho) * K2),
        ]

        # pressure coupling: volume part
        rowsG = 2 * cd[:, :, None, None] + np.arange(2)[None, None, :, None]
        rowsG = np.broadcast_to(rowsG, Gv.shape)
        colsG = np.broadcast_to(cdQ[:, None, None, :], Gv.shape)
        g_parts = [(rowsG.ravel(), colsG.ravel(), (1.0 / rho) * Gv.ravel())]
        # D (constraint) = transpose of the VOLUME p-div-v block, unscaled
        self.D = coo(
            nQ, nu, [(colsG.ravel(), rowsG.ravel(), Gv.ravel())]
        )

        # --- boundary (ds) blocks --------------------------------------
        bt, btQ = ctx.btab, ctx.btabQ
        phi = np.asarray(bt.phi, dtype=np.float64)  # [f,q,nl]
        dphi = np.asarray(bt.dphi, dtype=np.float64)  # [f,q,nl,2]
        wl = np.asarray(bt.wl, dtype=np.float64)  # [f,q]
        nrm = np.asarray(bt.normals, dtype=np.float64)  # [f,2]
        cells = np.asarray(bt.cells)
        cdb = np.asarray(bt.cell_dofs, dtype=np.int64)  # [f,nl]
        Gb = G[cells]  # [f,2,2]
        phiQ = np.asarray(btQ.phi, dtype=np.float64)  # [f,q,nlq]
        cdbQ = np.asarray(btQ.cell_dofs, dtype=np.int64)  # [f,nlq]

        ds_stress = ctx._ds_stress and ablate not in ("stress", "bothds")
        ds_dn = ctx._ds_dn and ablate not in ("dn", "bothds")

        def scat_bnd_full(el):
            rows = 2 * cdb[:, :, None, None, None] + np.arange(2)[
                None, None, None, :, None
            ]
            cols = 2 * cdb[:, None, :, None, None] + np.arange(2)[
                None, None, None, None, :
            ]
            rows = np.broadcast_to(rows, el.shape)
            cols = np.broadcast_to(cols, el.shape)
            return rows.ravel(), cols.ravel(), el.ravel()

        if ds_stress:
            # (1/rho) * mu * sum_q wl phi_i n_b (dphi[q,j,k] Gb[a,k])
            gb = np.einsum("fqjk,fak->fqja", dphi, Gb)
            el = (mu / rho) * np.einsum(
                "fq,fqi,fqja,fb->fijab", wl, phi, gb, nrm
            )
            au_parts.append(scat_bnd_full(el))

        if ds_dn:
            # -(1/2) d/du [ (u.n)+ u ]: at the base, wn>0 on the outlet
            Ub = np.asarray(U0)[cdb]  # [f,nl,2]
            wb = np.einsum("fql,flm->fqm", phi, Ub)  # [f,q,2]
            wn = np.einsum("fqm,fm->fq", wb, nrm)
            pos = wn > 0.0
            wnp = np.where(pos, wn, 0.0)
            t1 = np.einsum("fq,fqi,fq,fqj->fij", wl, phi, wnp, phi)
            el = 0.5 * (-1.0) * t1[:, :, :, None, None] * np.eye(2)
            t2 = np.einsum(
                "fq,fqi,fqa,fqj,fb->fijab",
                wl, phi, wb * pos[:, :, None], phi, nrm,
            )
            el = el - 0.5 * t2
            au_parts.append(scat_bnd_full(el))

        # pressure boundary term: -(p n, v)_ds (always on)
        elp = -np.einsum("fq,fqi,fqm,fa->fiam", wl, phi, phiQ, nrm)
        rowsP = 2 * cdb[:, :, None, None] + np.arange(2)[None, None, :, None]
        rowsP = np.broadcast_to(rowsP, elp.shape)
        colsP = np.broadcast_to(cdbQ[:, None, None, :], elp.shape)
        g_parts.append((rowsP.ravel(), colsP.ravel(), (1.0 / rho) * elp.ravel()))

        self.A_u = coo(nu, nu, au_parts)
        self.Gp = coo(nu, nQ, g_parts)

        mask_u, val_u = combine_bcs(V, prob.u_bcs)
        self.mask_flat = np.asarray(mask_u, dtype=np.float64).reshape(-1)
        self.free = np.where(self.mask_flat == 0.0)[0]
        self.val_flat = np.asarray(val_u, dtype=np.float64).reshape(-1)
        print(
            f"  assembled: A_u nnz={self.A_u.nnz} G nnz={self.Gp.nnz} "
            f"D nnz={self.D.nnz} free u-dofs={len(self.free)}/{nu} "
            f"[{time.time() - t0:.1f}s]",
            flush=True,
        )

    def residual_F(self, U0, P0):
        """F = (1/rho)(rhs_weak + bnd) at (U0, P0) via the package residual:
        r(x=U0, dt s.t. s=1) = -(rhs+bnd) -> F = -r/rho ... with s=dt/rho=1."""
        ctx = self.ctx
        r = ctx._residual(
            jnp.asarray(U0), jnp.asarray(U0), None, None, jnp.asarray(P0),
            self.rho, self.mu, self.rho, (0.0, 1.0),
        )
        return -np.asarray(r).reshape(-1) / self.rho


def verify_against_linearize(bl, prob, U0, P0):
    """Check the assembled Jacobian against jax.linearize of the package
    residual (both u- and p-tangents), unmasked."""
    ctx = bl.ctx
    rho, mu = bl.rho, bl.mu
    dt = 0.37 * rho  # arbitrary; s = 0.37
    s = dt / rho

    def res_u(x):
        return ctx._residual(
            x, jnp.asarray(U0), None, None, jnp.asarray(P0), rho, mu, dt,
            (0.0, 1.0),
        )

    def res_p(p):
        return ctx._residual(
            jnp.asarray(U0), jnp.asarray(U0), None, None, p, rho, mu, dt,
            (0.0, 1.0),
        )

    _, jvp_u = jax.linearize(res_u, jnp.asarray(U0))
    _, jvp_p = jax.linearize(res_p, jnp.asarray(P0))
    rng = np.random.default_rng(0)
    J_res = bl.M - (s * rho) * bl.A_u  # d r/d x
    Gp_res = -(s * rho) * bl.Gp  # d r/d P
    for k in range(3):
        t = rng.standard_normal(U0.shape)
        a = np.asarray(jvp_u(jnp.asarray(t))).reshape(-1)
        b = J_res @ t.reshape(-1)
        eu = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-300)
        tp = rng.standard_normal(P0.shape)
        ap = np.asarray(jvp_p(jnp.asarray(tp))).reshape(-1)
        bp = Gp_res @ tp
        ep = np.linalg.norm(ap - bp) / max(np.linalg.norm(ap), 1e-300)
        print(f"  verify[{k}]: |J_u t - lin|/|lin| = {eu:.3e}  p: {ep:.3e}",
              flush=True)
        assert eu < 1e-10 and ep < 1e-10, "assembled Jacobian mismatch"


def polish_newton(bl, prob, U0, P0, n_iter=25, tol=1e-11):
    """Monolithic steady Newton: sharpen the settled base onto the exact
    discrete steady branch (bordered sparse LU)."""
    nu, nQ = 2 * bl.nV, bl.nQ
    free = bl.free
    U, P = np.asarray(U0, dtype=np.float64), np.asarray(P0, dtype=np.float64)
    # enforce Dirichlet exactly
    Uf = U.reshape(-1)
    Uf = (1.0 - bl.mask_flat) * Uf + bl.mask_flat * bl.val_flat
    U = Uf.reshape(U.shape)
    # the residual needs only ctx._residual + the constant D — no Jacobian
    # assembly; Blocks is rebuilt once per ACCEPTED iterate (for the
    # Jacobian), not per line-search trial
    def res_norm(U, P):
        F = bl.residual_F(U, P)
        Rq = bl.D @ U.reshape(-1)
        return F, Rq, np.linalg.norm(F[free]) + np.linalg.norm(Rq)

    blk = bl
    F, Rq, rn = res_norm(U, P)
    for it in range(n_iter):
        print(f"  newton[{it}]: |F|={np.linalg.norm(F[free]):.3e} "
              f"|div|={np.linalg.norm(Rq):.3e}", flush=True)
        if rn < tol:
            break
        A = sp.bmat(
            [[blk.A_u[free][:, free], blk.Gp[free]],
             [blk.D[:, free], None]],
            format="csc",
        )
        rhs = -np.concatenate([F[free], Rq])
        lu = spla.splu(A)
        d = lu.solve(rhs)
        # backtracking line search on the merit |F| + |div|
        alpha = 1.0
        for _ in range(8):
            Uf = U.reshape(-1).copy()
            Uf[free] += alpha * d[:len(free)]
            Ut = Uf.reshape(U.shape)
            Pt = P + alpha * d[len(free):]
            F_t, Rq_t, rn_t = res_norm(Ut, Pt)
            if rn_t < (1.0 - 1e-4 * alpha) * rn or rn_t < tol:
                break
            alpha *= 0.5
        print(f"    alpha={alpha}", flush=True)
        U, P, F, Rq, rn = Ut, Pt, F_t, Rq_t, rn_t
        if rn >= tol:
            blk = Blocks(prob, U)
    return U, P


def eigensolve(bl, shifts, k=8):
    free = bl.free
    A = sp.bmat(
        [[bl.A_u[free][:, free], bl.Gp[free]], [bl.D[:, free], None]],
        format="csc",
    )
    n = A.shape[0]
    Mb = sp.bmat(
        [[bl.M[free][:, free], None],
         [None, sp.csr_matrix((bl.nQ, bl.nQ))]],
        format="csc",
    )
    out = []
    for s0 in shifts:
        t0 = time.time()
        try:
            w, v = spla.eigs(
                A.astype(complex), k=k, M=Mb.astype(complex), sigma=s0,
                maxiter=2000, tol=1e-9,
            )
        except Exception as e:
            print(f"  shift {s0}: FAILED ({e})", flush=True)
            continue
        order = np.argsort(-w.real)
        w = w[order]
        print(f"  shift {s0} [{time.time() - t0:.0f}s]:", flush=True)
        for lam in w:
            print(f"    lambda = {lam.real:+.5f} {lam.imag:+.5f}i", flush=True)
        out.append((s0, w, v[:, order]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("refine", type=int)
    ap.add_argument("--base", default=None)
    ap.add_argument("--polish", action="store_true")
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--ablate", default="none",
                    choices=["none", "stress", "dn", "bothds"])
    ap.add_argument("--shift", default="0.5,20.7")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    prob = build_problem(args.refine)
    base = args.base or f"stab_base_r{args.refine}.npz"
    d = np.load(base)
    U0 = np.asarray(d["U"], dtype=np.float64)
    P0 = np.asarray(d["P"], dtype=np.float64)
    print(f"base: {base}", flush=True)

    bl = Blocks(prob, U0, ablate=args.ablate)
    if not args.no_verify and args.ablate == "none":
        verify_against_linearize(bl, prob, U0, P0)

    F = bl.residual_F(U0, P0)
    print(f"  base steady residual |F|_free = "
          f"{np.linalg.norm(F[bl.free]):.3e}  "
          f"|div U0| = {np.linalg.norm(bl.D @ U0.reshape(-1)):.3e}",
          flush=True)

    if args.polish:
        U0, P0 = polish_newton(bl, prob, U0, P0)
        np.savez(
            base.replace(".npz", "_polished.npz"), U=U0, P=P0
        )
        bl = Blocks(prob, U0, ablate=args.ablate)

    re0, im0 = (float(x) for x in args.shift.split(","))
    shifts = [re0 + 1j * im0]
    res = eigensolve(bl, shifts, k=args.k)
    if args.save and res:
        np.savez(
            args.save,
            **{f"w_{i}": w for i, (s0, w, v) in enumerate(res)},
        )
    # headline: rightmost eigenvalue across shifts
    allw = np.concatenate([w for _, w, _ in res]) if res else np.array([])
    if len(allw):
        lam = allw[np.argmax(allw.real)]
        print(f"RIGHTMOST: {lam.real:+.5f} {lam.imag:+.5f}i  "
              f"(ablate={args.ablate}, refine={args.refine})", flush=True)


if __name__ == "__main__":
    main()
