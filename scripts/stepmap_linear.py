#!/usr/bin/env python
# Exact-arithmetic linearized one-step-map analysis of the production
# projection scheme — the temporal-defect microscope for the refined-mesh
# shedding suppression (BENCH_NOTES round-3 semi-discrete section).
#
# The semi-discrete eigensolve (scripts/eig_probe.py) showed the refine-2
# base flow is STRONGLY unstable (lambda = +2.57 + 17.3i) while the
# production BDF2+projection probe decays (sigma = -2.14/s). This script
# bisects the remaining suspects by building the EXACT linearization of the
# discrete step about the base flow, with every linear system solved by
# sparse LU (no Krylov, no tolerances), and extracting its dominant
# multipliers via Arnoldi:
#
#     state  (dU^{n-1}, dU^n, dP^n)  ->  (dU^n, dU^{n+1}, dP^{n+1})
#
#   1. uhat = ((1+r)^2 U - r^2 Um1)/(1+2r), dt* = dt(1+r)/(1+2r)   [BDF2]
#   2. tentative:   (M - dt* A_u) du* = M duhat + dt* G dP         [exact]
#   3. pressure:    K dp1 = -(rho/dt*) D du* - mu Gd du* + K dP    [exact]
#   4. correction:  M du1 = M du* - (dt*/rho) Gphi(dp1-dP, du*)    [exact]
#
# using the verified sparse blocks of eig_probe.Blocks (M, A_u incl. both
# ds-term Jacobians, G incl. the pressure boundary term, D) and the
# package's own linear RHS operators (forms.div_rhs, grad_div_ustar_rhs,
# grad_phi_rhs) so every sign/scale matches flow_tpu/navier_stokes/fast.py
# by construction. A --monolithic mode solves the coupled saddle point per
# step instead of projecting (validation: its multiplier must equal the
# semi-discrete exponential exp(lambda dt) to O(dt^3)).
#
# Growth-rate conversion: sigma = log|g| / dt.  If the exact projection map
# is unstable (sigma ~ +2.5) the splitting is exonerated -> the production
# decay is SOLVER SLOP; if it decays, the splitting/scheme is guilty and
# --no-rotational/--scheme/--dt isolate which ingredient.
#
# CPU f64. Usage:
#   python scripts/stepmap_linear.py <refine> --base stab_base_r2_polished.npz
#       [--dt 2.5e-3] [--scheme bdf2|be] [--no-rotational] [--monolithic]
#       [--k 5] [--ablate none|stress|dn|bothds]
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from eig_probe import Blocks, build_problem
from flow_tpu.fem import assembly, forms
from flow_tpu.fem.bc import combine_bcs


def assemble_KQ(prob):
    """Sparse P1 pressure stiffness matching assembly.stiffness_apply."""
    Q = prob.Q
    from flow_tpu.navier_stokes.pressure_correction import _get_ctx

    ctx = _get_ctx(prob.V, Q)
    geom = ctx.geom
    cdQ = np.asarray(Q.cell_dofs_np, dtype=np.int64)
    C = np.asarray(geom.C, dtype=np.float64)
    Kref = assembly.ref_stiffness(Q.degree, 2)
    K1 = np.einsum("ekl,klij->eij", C, Kref)
    rows = np.repeat(cdQ[:, :, None], cdQ.shape[1], axis=2)
    cols = np.repeat(cdQ[:, None, :], cdQ.shape[1], axis=1)
    K = sp.coo_matrix(
        (K1.ravel(), (rows.ravel(), cols.ravel())),
        shape=(Q.n_dofs, Q.n_dofs),
    ).tocsr()
    # verify against the package apply
    rng = np.random.default_rng(3)
    x = rng.standard_normal(Q.n_dofs)
    a = np.asarray(assembly.stiffness_apply(Q, geom, jnp.asarray(x)))
    err = np.linalg.norm(a - K @ x) / np.linalg.norm(a)
    assert err < 1e-11, f"K_Q mismatch {err:.3e}"
    return K, ctx


class StepMap:
    def __init__(self, prob, bl, dt, scheme, rotational, monolithic):
        self.prob, self.bl = prob, bl
        self.dt = float(dt)
        self.scheme = scheme
        self.rotational = rotational
        self.monolithic = monolithic
        V, Q = prob.V, prob.Q
        self.rho, self.mu = bl.rho, bl.mu
        nu, nQ = 2 * bl.nV, bl.nQ
        self.nu, self.nQ = nu, nQ

        self.freeU = bl.free
        mask_p, _ = combine_bcs(Q, prob.p_bcs)
        self.mask_p = np.asarray(mask_p, dtype=np.float64)
        self.freeP = np.where(self.mask_p == 0.0)[0]

        K, ctx = assemble_KQ(prob)
        self.K = K
        geom = ctx.geom

        # verify Blocks.M against the package mass_apply
        rng = np.random.default_rng(5)
        x = rng.standard_normal((bl.nV, 2))
        a = np.asarray(assembly.mass_apply(V, geom, jnp.asarray(x))).reshape(-1)
        b = bl.M @ x.reshape(-1)
        err = np.linalg.norm(a - b) / np.linalg.norm(a)
        assert err < 1e-11, f"M mismatch {err:.3e}"

        # effective step of the BE substep
        if scheme == "bdf2":
            self.dte = self.dt * 2.0 / 3.0  # r = 1 (fixed dt)
        else:
            self.dte = self.dt
        dte = self.dte

        t0 = time.time()
        if monolithic:
            fU, fP = self.freeU, self.freeP
            A = sp.bmat(
                [
                    [
                        (bl.M - dte * bl.A_u)[fU][:, fU],
                        -dte * bl.Gp[fU][:, fP],
                    ],
                    [bl.D[fP][:, fU], None],
                ],
                format="csc",
            )
            self.lu_mono = spla.splu(A)
        else:
            Jm = (bl.M - dte * bl.A_u)[self.freeU][:, self.freeU].tocsc()
            self.lu_mom = spla.splu(Jm)
            self.lu_K = spla.splu(K[self.freeP][:, self.freeP].tocsc())
            self.lu_M = spla.splu(
                bl.M[self.freeU][:, self.freeU].tocsc()
            )
        print(f"  factorizations [{time.time() - t0:.1f}s]", flush=True)

        # package linear RHS operators (jitted once)
        mu = self.mu

        @jax.jit
        def _div_rhs(du):
            return forms.div_rhs(V, Q, geom, du.reshape(bl.nV, 2))

        @jax.jit
        def _gd_rhs(du):
            return forms.grad_div_ustar_rhs(V, Q, geom, du.reshape(bl.nV, 2))

        @jax.jit
        def _corr_rhs(dphi, du):
            div_part = None
            if rotational:
                div_part = mu * forms.grad_div_ustar(
                    V, geom, du.reshape(bl.nV, 2)
                )
            return forms.grad_phi_rhs(
                V, Q, geom, dphi, div_part=div_part, rule_degree=4
            ).reshape(-1)

        self._div_rhs = lambda du: np.asarray(_div_rhs(jnp.asarray(du)))
        self._gd_rhs = lambda du: np.asarray(_gd_rhs(jnp.asarray(du)))
        self._corr_rhs = lambda dphi, du: np.asarray(
            _corr_rhs(jnp.asarray(dphi), jnp.asarray(du))
        )

    # state: concatenated free coords [dUm1_f, dU_f, dP_f] (bdf2)
    # or [dU_f, dP_f] (be)
    def nstate(self):
        nf, nfp = len(self.freeU), len(self.freeP)
        return (2 * nf + nfp) if self.scheme == "bdf2" else (nf + nfp)

    def _unpack(self, x):
        nf, nfp = len(self.freeU), len(self.freeP)
        nu, nQ = self.nu, self.nQ
        if self.scheme == "bdf2":
            dUm1 = np.zeros(nu)
            dUm1[self.freeU] = x[:nf]
            dU = np.zeros(nu)
            dU[self.freeU] = x[nf : 2 * nf]
            dP = np.zeros(nQ)
            dP[self.freeP] = x[2 * nf :]
        else:
            dUm1 = None
            dU = np.zeros(nu)
            dU[self.freeU] = x[:nf]
            dP = np.zeros(nQ)
            dP[self.freeP] = x[nf:]
        return dUm1, dU, dP

    def _pack(self, dUm1, dU, dP):
        if self.scheme == "bdf2":
            return np.concatenate(
                [dUm1[self.freeU], dU[self.freeU], dP[self.freeP]]
            )
        return np.concatenate([dU[self.freeU], dP[self.freeP]])

    def apply(self, x):
        bl = self.bl
        rho, dte = self.rho, self.dte
        dUm1, dU, dP = self._unpack(x)
        if self.scheme == "bdf2":
            duhat = (4.0 * dU - dUm1) / 3.0
        else:
            duhat = dU

        if self.monolithic:
            rhs = np.concatenate(
                [(bl.M @ duhat)[self.freeU], np.zeros(self.nQ)[self.freeP]]
            )
            sol = self.lu_mono.solve(rhs)
            nf = len(self.freeU)
            du1 = np.zeros(self.nu)
            du1[self.freeU] = sol[:nf]
            dp1 = np.zeros(self.nQ)
            dp1[self.freeP] = sol[nf:]
            return self._pack(dU, du1, dp1)

        # tentative
        rhs = (bl.M @ duhat + dte * (bl.Gp @ dP))[self.freeU]
        dus = np.zeros(self.nu)
        dus[self.freeU] = self.lu_mom.solve(rhs)
        # pressure
        L2 = -(rho / dte) * self._div_rhs(dus) + self.K @ dP
        if self.rotational:
            L2 = L2 - self.mu * self._gd_rhs(dus)
        dp1 = np.zeros(self.nQ)
        dp1[self.freeP] = self.lu_K.solve(L2[self.freeP])
        # correction
        L3 = bl.M @ dus - (dte / rho) * self._corr_rhs(dp1 - dP, dus)
        du1 = np.zeros(self.nu)
        du1[self.freeU] = self.lu_M.solve(L3[self.freeU])
        return self._pack(dU, du1, dp1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("refine", type=int)
    ap.add_argument("--base", default=None)
    ap.add_argument("--dt", type=float, default=2.5e-3)
    ap.add_argument("--scheme", default="bdf2", choices=["bdf2", "be"])
    ap.add_argument("--no-rotational", action="store_true")
    ap.add_argument("--monolithic", action="store_true")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--ncv", type=int, default=80)
    ap.add_argument("--tol", type=float, default=1e-7)
    ap.add_argument(
        "--ablate", default="none", choices=["none", "stress", "dn", "bothds"]
    )
    args = ap.parse_args()

    prob = build_problem(args.refine)
    base = args.base or f"stab_base_r{args.refine}_polished.npz"
    d = np.load(base)
    U0 = np.asarray(d["U"], dtype=np.float64)
    print(f"base: {base}", flush=True)

    bl = Blocks(prob, U0, ablate=args.ablate)
    sm = StepMap(
        prob,
        bl,
        args.dt,
        args.scheme,
        rotational=not args.no_rotational,
        monolithic=args.monolithic,
    )

    n = sm.nstate()
    nap = [0]

    def mv(x):
        nap[0] += 1
        if nap[0] % 20 == 0:
            print(f"    ...{nap[0]} applications", flush=True)
        return sm.apply(np.asarray(x, dtype=np.float64))

    op = spla.LinearOperator((n, n), matvec=mv)
    t0 = time.time()
    w, _ = spla.eigs(
        op, k=args.k, which="LM", maxiter=3000, tol=args.tol, ncv=args.ncv
    )
    order = np.argsort(-np.abs(w))
    w = w[order]
    dt = args.dt
    mode = "MONO" if args.monolithic else (
        "rot" if not args.no_rotational else "incr"
    )
    print(
        f"refine={args.refine} scheme={args.scheme} mode={mode} dt={dt} "
        f"ablate={args.ablate}  [{time.time() - t0:.0f}s, "
        f"{nap[0]} applications]",
        flush=True,
    )
    for g in w:
        sig = np.log(np.abs(g)) / dt
        om = np.abs(np.angle(g)) / dt
        print(
            f"  g = {g.real:+.6f}{g.imag:+.6f}i  |g| = {np.abs(g):.6f}  "
            f"sigma = {sig:+.3f} 1/s  omega = {om:.2f}",
            flush=True,
        )
    g0 = w[0]
    print(
        f"STEPMAP: sigma = {np.log(np.abs(g0)) / dt:+.4f} 1/s  "
        f"omega = {np.abs(np.angle(g0)) / dt:.3f}  "
        f"(scheme={args.scheme}, mode={mode}, dt={dt}, "
        f"ablate={args.ablate}, refine={args.refine})",
        flush=True,
    )


if __name__ == "__main__":
    main()
