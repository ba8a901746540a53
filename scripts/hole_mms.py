#!/usr/bin/env python
# Spatial MMS convergence on the EXACT mesh family the Karman stage-2 runs
# use: rectangle_with_hole_mesh + refine_uniform (with/without circle snap).
#
# Purpose (VERDICT r02 item 1 / BENCH_NOTES stage-2): the refined-mesh
# shedding suppression could hide in an inconsistency of the refined hole
# meshes themselves (stale boundary tabulations, bad midpoint insertion,
# wrong adjacency after refine). A manufactured Stokes solution with
# Dirichlet data on ALL boundaries (outer rectangle + cylinder) measures the
# discretization error on exactly those meshes; clean O(h^2)+ convergence
# under refinement exonerates mesh+assembly+BC identification, pinning the
# defect to the unsteady/outflow path instead.
#
# Runs on CPU f64 (no TPU needed). Usage: python scripts/hole_mms.py [lcar]
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import sympy

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import flow_tpu
from flow_tpu import DirichletBC, errornorm
from flow_tpu.mesh import rectangle_with_hole_mesh, refine_uniform
from flow_tpu.stokes import TaylorHood

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from helpers import lambdify_x


def exact():
    from sympy import pi, sin, cos

    x = sympy.DeferredVector("x")
    # div-free velocity + smooth pressure on the karman bounding box
    # (0,2.2)x(0,0.41); nothing special at the cylinder
    u = (
        +sin(pi * x[1]) * cos(pi * x[1]) * sin(pi * x[0]) ** 2,
        -sin(pi * x[0]) * cos(pi * x[0]) * sin(pi * x[1]) ** 2,
    )
    p = cos(pi * x[0]) * sin(pi * x[1])
    mu = 1.0
    f0 = -mu * (sympy.diff(u[0], x[0], 2) + sympy.diff(u[0], x[1], 2)) + sympy.diff(
        p, x[0]
    )
    f1 = -mu * (sympy.diff(u[1], x[0], 2) + sympy.diff(u[1], x[1], 2)) + sympy.diff(
        p, x[1]
    )
    return u, p, (sympy.simplify(f0), sympy.simplify(f1)), mu


def run(lcar, snap, n_levels=3):
    u_sym, p_sym, f_sym, mu = exact()
    u_sol = tuple(lambdify_x(c) for c in u_sym)
    p_sol = lambdify_x(p_sym)
    f = tuple(lambdify_x(c) for c in f_sym)

    cx, cy, r = 0.2, 0.2, 0.05
    mesh = rectangle_with_hole_mesh(
        0.0, 2.2, 0.0, 0.41, cx=cx, cy=cy, r=r, lcar=lcar, dtype=np.float64
    )

    def snap_fn(p):
        th = np.arctan2(p[:, 1] - cy, p[:, 0] - cx)
        d = np.linalg.norm(p - [cx, cy], axis=1)
        on_circ = np.abs(d - r) < 0.3 * r
        out = p.copy()
        out[on_circ] = np.stack(
            [cx + r * np.cos(th[on_circ]), cy + r * np.sin(th[on_circ])], 1
        )
        return out

    rows = []
    for lvl in range(n_levels):
        if lvl > 0:
            mesh = refine_uniform(mesh, snap_boundary=snap_fn if snap else None)
        WP = TaylorHood(mesh)
        u_bcs = DirichletBC(WP.sub(0), u_sol, "on_boundary")
        p_bcs = DirichletBC(WP.sub(1), p_sol, "on_boundary")
        u_approx, p_approx = flow_tpu.stokes.solve(
            WP, bcs=[u_bcs, p_bcs], mu=mu, f=f, verbose=False, tol=1.0e-10,
            max_iter=60000,
        )
        eu = errornorm(u_sol, u_approx)
        ep = errornorm(p_sol, p_approx)
        rows.append((mesh.hmax, eu, ep, mesh.n_cells))
        print(
            f"  lvl={lvl} hmax={mesh.hmax:.5f} cells={mesh.n_cells} "
            f"|e_u|={eu:.4e} |e_p|={ep:.4e}",
            flush=True,
        )
    rows = np.array([r[:3] for r in rows])
    h, eu, ep = rows.T
    ou = np.log(eu[:-1] / eu[1:]) / np.log(h[:-1] / h[1:])
    op = np.log(ep[:-1] / ep[1:]) / np.log(h[:-1] / h[1:])
    print(f"snap={snap}  u orders: {np.round(ou, 3)}  p orders: {np.round(op, 3)}")
    return ou, op


if __name__ == "__main__":
    lcar = float(sys.argv[1]) if len(sys.argv) > 1 else 0.06
    print(f"hole-mesh Stokes MMS, lcar={lcar}")
    print("WITH circle snap (production geometry):", flush=True)
    run(lcar, snap=True)
    print("WITHOUT snap:", flush=True)
    run(lcar, snap=False)
