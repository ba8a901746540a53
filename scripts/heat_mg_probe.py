#!/usr/bin/env python
# Heat MG-GMRES iteration ladder (VERDICT r4 #8): the 74k-dof convection-
# dominated solve takes 301 GMRES(120) iterations at rtol 1e-11. Measure
# iterations and achieved error vs splu across
#   - rtol in {1e-11, 1e-9, 1e-8}        (is 1e-11 overkill for the 1e-6
#     golden discipline? error = rtol x cond, cond ~ 6e3)
#   - smoother_degree in {2, 4}          (stronger Chebyshev smoothing)
#   - upwind scaling in {0.5, 1.0}       (streamline artificial diffusion)
# CPU f64; prints one line per arm.
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from flow_tpu.mesh import unit_square_mesh, refine_uniform
    from flow_tpu.fem.spaces import FunctionSpace
    from flow_tpu.fem.bc import DirichletBC
    from flow_tpu import heat
    from flow_tpu.fem.interpolate import project
    from flow_tpu.solvers import krylov

    ms = [unit_square_mesh(12, "crossed")]
    for _ in range(3):
        ms.append(refine_uniform(ms[-1]))
    mesh = ms[-1]
    Q = FunctionSpace(mesh, 2)
    print(f"n_dofs={Q.n_dofs}", flush=True)

    def conv(x):
        return np.stack(
            [x[..., 1] - 0.5, -(x[..., 0] - 0.5)], axis=-1
        ) * 2.0

    bcs = [
        DirichletBC(Q, 1.0, lambda x: x[:, 1] < 1e-12),
        DirichletBC(Q, 0.0, lambda x: x[:, 1] > 1 - 1e-12),
    ]
    supg = os.environ.get("HM_SUPG", "1") == "1"
    op = heat.Heat(
        Q, conv, kappa=1e-3, rho=1.0, cp=1.0, bcs=bcs, source=0.0,
        supg_stabilization=supg, mesh_hierarchy=ms,
    )
    theta0 = project(lambda x: 0.5 + 0.1 * np.sin(4 * x[..., 0]), Q)
    dt = 0.05
    alpha, beta = 1.0 / dt, -1.0
    b = op.eval_alpha_M_beta_F(alpha, 0.0, theta0, 0.0)
    x_lu = op.solve_alpha_M_beta_F(alpha, beta, b, dt, solver="direct").vector
    ref = float(jnp.max(jnp.abs(x_lu)))

    # reach into the solver internals for a controlled sweep (the same
    # system assembly as solve_alpha_M_beta_F, heat.py:182-193)
    S_loc = alpha * op.M_loc + beta * op.A_loc
    rhs = b - beta * op.b_vec
    mask, vals = op.mask, op.bc_vals
    rhs = (1.0 - mask) * rhs + mask * vals
    free = 1.0 - mask

    def A(x):
        return free * op._apply_loc(S_loc, x) + mask * x

    from flow_tpu.solvers.shifted_mg import ShiftedP1Hierarchy

    # rebuild hierarchies with controlled smoother degree / upwind scale
    meshes_p2 = op._mg_hierarchy()  # warms the default cache (deg 2)

    for sdeg in (2, 4):
        for upw in (1.0,):
            # clone the heat module's construction with overrides
            mesh._heat_mg_cache = {}
            import flow_tpu.solvers.shifted_mg as smg

            orig_init = smg.ShiftedP1Hierarchy.__init__

            def patched(selfh, meshes, **kw):
                kw["smoother_degree"] = sdeg
                orig_init(selfh, meshes, **kw)

            smg.ShiftedP1Hierarchy.__init__ = patched
            try:
                hier = op._mg_hierarchy()
            finally:
                smg.ShiftedP1Hierarchy.__init__ = orig_init

            def M(r):
                return hier.v_cycle(r, shift=alpha, c=max(-beta, 0.0))

            for rtol in (1e-11, 1e-9, 1e-8):
                t0 = time.time()
                x, sinfo = krylov.gmres(
                    A, rhs, M=M, rtol=rtol, maxiter=600, restart=120
                )
                err = float(jnp.max(jnp.abs(x - x_lu))) / ref
                print(
                    f"sdeg={sdeg} upw={upw} rtol={rtol:.0e}: "
                    f"iters={int(sinfo.iters)} conv={bool(sinfo.converged)} "
                    f"rel_err_vs_splu={err:.2e} wall={time.time()-t0:.1f}s",
                    flush=True,
                )


if __name__ == "__main__":
    main()
    os._exit(0)
