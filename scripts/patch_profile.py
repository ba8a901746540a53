#!/usr/bin/env python
"""Per-piece wall-clock decomposition of the packed-patch step on the real
chip (round-4: 1.9M packed shows 0.28 steps/s while the assembly/poisson
axes predict ~10 — find the eater). Each piece is its own jit, timed with
value-readback sync, best of 3."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.patchfast import PackedPatchStepper
    from flow_tpu.fem.patch import build_patch_info

    lcar = float(os.environ.get("PP_LCAR", "0.02"))
    refine = int(os.environ.get("PP_REFINE", "5"))
    prob = KarmanProblem(lcar=lcar, n_refine=refine)
    info = build_patch_info(prob.mesh_hierarchy)
    sp = PackedPatchStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu, info,
        newton_tol=0.0, newton_rtol=1e-2, pressure_rtol=3e-4,
        correction_rtol=1e-4, momentum_solver="gmres", mg_smoother_degree=3,
    )
    pp = sp.pp
    print(f"n2={pp.n2} n1={pp.n1} C={info.C} n={info.n}", file=sys.stderr)
    Uf, Pf = sp.zeros()
    dt = jnp.asarray(2e-3, dtype=Uf.dtype)
    # develop a nontrivial state (3 steps)
    U1, P1, dt1, _ = sp.run(Uf, Pf, 1e-4, n_steps=3)
    float(dt1)

    def timeit(name, fn, *args):
        out = fn(*args)
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.2f} ms", flush=True)
        return out

    free = 1.0 - sp.mask_u
    x0 = free * U1 + sp.mask_u * sp.val_u

    timeit("p1_stiffness_apply", jax.jit(pp.p1_stiffness_apply), P1)
    timeit("v_cycle", jax.jit(sp.pressure_precond), P1)
    timeit("mass_apply_vec", jax.jit(pp.mass_apply_vec), U1)
    timeit("ema_S_build", jax.jit(lambda T: pp.ema_S(T, 1e-3, 1e-3)[0][0][0]), x0)

    smu = float(dt) / sp.rho * sp.mu

    @jax.jit
    def ema_apply(T, x):
        S = pp.ema_S(T, smu, float(dt))
        return pp.ema_volume_apply(S, x, smu)

    timeit("ema_S+volume_apply", ema_apply, x0, U1)

    @jax.jit
    def momop(T, x):
        A, _ = sp._mom_operator(T, dt)
        return A(x)

    timeit("mom_operator(S+apply+bnd)", momop, x0, U1)

    timeit("mom_rhs", jax.jit(lambda U, P: sp._mom_rhs(U, P, dt)), U1, P1)
    timeit("div_rhs", jax.jit(pp.div_rhs), U1)
    timeit("grad_div_rhs", jax.jit(pp.grad_div_rhs), U1)
    timeit(
        "pressure_solve",
        jax.jit(lambda U, P: sp._pressure_solve(U, P, dt)[0]), U1, P1,
    )
    timeit(
        "correction",
        jax.jit(lambda U, P: sp._correction(U, P, P1, dt)[0]), U1, P1,
    )

    @jax.jit
    def momsolve(Uf, Pf):
        A_raw, S = sp._mom_operator(
            free * Uf + sp.mask_u * sp.val_u, dt
        )

        def A_bc(v):
            return free * A_raw(v) + sp.mask_u * v

        rhs = sp._mom_rhs(Uf, Pf, dt)
        x0l = free * Uf + sp.mask_u * sp.val_u
        r0 = free * (A_raw(x0l) - rhs) + sp.mask_u * (x0l - sp.val_u)
        diag = sp.mass_diag + (float(dt) / sp.rho) * (2.0 * sp.mu) * sp.stiff_diag
        diag = free * diag + sp.mask_u
        dx, sinfo = sp._mom_krylov(
            A_bc, -r0, lambda t: t / diag, sp.newton_rtol, 0.0
        )
        return dx, sinfo.iters

    dx, it = timeit("momentum_solve", momsolve, U1, P1)
    print(f"momentum iters: {int(it)}", flush=True)
    timeit("full_step", sp.step, U1, P1, dt)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
