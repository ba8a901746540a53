#!/usr/bin/env python
"""Measure the per-call overhead of the hoisted run program vs plain jit
(round-4: 20-chunk hoisted runs cost ~3 s/call at 1.9M packed while the
plain-jit step is 88 ms)."""
import os
import sys
import time


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

    prob = KarmanProblem(lcar=0.02, n_refine=int(os.environ.get("HP_REF", "5")))
    info = build_patch_info(prob.mesh_hierarchy)
    sp = PackedPatchStepper(
        prob.V, prob.Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu, info,
        newton_tol=0.0, newton_rtol=1e-2, pressure_rtol=3e-4,
        correction_rtol=1e-4, momentum_solver="gmres", mg_smoother_degree=3,
    )
    Uf, Pf = sp.zeros()
    dt0 = jnp.asarray(1e-4, dtype=Uf.dtype)

    def timed(name, fn, *args, reps=3):
        out = fn(*args)
        float(jax.tree.leaves(out)[2].ravel()[0]) if name.startswith("run") \
            else float(jax.tree.leaves(out)[0].ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            leaf = jax.tree.leaves(out)[2] if name.startswith("run") else \
                jax.tree.leaves(out)[0]
            float(jnp.asarray(leaf).ravel()[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
        return out

    # 1) plain-jit single step (constants embedded)
    timed("step_jit", sp.step, Uf, Pf, dt0)
    # 2) hoisted run, n_steps=1
    timed("run_hoisted_1", lambda: sp.run(Uf, Pf, dt0, n_steps=1))
    # 3) hoisted run, n_steps=5
    timed("run_hoisted_5", lambda: sp.run(Uf, Pf, dt0, n_steps=5))
    # 4) plain-jit run (constants embedded), n_steps=1 and 5
    timed("run_jit_1", lambda: sp._run_jit(Uf, Pf, dt0, n_steps=1))
    timed("run_jit_5", lambda: sp._run_jit(Uf, Pf, dt0, n_steps=5))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
