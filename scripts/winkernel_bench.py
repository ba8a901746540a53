#!/usr/bin/env python
# TPU measurement: gather-free window mass kernel vs the quadrature-path
# mass apply, at bench-relevant sizes. One amortizing fori_loop each.
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    if os.environ.get("PROBE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PROBE_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np
    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.fem import assembly
    from flow_tpu.attic.winkernel import WindowMassOperator
    from flow_tpu.utils.hostsetup import setup_on_cpu

    refine = int(os.environ.get("WK_REFINE", "3"))
    S = int(os.environ.get("WK_S", "512"))
    reps = int(os.environ.get("WK_REPS", "30"))

    with setup_on_cpu():
        prob = KarmanProblem(lcar=0.07, n_refine=refine)
        V = prob.V
        geom = assembly.geometry(V.mesh)
        op = WindowMassOperator(
            V, S=S, interpret=os.environ.get("PROBE_PLATFORM") == "cpu"
        )
        rng = np.random.default_rng(1)
        xh = rng.standard_normal(V.n_dofs).astype(np.float32)
    x = jnp.asarray(xh)
    print(f"refine={refine} n={V.n_dofs} nc={V.mesh.n_cells} "
          f"S={S} W={op.wl.W} C={op.wl.C} nb={op.wl.nb}", flush=True)

    def timeit(f, reps=reps):
        @jax.jit
        def loop(x0):
            def body(_, x):
                return x + 1e-30 * f(x)
            return jax.lax.fori_loop(0, reps, body, x0)
        o = loop(x); o.block_until_ready(); float(o[0])
        t0 = time.perf_counter()
        o = loop(x); o.block_until_ready(); float(o[0])
        return (time.perf_counter() - t0) / reps

    ones2 = jnp.ones((1, 2), dtype=x.dtype)

    def quad_apply(v):
        return assembly.mass_apply(V, geom, v[:, None] * ones2)[:, 0]

    t_q = timeit(quad_apply)
    print(f"quadrature mass apply: {t_q*1e3:8.3f} ms "
          f"({V.n_dofs/t_q/1e9:.3f} Gdof/s)", flush=True)

    t_w = timeit(op._apply_impl)
    print(f"window-kernel apply  : {t_w*1e3:8.3f} ms "
          f"({V.n_dofs/t_w/1e9:.3f} Gdof/s)  speedup={t_q/t_w:.2f}x",
          flush=True)

    # correctness on-device
    d = float(jnp.max(jnp.abs(op.apply(x) - quad_apply(x))))
    print(f"max abs diff: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
