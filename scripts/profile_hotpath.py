#!/usr/bin/env python
# Hot-path microbenchmarks: localize where the per-step time goes at the
# benchmark size (the VERDICT-r01 "measured bound" was the gather/dof-sum
# pipeline — this script quantifies each stage separately on the real chip).
#
# Usage: python scripts/profile_hotpath.py [lcar] [n_refine]
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, reps=50):
    """Time fn amortized INSIDE one jitted fori_loop — per-call dispatch
    through the axon tunnel is ~0.5-1 ms, which swamps sub-ms kernels when
    timed call-by-call. The loop carries the output back through fn (via a
    tiny perturbation) so iterations can't be collapsed."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x0, *rest):
        def body(_, x):
            y = fn(x, *rest)
            leaf = y[0] if isinstance(y, tuple) else y
            # re-derive an input-shaped value so the loop chain is dependent
            s = jnp.sum(leaf) * 1e-30
            return x + s.astype(x.dtype)

        return jax.lax.fori_loop(0, reps, body, x0)

    out = loop(args[0], *args[1:])
    out.block_until_ready()
    t0 = time.perf_counter()
    out = loop(args[0], *args[1:])
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "highest")
    if os.environ.get("PROF_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PROF_PLATFORM"])

    import jax.numpy as jnp
    import numpy as np

    lcar = float(sys.argv[1]) if len(sys.argv) > 1 else 0.02
    n_refine = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.navier_stokes.fast import FastStepper
    from flow_tpu.fem import assembly, forms
    from flow_tpu.fem.assembly import geometry

    prob = KarmanProblem(lcar=lcar, n_refine=n_refine)
    V, Q = prob.V, prob.Q
    geom = geometry(prob.mesh)
    n_dofs = 2 * V.n_dofs + Q.n_dofs
    print(f"n_dofs={n_dofs} n_cells={prob.mesh.n_cells}", flush=True)

    st = FastStepper(
        V, Q, prob.u_bcs, prob.p_bcs, prob.rho, prob.mu,
        newton_tol=0.0, newton_rtol=1e-3, newton_maxiter=4,
        linear_rtol=3e-2, pressure_rtol=1e-4,
    )
    ctx = st.ctx
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((V.n_dofs, 2)), dtype=prob.mesh.dtype)
    P = jnp.asarray(rng.standard_normal(Q.n_dofs), dtype=prob.mesh.dtype)
    dt = jnp.asarray(1e-3, dtype=U.dtype)

    # ---- stage timings ----------------------------------------------------
    full_resid = jax.jit(
        lambda x: ctx._residual(x, U, None, None, P, st.rho, st.mu, dt, st.theta)
    )
    t_resid = timeit(full_resid, U)

    gatherV = jax.jit(lambda x: V.gather(x))
    t_gatherV = timeit(gatherV, U)

    Uloc = V.gather(U)
    dof_sumV = jax.jit(lambda l: V.dof_sum(l))
    t_dofsumV = timeit(dof_sumV, Uloc)

    # einsum chain only (pre-gathered input, local output — no dof traffic)
    def chain(Wloc):
        loc = forms.mass_loc(V, geom, Wloc)
        loc = loc + forms.sym_grad_loc(V, geom, Wloc, st.mu)
        loc = loc + forms.skew_convection_combined_loc(V, geom, Wloc)
        return loc

    t_chain = timeit(jax.jit(chain), Uloc)

    stiffQ = jax.jit(lambda p: assembly.stiffness_apply(Q, geom, p))
    t_stiffQ = timeit(stiffQ, P)

    gatherQ = jax.jit(lambda p: Q.gather(p))
    t_gatherQ = timeit(gatherQ, P)
    Ploc = Q.gather(P)
    dof_sumQ = jax.jit(lambda l: Q.dof_sum(l))
    t_dofsumQ = timeit(dof_sumQ, Ploc)

    # assembled ELL variants (the constant-operator fast path)
    from flow_tpu.fem.ell import ell_stiffness

    Kq_ell = ell_stiffness(Q, geom)
    t_ellQ = timeit(jax.jit(Kq_ell.apply), P)
    Kv_ell = ell_stiffness(V, geom)
    t_ellV = timeit(jax.jit(Kv_ell.apply), U)

    mom_dofs = V.n_dofs * 2
    print(f"momentum residual : {t_resid*1e3:8.3f} ms  "
          f"({mom_dofs/t_resid/1e9:.3f} GDoF/s)")
    print(f"  V.gather        : {t_gatherV*1e3:8.3f} ms")
    print(f"  V.dof_sum       : {t_dofsumV*1e3:8.3f} ms")
    print(f"  einsum chain    : {t_chain*1e3:8.3f} ms")
    print(f"Q stiffness_apply : {t_stiffQ*1e3:8.3f} ms  "
          f"({Q.n_dofs/t_stiffQ/1e9:.3f} GDoF/s)")
    print(f"  Q.gather        : {t_gatherQ*1e3:8.3f} ms")
    print(f"  Q.dof_sum       : {t_dofsumQ*1e3:8.3f} ms")
    print(f"Q ELL apply       : {t_ellQ*1e3:8.3f} ms  "
          f"({Q.n_dofs/t_ellQ/1e9:.3f} GDoF/s)")
    print(f"V ELL apply (vec) : {t_ellV*1e3:8.3f} ms  "
          f"({2*V.n_dofs/t_ellV/1e9:.3f} GDoF/s)")

    # ---- one full fused step (for reference) -------------------------------
    step = jax.jit(st._step_impl)
    o = step(U * 0, P * 0, dt)
    o[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        o = step(o[0], o[1], dt)
    o[0].block_until_ready()
    t_step = (time.perf_counter() - t0) / 10
    print(f"full step         : {t_step*1e3:8.3f} ms  ({1/t_step:.2f} steps/s)")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
