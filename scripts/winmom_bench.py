#!/usr/bin/env python
# TPU measurement: gather-free window lagged-momentum apply vs the
# jax.linearize tangent of the same (lagged) residual — the hot matvec of
# the semi-implicit momentum solve.
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
    jax.config.update("jax_default_matmul_precision", "highest")
    if os.environ.get("PROBE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PROBE_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np
    from flow_tpu.models.karman import KarmanProblem
    from flow_tpu.fem import assembly, forms
    from flow_tpu.attic.winmom import WindowLaggedMomentum
    from flow_tpu.utils.hostsetup import setup_on_cpu

    refine = int(os.environ.get("WM_REFINE", "3"))
    S = int(os.environ.get("WM_S", "512"))
    reps = int(os.environ.get("WM_REPS", "20"))
    # WM_LCAR ladders sizes BETWEEN the integer refines (each refine
    # quadruples n) — the r5 runtime-fault bisect needs intermediate n
    lcar = float(os.environ.get("WM_LCAR", "0.07"))

    with setup_on_cpu():
        prob = KarmanProblem(lcar=lcar, n_refine=refine)
        V = prob.V
        geom = assembly.geometry(V.mesh)
        # interpret only for CPU smoke runs (default platform is axon);
        # default_backend() is unreliable here — we are inside setup_on_cpu
        op = WindowLaggedMomentum(
            V, S=S, interpret=os.environ.get("PROBE_PLATFORM") == "cpu"
        )
        rng = np.random.default_rng(1)
        xh = rng.standard_normal((V.n_dofs, 2)).astype(np.float32)
        th = rng.standard_normal((V.n_dofs, 2)).astype(np.float32)
    x = jnp.asarray(xh)
    T = jnp.asarray(th)
    mass_w, s_rho, s_mu = 1.0, 0.05, 0.0001
    print(f"refine={refine} n={V.n_dofs} nc={V.mesh.n_cells} "
          f"S={S} W={op.wl.W} C={op.wl.C} nb={op.wl.nb}", flush=True)

    def timeit(f, reps=reps):
        @jax.jit
        def loop(x0):
            def body(_, x):
                return x + 1e-30 * f(x)
            return jax.lax.fori_loop(0, reps, body, x0)
        o = loop(x); o.block_until_ready(); float(o[0, 0])
        t0 = time.perf_counter()
        o = loop(x); o.block_until_ready(); float(o[0, 0])
        return (time.perf_counter() - t0) / reps

    # reference: einsum volume operator (the lagged tangent's volume part)
    Tloc = V.gather(T)

    def einsum_apply(v):
        Uloc = V.gather(v)
        loc = mass_w * forms.mass_loc(V, geom, Uloc)
        loc = loc + s_rho * forms.skew_convection_lagged_loc(
            V, geom, Tloc, Uloc, rule_degree=5
        )
        loc = loc + forms.sym_grad_loc(V, geom, Uloc, s_mu)
        return V.dof_sum(loc)

    t_e = timeit(einsum_apply)
    nm = 2 * V.n_dofs
    print(f"einsum lagged apply : {t_e*1e3:8.3f} ms "
          f"({nm/t_e/1e9:.3f} Gdof/s)", flush=True)

    Tq = op.transport_qp(T)

    def win_apply(v):
        return op._apply_original(v, Tq, mass_w, s_rho, s_mu)

    t_w = timeit(win_apply)
    print(f"window lagged apply : {t_w*1e3:8.3f} ms "
          f"({nm/t_w/1e9:.3f} Gdof/s)  speedup={t_e/t_w:.2f}x", flush=True)

    d = float(jnp.max(jnp.abs(win_apply(x) - einsum_apply(x))))
    m = float(jnp.max(jnp.abs(einsum_apply(x))))
    print(f"max abs diff: {d:.3e} (scale {m:.2e})", flush=True)

    # Newton tangent: jax.linearize of the nonlinear volume residual vs the
    # window kernel with the reaction term — the default scheme's hot matvec
    def vol_res(u):
        Uloc = V.gather(u)
        loc = mass_w * forms.mass_loc(V, geom, Uloc)
        loc = loc + s_rho * forms.skew_convection_combined_loc(
            V, geom, Uloc, rule_degree=5
        )
        loc = loc + forms.sym_grad_loc(V, geom, Uloc, s_mu)
        return V.dof_sum(loc)

    _, Jv = jax.linearize(vol_res, T)
    t_l = timeit(Jv)
    print(f"linearize newton tangent: {t_l*1e3:8.3f} ms "
          f"({nm/t_l/1e9:.3f} Gdof/s)", flush=True)

    Tqn, Uqn, Gun = op.state_qp(T)
    permi = jnp.asarray(op.perm)
    inv = jnp.asarray(op.inv)

    def win_newton(v):
        return op.apply_perm_rows(
            v, Tqn, mass_w, s_rho, s_mu, Uqn, Gun
        )

    t_n = timeit(win_newton)
    print(f"window newton tangent  : {t_n*1e3:8.3f} ms "
          f"({nm/t_n/1e9:.3f} Gdof/s)  speedup={t_l/t_n:.2f}x", flush=True)
    dn = float(jnp.max(jnp.abs(win_newton(x[permi])[inv] - Jv(x))))
    print(f"newton max abs diff: {dn:.3e}", flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
