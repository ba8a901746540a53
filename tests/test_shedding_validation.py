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


def test_stage2_shedding_if_available():
    # tightened corridor at 148k DoF, once the stage-2 campaign series lands
    path = os.path.join(DATA, "schafer_turek_stage2.npz")
    if not os.path.exists(path):
        import pytest

        pytest.skip("stage-2 series not recorded yet")
    t, fx, fy = _load("schafer_turek_stage2.npz")
    k0 = len(t) // 2
    cd = fx[k0:] / FORCE_SCALE
    st = karman.strouhal_number(t[k0:], fy[k0:], diameter=DIAMETER, u_ref=U_REF)
    assert st is not None
    assert 0.29 <= st <= 0.32, st
    assert 3.12 <= cd.max() <= 3.33, cd.max()
