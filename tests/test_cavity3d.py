# 3-D lid-driven cavity on the structured fast path: the fused scan runs
# with structured-MG pressure solves (~3 CG iterations/step) and produces a
# physically sensible flow (downstream circulation under the lid).
import numpy as np

from flow_tpu.models.cavity3d import run_cavity3d_fast
import pytest


@pytest.mark.slow
def test_cavity3d_fast_smoke():
    out = run_cavity3d_fast(num_steps=6, n=6)
    tel = out["telemetry"]
    U = np.asarray(out["U"])
    assert np.isfinite(U).all()
    # the structured multigrid keeps pressure iterations O(1)
    assert tel["pressure_iters"].max() <= 15
    # lid drags fluid: x-velocity near the lid positive, recirculation below
    prob = out["problem"]
    z = np.asarray(prob.V.dof_points_np[:, 2])
    near_lid = (z > 0.85) & (z < 1.0 - 1e-9)
    assert U[near_lid, 0].mean() > 0.0
