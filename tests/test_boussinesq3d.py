# 3-D coupled Boussinesq smoke test (BASELINE config 5 workload at toy
# scale): the coupled Banach loop runs, stays finite, and the rest state is
# preserved while the heater ramp is still near zero.
import numpy as np
import pytest

from flow_tpu.models.boussinesq3d import compute_boussinesq_3d
from flow_tpu import norm


@pytest.mark.slow
def test_boussinesq_3d_smoke():
    u1, p1, theta1 = compute_boussinesq_3d(target_time=0.03, n=(5, 5, 8))
    assert np.isfinite(np.asarray(u1.vector)).all()
    assert np.isfinite(np.asarray(theta1.vector)).all()
    # heater ramp ~ t/30 * 27K ~ 0.03K: flow is still essentially at rest
    assert norm(u1.vector, "linf") < 1e-6
    # temperature stays near room temp in L2 over the box volume
    vol = 0.1 * 0.1 * 0.2
    assert abs(norm(theta1, "L2") - 293.0 * vol**0.5) < 0.5
