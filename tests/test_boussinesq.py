# Golden-value regression test of the coupled Navier-Stokes + heat
# (Boussinesq) simulation — the protocol of
# /root/reference/tests/test_boussinesq.py:82-97: run to t=1.0 and pin
# ||u||_L2 and ||theta||_L2 to 1e-6 *relative*, with and without SUPG.
# Goldens are generated on this stack (different mesher/materials than
# FEniCS+pygmsh, so the reference's absolute values don't transfer; the
# discipline — end-to-end bit-stability of the whole stack — does).
from flow_tpu.models.boussinesq import compute_boussinesq
from flow_tpu import norm
import pytest


@pytest.mark.slow
def test_boussinesq():
    u1, _, theta1 = compute_boussinesq(target_time=1.0, lcar=0.01, supg=False)
    ref = 4.770048096036418e-06
    assert abs(norm(u1, "L2") - ref) < 1.0e-6 * ref
    ref = 40.18227533538666
    assert abs(norm(theta1, "L2") - ref) < 1.0e-6 * ref


@pytest.mark.slow
def test_boussinesq_with_supg():
    u1, _, theta1 = compute_boussinesq(target_time=1.0, lcar=0.01, supg=True)
    ref = 4.770047249301352e-06
    assert abs(norm(u1, "L2") - ref) < 1.0e-6 * ref
    ref = 40.18227533334490
    assert abs(norm(theta1, "L2") - ref) < 1.0e-6 * ref
