# Adaptive-dt controller + retry (the promoted failure-recovery pattern of
# SURVEY.md §5.3).
import pytest

from flow_tpu.utils import AdaptiveTimeController, step_with_retry


def test_controller_matches_reference_formula():
    c = AdaptiveTimeController(0.01, dt_max=1.0, alpha=0.5, growth=2.0)
    # same arithmetic as tests/test_karman_vortex_street.py:279-284 upstream
    dt = 0.01
    for target in [0.1, 0.5, 0.0001, 2.0]:
        expected = min(1.0, dt * min(2.0, 1.0 + 0.5 * (target - dt) / dt))
        assert c.propose(target) == pytest.approx(expected)
        dt = expected


def test_growth_cap_and_ceiling():
    c = AdaptiveTimeController(0.1, dt_max=0.3)
    assert c.propose(100.0) == pytest.approx(0.2)  # at most doubles
    assert c.propose(100.0) == pytest.approx(0.3)  # hits ceiling


def test_step_with_retry_backoff():
    c = AdaptiveTimeController(1.0)
    calls = []

    def step(dt):
        calls.append(dt)
        if dt > 0.3:
            raise RuntimeError("diverged")
        return "ok"

    out, dt_used = step_with_retry(step, c)
    assert out == "ok"
    assert calls == [1.0, 0.5, 0.25]
    assert dt_used == 0.25


def test_step_with_retry_exhausts():
    c = AdaptiveTimeController(1.0)
    with pytest.raises(RuntimeError, match="backoffs"):
        step_with_retry(lambda dt: (_ for _ in ()).throw(RuntimeError()), c,
                        max_retries=3)
