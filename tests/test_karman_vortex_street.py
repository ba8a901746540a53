# Karman vortex street smoke test — end-to-end pipeline check mirroring
# /root/reference/tests/test_karman_vortex_street.py:56 (num_steps=2 in CI;
# scaled up by bench.py / __main__ for real runs).
import numpy as np

from flow_tpu.models import karman
import pytest


@pytest.mark.slow
def test_karman(num_steps=2, lcar=0.02):
    out = karman.run_karman(
        num_steps=num_steps, lcar=lcar, collect_forces=True, verbose=False
    )
    # Reynolds number as in the reference (:206-208): Re = u d rho / mu
    assert abs(out["problem"].reynolds - 0.01 * 0.04 * out["problem"].rho / 0.002) < 1e-9
    # state stays finite and nonzero
    u = np.asarray(out["u"].vector)
    assert np.isfinite(u).all()
    assert np.abs(u).max() > 1e-4  # inflow is active
    # forces on the cylinder are finite; drag positive (flow pushes the
    # cylinder downstream)
    f = out["forces"]
    assert np.isfinite(f).all()
    assert f[-1][0] > 0.0


def test_strouhal_estimator_synthetic():
    # pure-sine lift at f=2 Hz -> St = f d / U = 2 * 0.04 / 0.01 = 8
    t = np.linspace(0.0, 5.0, 400)
    lift = np.sin(2 * np.pi * 2.0 * t)
    st = karman.strouhal_number(t, lift)
    assert abs(st - 8.0) < 0.2


def test_karman_fast_chunked(monkeypatch):
    # the fused fast driver with forces telemetry; exercises chunked scan
    # execution (chunk + remainder) on a tiny mesh
    from flow_tpu.models.karman import run_karman_fast
    import flow_tpu.models.karman as km

    out = run_karman_fast(num_steps=3, lcar=0.03, n_refine=0, use_multigrid=False)
    assert out["t"].shape == (3,)
    assert out["forces"].shape == (3, 2)
    assert np.isfinite(out["forces"]).all()
    assert out["dt"] > 0


def test_karman_with_xdmf_writer(tmp_path):
    # the host driver writes XDMF time series like the reference's
    # XDMFFile usage (test_karman_vortex_street.py:214-227)
    import os
    from flow_tpu.io import XDMFFile

    path = os.path.join(tmp_path, "karman.xdmf")
    with XDMFFile(path) as xf:
        out = karman.run_karman(num_steps=2, lcar=0.03, writer=xf)
    assert os.path.exists(path)
    assert os.path.getsize(os.path.join(tmp_path, "karman.h5")) > 1000
    import xml.etree.ElementTree as ET

    grids = ET.parse(path).getroot().findall(".//Grid[@GridType='Collection']")
    assert {g.get("Name") for g in grids} == {"velocity", "pressure"}


@pytest.mark.slow
def test_karman_fast_checkpoint_resume(tmp_path):
    import os
    from flow_tpu.models.karman import run_karman_fast

    ck = os.path.join(tmp_path, "state.npz")
    out1 = run_karman_fast(
        num_steps=4, lcar=0.03, n_refine=0, use_multigrid=False,
        checkpoint_path=ck,
    )
    assert os.path.exists(ck)
    # resume continues from the checkpointed (U, P, dt)
    out2 = run_karman_fast(
        num_steps=2, lcar=0.03, n_refine=0, use_multigrid=False,
        checkpoint_path=ck, resume=True,
    )
    # one contiguous 6-step run must equal 4 + resumed 2
    out_full = run_karman_fast(
        num_steps=6, lcar=0.03, n_refine=0, use_multigrid=False,
    )
    np.testing.assert_allclose(
        np.asarray(out2["u"].vector), np.asarray(out_full["u"].vector),
        atol=1e-12,
    )


def test_schafer_turek_problem():
    # DFG 2D-2 construction invariants + a short fast-path run
    from flow_tpu.models import karman

    prob = karman.schafer_turek_problem(lcar=0.05, n_refine=0)
    assert abs(prob.reynolds - 100.0) < 1e-12
    assert abs(prob.force_scale - 0.5 * 1.0 * (1.0) ** 2 * 0.1) < 1e-12
    # open outflow: 4 velocity BCs (walls, obstacle, inlet) — no outlet u BC
    assert len(prob.u_bcs) == 4
    assert len(prob.p_bcs) == 1
    import numpy as np

    out = karman.run_karman_fast(
        num_steps=4, dt0=1e-4, dt_max=2e-3, problem=prob, chunk_size=2
    )
    assert np.isfinite(out["forces"]).all()
    assert out["t"][-1] > 0
