# 3-D Boussinesq with the box-packed NS backend: a short coupled run must
# match the einsum-context run at solver tolerance — same heat solve, same
# Banach loop, only the NS step routed through BoxPackedStepper with the
# nodal buoyancy (BASELINE configs[4] axis; mirrors
# tests/test_boussinesq_packed.py in 2-D).
import numpy as np

from flow_tpu.models.boussinesq3d import compute_boussinesq_3d
from flow_tpu import norm


def test_boussinesq3d_packed_matches_einsum():
    kw = dict(target_time=0.02, n=(4, 4, 8), supg=False, dt0=1e-2)
    u_r, _, th_r = compute_boussinesq_3d(**kw)
    u_p, _, th_p = compute_boussinesq_3d(backend="packed", **kw)
    nu_r, nu_p = norm(u_r, "L2"), norm(u_p, "L2")
    nt_r, nt_p = norm(th_r, "L2"), norm(th_p, "L2")
    assert abs(nu_p - nu_r) <= 1e-6 * max(nu_r, 1e-30), (nu_r, nu_p)
    assert abs(nt_p - nt_r) <= 1e-6 * nt_r, (nt_r, nt_p)
    du = float(np.max(np.abs(np.asarray(u_p.vector) - np.asarray(u_r.vector))))
    dth = float(
        np.max(np.abs(np.asarray(th_p.vector) - np.asarray(th_r.vector)))
    )
    assert du < 1e-8, du
    assert dth < 1e-8, dth
