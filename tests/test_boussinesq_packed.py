# Boussinesq with the packed NS backend (VERDICT r4 #5): a short coupled
# run on a refine-built hierarchy must match the einsum-context run at the
# solver tolerance — same heat solve, same Banach loop, only the NS step
# routed through PackedPatchStepper (with the buoyancy passed as its nodal
# vector field). Golden discipline: the committed lcar=0.01 goldens
# (tests/test_boussinesq.py) run n_refine=0 and are untouched by this
# routing (packed needs a hierarchy).
import numpy as np

from flow_tpu.models.boussinesq import compute_boussinesq
from flow_tpu import norm


def test_boussinesq_packed_matches_einsum():
    kw = dict(target_time=0.05, lcar=0.03, supg=False, dt0=1e-2, n_refine=1)
    u_r, _, th_r = compute_boussinesq(**kw)
    u_p, _, th_p = compute_boussinesq(backend="packed", **kw)
    nu_r, nu_p = norm(u_r, "L2"), norm(u_p, "L2")
    nt_r, nt_p = norm(th_r, "L2"), norm(th_p, "L2")
    assert abs(nu_p - nu_r) <= 1e-6 * max(nu_r, 1e-30), (nu_r, nu_p)
    assert abs(nt_p - nt_r) <= 1e-6 * nt_r, (nt_r, nt_p)
    # fieldwise agreement, not just norms
    du = float(np.max(np.abs(np.asarray(u_p.vector) - np.asarray(u_r.vector))))
    dth = float(
        np.max(np.abs(np.asarray(th_p.vector) - np.asarray(th_r.vector)))
    )
    assert du < 1e-8, du
    assert dth < 1e-8, dth
