# Physical-invariant test: a sealed box of fluid under gravity with exact
# hydrostatic initial pressure must stay at rest to machine precision —
# the protocol of /root/reference/tests/test_sealed_box.py:56-143 (assert
# ||u||_inf < 1e-13 after 2 IPCS steps), on the same rectangle-with-circular-
# hole geometry, built by the in-repo mesher instead of pygmsh.
import numpy as np

import flow_tpu
from flow_tpu import (
    rectangle_with_hole_mesh,
    VectorFunctionSpace,
    FunctionSpace,
    DirichletBC,
    project,
    norm,
)
from flow_tpu import materials


def test_sealed_box(num_steps=2, lcar=0.02):
    mesh = rectangle_with_hole_mesh(
        0.0, 0.1, 0.0, 0.2, cx=0.05, cy=0.05, r=0.02, lcar=lcar
    )

    V = VectorFunctionSpace(mesh, 2)
    Q = FunctionSpace(mesh, 1)

    u_bcs = [DirichletBC(V, (0.0, 0.0), "on_boundary")]
    p_bcs = []

    mu = materials.water.dynamic_viscosity(T=293.0)
    rho = materials.water.density(T=293.0)
    g = -9.81

    u0 = project((0.0, 0.0), V)
    p0 = project(lambda x: g * x[..., 1], Q)

    stepper = flow_tpu.navier_stokes.IPCS()

    dt = 1.0e-2
    for _ in range(num_steps):
        u1, p1 = stepper.step(
            dt,
            {0: u0},
            p0,
            u_bcs,
            p_bcs,
            rho,
            mu,
            f={0: (0.0, g), 1: (0.0, g)},
            verbose=False,
            tol=1.0e-10,
        )
        u0, p0 = u1, p1

    assert norm(u0.vector, "linf") < 1.0e-13
