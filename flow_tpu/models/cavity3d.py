# 3-D lid-driven cavity on a structured box — the pure-NS throughput
# workload for the structured fast path (conv-stencil pressure multigrid,
# ops/structured.py + solvers/structured_mg.py). Companion to the 3-D
# Boussinesq driver for BASELINE config 5 scaling studies.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mesh3d import box_mesh
from ..fem.spaces import VectorFunctionSpace, FunctionSpace
from ..fem.bc import DirichletBC
from ..navier_stokes.fast import FastStepper
from ..solvers.structured_mg import StructuredHierarchy

__all__ = ["Cavity3DProblem", "run_cavity3d_fast"]


class Cavity3DProblem:
    def __init__(self, n=16, rho=1.0, mu=0.01, lid_speed=1.0, dtype=None):
        mesh = box_mesh((0, 0, 0), (1, 1, 1), n, n, n, dtype=dtype)
        self.mesh = mesh
        self.rho = rho
        self.mu = mu
        self.V = VectorFunctionSpace(mesh, 2, n_components=3)
        self.Q = FunctionSpace(mesh, 1)

        def lid(x):
            return np.where(x[:, 2] > 1 - 1e-12, lid_speed, 0.0)

        self.u_bcs = [
            DirichletBC(self.V.sub(0), lid, "on_boundary"),
            DirichletBC(self.V.sub(1), 0.0, "on_boundary"),
            DirichletBC(self.V.sub(2), 0.0, "on_boundary"),
        ]
        self.p_bcs = []


def run_cavity3d_fast(
    num_steps=50,
    n=16,
    mu=0.01,
    dt0=1.0e-3,
    newton_rtol=1.0e-3,
    pressure_rtol=1.0e-4,
    use_structured_mg=True,
):
    """Whole simulation as one compiled scan; returns final state + telemetry."""
    prob = Cavity3DProblem(n=n, mu=mu)
    stepper = FastStepper(
        prob.V,
        prob.Q,
        prob.u_bcs,
        prob.p_bcs,
        prob.rho,
        prob.mu,
        rotational_form=True,
        newton_tol=0.0,
        newton_rtol=newton_rtol,
        newton_maxiter=3,
        linear_rtol=1.0e-4,
        pressure_rtol=pressure_rtol,
        correction_rtol=1.0e-5,
        cfl_target=1.0,
        dt_max=0.1,
    )
    if use_structured_mg:
        hier = StructuredHierarchy(prob.mesh)  # pure-Neumann pressure
        stepper.pressure_precond = hier.v_cycle

    U = prob.V.zeros()
    P = prob.Q.zeros()
    U, P, dt, tel = stepper.run(
        U, P, jnp.asarray(dt0, dtype=U.dtype), n_steps=num_steps
    )
    return {
        "problem": prob,
        "stepper": stepper,
        "U": U,
        "P": P,
        "dt": float(dt),
        "telemetry": {k: np.asarray(v) for k, v in tel.items()},
    }
