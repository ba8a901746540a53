# Typed, frozen solver/scheme configuration.
#
# Replaces the reference's loose config surface — per-call
# solver_parameters dicts and global PETScOptions.set
# (/root/reference/flow/navier_stokes/pressure_correction.py:228-254,
# 327-338, 415-418, 452-464; SURVEY.md §5.6) — with frozen dataclasses that
# are hashable, printable, and usable as jit-static arguments.
#
# PRECISION POLICY (VERDICT r02 item 7, measured — scripts/f64_policy.py):
#   - Verification (order tests, goldens, reference 1e-13 tolerances):
#     f64, on CPU (the test default; XLA:TPU f64 cost is measured when
#     chip time allows but is never required for the gate).
#   - Production/benchmark (TPU): f32 state + relative stopping criteria
#     + jax_default_matmul_precision="highest" on perf paths (bf16 MXU
#     passes stall Newton ~1e-3) + increment-form pressure/correction
#     solves (SchemeConfig.increment_form).
#   - Conservation-type invariants do NOT require f64: the sealed-box
#     hydrostatic rest state measures |u1|_inf = 0.0 EXACTLY in BOTH f64
#     and f32 (the weak-form gravity and pressure-gradient element
#     contributions cancel bitwise under identical quadrature — a designed
#     property, not luck). What f64 buys is ACCURACY headroom (MMS error
#     floors ~1e-10), not invariants.
#   - f32 + f64-iterative-refinement around the linear solves was
#     evaluated structurally and rejected: where f32 DOES lose an
#     invariant, the loss is in the assembled RHS rounding, which solve
#     refinement cannot recover (scripts/f64_policy.py docstring).
from __future__ import annotations

from dataclasses import dataclass, asdict

__all__ = ["SolverConfig", "SchemeConfig", "BenchmarkConfig"]


@dataclass(frozen=True)
class SolverConfig:
    """Krylov solve configuration (one per linear system kind)."""

    method: str = "cg"  # cg | bicgstab | minres | gmres
    rtol: float = 1.0e-10
    atol: float = 0.0
    maxiter: int = 1000
    preconditioner: str = "jacobi"  # jacobi | chebyshev | mg | none
    error_on_nonconvergence: bool = True
    monitor_convergence: bool = False

    def as_dict(self):
        return asdict(self)


@dataclass(frozen=True)
class SchemeConfig:
    """Projection-scheme configuration.

    convection: "newton" (the reference's fully-implicit skew form,
    pressure_correction.py:224-254 semantics) or "lagged" (semi-implicit:
    transport = u^n / BDF2 extrapolation, one linear momentum solve per
    step — 2-3x fewer Krylov iterations, trajectory difference far below
    the time-discretization error; BENCH_NOTES round 3).

    increment_form: pressure/correction Krylov solves act on the
    increments phi = p1-p0 / d = u1-u* (DEFAULT ON). The full-field
    form's stopping floor rtol*|K p0| measurably damps small dynamics
    (it suppressed the refine-2 vortex shedding, round-3 diagnosis);
    FLOW_ABS_SOLVES=1 reverts. Measured throughput cost at 120k DoF:
    5.18 -> 3.36 steps/s (the startup transient develops more flow) —
    the price of correct physics; the lagged convection recoups it.
    """

    time_step_method: str = "backward euler"
    rotational_form: bool = False
    newton_tol: float = 1.0e-10
    newton_rtol: float = 0.0
    newton_maxiter: int = 10
    convection: str = "newton"  # newton | lagged
    increment_form: bool = True
    convection_quadrature_degree: int = 5
    force_quadrature_degree: int = 6


@dataclass(frozen=True)
class BenchmarkConfig:
    """f32 performance-path settings (SURVEY.md §7 hard part #4)."""

    newton_rtol: float = 1.0e-3
    newton_maxiter: int = 3
    linear_rtol: float = 1.0e-4
    pressure_rtol: float = 1.0e-4
    mg_smoother_degree: int = 3
    cfl_target: float = 1.0
