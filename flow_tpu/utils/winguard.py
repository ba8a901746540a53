# Size guard for the (closed-negative) Pallas window-kernel suite.
#
# The window kernels (fem/win*.py, parallel/halo_win.py) are kept in-tree as
# a documented negative result (BENCH_NOTES "window kernels: CLOSED with
# evidence"): they measured 0.71-0.95x of the einsum path at every runnable
# size AND hit a hard runtime Mosaic fault at >= ~144k scalar dofs (r3
# chain-4: winmom/winkernel/full-step all died identically at refine-5).
# FLOW_WINKERNEL=1 therefore only engages BELOW the measured fault threshold;
# above it the request is refused loudly (no silent crash path), overridable
# only with FLOW_WINKERNEL_FORCE=1 for kernel debugging.
from __future__ import annotations

import os
import warnings

__all__ = ["winkernel_size_ok"]

# measured-fault threshold (scalar rows of the operator's space); the last
# clean size was ~37k (refine-4), first faulting ~144k (refine-5) — guard
# with margin below the fault
_DEFAULT_MAXN = 140_000


def winkernel_size_ok(n_rows: int, what: str = "window kernel") -> bool:
    """True if the window-kernel path may run for an operator with `n_rows`
    scalar rows; warns and returns False above the measured fault size."""
    maxn = int(os.environ.get("FLOW_WINKERNEL_MAXN", str(_DEFAULT_MAXN)))
    if n_rows <= maxn:
        return True
    if os.environ.get("FLOW_WINKERNEL_FORCE", "") == "1":
        warnings.warn(
            f"FLOW_WINKERNEL_FORCE=1: running {what} at {n_rows} rows, "
            f"ABOVE the measured Mosaic fault threshold (~144k)"
        )
        return True
    warnings.warn(
        f"FLOW_WINKERNEL=1 ignored for {what} at {n_rows} rows: the suite "
        f"has a known hard TPU fault at >= ~144k rows (BENCH_NOTES round 3); "
        f"falling back to the einsum/ELL path. FLOW_WINKERNEL_FORCE=1 "
        f"overrides for kernel debugging."
    )
    return False
