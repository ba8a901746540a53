# Run one-time setup computations on the host CPU backend.
#
# Problem construction (geometry tables, assembled ELL operators, multigrid
# hierarchies, spectral estimates, BC masks, initial-condition projections)
# is tiny work compared to the time loop, but every unique shape that
# reaches the TPU backend triggers a cold compile — and through the axon
# remote-compiler tunnel each one costs ~20-40 s. At refine-5 problem sizes
# a P1Hierarchy alone issues dozens of such setup programs, turning a
# 2-second build into minutes (measured: KarmanProblem+FastStepper+hierarchy
# at refine-4 was 274 s on-device vs <5 s on CPU).
#
# setup_on_cpu() pins the default device to the host CPU for the duration of
# a setup block. The resulting arrays are plain constants; jitted hot-path
# programs that close over them transfer them to the TPU once at first
# execution (they are baked into the executable), so steady-state
# performance is unaffected.
from __future__ import annotations

from contextlib import contextmanager

import jax

__all__ = ["setup_on_cpu"]


def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


@contextmanager
def setup_on_cpu():
    """Context manager: run eager/jitted setup work on the host CPU backend
    (no-op if a CPU backend is unavailable or CPU is already the default)."""
    cpu = _cpu_device()
    if cpu is None:
        yield
    else:
        with jax.default_device(cpu):
            yield
