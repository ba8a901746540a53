# Performance tracing / introspection utilities.
#
# The reference relies on dolfin's `Timer`/`list_timings` and PETSc's
# `-log_view` for profiling. The TPU-native equivalents are:
#   * `trace(logdir)` — context manager around jax.profiler (TensorBoard-
#     compatible device traces; works on TPU and CPU),
#   * `cost_report(fn, *args)` — XLA's compiled cost analysis (FLOPs, bytes
#     accessed, peak memory estimate) for any jittable step function: the
#     static "speed-of-light" accounting used to drive kernel optimization,
#   * `device_memory_stats()` — live HBM usage per device,
#   * `Timer` — a host-side wall-clock timer with block semantics matching
#     dolfin.Timer usage in the reference drivers.
from __future__ import annotations

import time
from contextlib import contextmanager

import jax

__all__ = ["trace", "cost_report", "device_memory_stats", "Timer"]


@contextmanager
def trace(logdir="/tmp/flow_tpu_trace"):
    """Capture a device trace viewable in TensorBoard/Perfetto.

    with profiling.trace("/tmp/tr"):
        stepper.run(U, P, dt, n_steps=10)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def cost_report(fn, *args, **kwargs):
    """Compile `fn(*args)` and return XLA's cost analysis as a dict.

    Keys (backend-dependent): 'flops', 'bytes accessed', 'optimal_seconds',
    plus per-memory-space traffic. Returns {} if the backend provides none.
    Use flops / wall_time to compute achieved-vs-peak utilization.
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jitted.lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if ca is None:
        return {}
    # older jax returns a list with one dict per computation
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    out = dict(ca)
    try:
        mem = compiled.memory_analysis()
        if mem is not None:
            for k in (
                "temp_size_in_bytes",
                "argument_size_in_bytes",
                "output_size_in_bytes",
                "generated_code_size_in_bytes",
            ):
                v = getattr(mem, k, None)
                if v is not None:
                    out[k] = v
    except Exception:
        pass
    return out


def device_memory_stats():
    """Per-device live memory statistics (bytes). Empty dict entries on
    backends that do not expose memory_stats (e.g. CPU)."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats() or {}
        except Exception:
            stats[str(d)] = {}
    return stats


class Timer:
    """Host wall-clock timer.

    t = Timer("assembly"); ...; dt = t.stop()
    or:  with Timer("solve") as t: ...
    Accumulates across start/stop pairs (dolfin.Timer semantics).
    """

    def __init__(self, name="timer"):
        self.name = name
        self.elapsed = 0.0
        self._t0 = time.perf_counter()

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self):
        if self._t0 is not None:
            self.elapsed += time.perf_counter() - self._t0
            self._t0 = None
        return self.elapsed

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
        return False
