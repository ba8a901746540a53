#!/usr/bin/env python
# Empirical TPU HBM padding probe: device_put arrays of FEM-typical shapes
# and read the allocator's bytes_in_use delta. Confirms/refutes the
# tile-padding model behind the refine-6 OOM (round-3 BENCH_NOTES).
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import numpy as np

    jax.config.update("jax_platforms", os.environ.get("PP_PLATFORM", "axon"))
    dev = jax.devices()[0]

    def used():
        s = dev.memory_stats()
        return s.get("bytes_in_use", 0)

    shapes = [
        (("state [4M,2] f32", (4_000_000, 2), np.float32)),
        (("state [2,4M] f32", (2, 4_000_000), np.float32)),
        (("state flat [8M] f32", (8_000_000,), np.float32)),
        (("cell_dofs [1M,15] i32", (1_000_000, 15), np.int32)),
        (("cell_dofs [15,1M] i32", (15, 1_000_000), np.int32)),
        (("geom G [1M,2,2] f32", (1_000_000, 2, 2), np.float32)),
        (("geom G [2,2,1M] f32", (2, 2, 1_000_000), np.float32)),
        (("ELL [1M,7] f32", (1_000_000, 7), np.float32)),
        (("tab [1M,7,2,2] f32", (1_000_000, 7, 2, 2), np.float32)),
    ]
    for name, shape, dt in shapes:
        a = np.zeros(shape, dtype=dt)
        before = used()
        d = jax.device_put(a, dev)
        d.block_until_ready()
        after = used()
        logical = a.nbytes
        actual = after - before
        print(
            f"{name:26s} logical {logical/1e6:9.1f} MB  device "
            f"{actual/1e6:9.1f} MB  x{actual/max(logical,1):6.1f}",
            flush=True,
        )
        del d


if __name__ == "__main__":
    main()
    os._exit(0)
