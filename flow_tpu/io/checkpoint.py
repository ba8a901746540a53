# Checkpoint / resume of simulation state — capability the reference lacks
# entirely (SURVEY.md §5.4): the full state of any driver here is a handful
# of flat arrays plus scalars, stored as npz with a version/metadata header.
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["save_checkpoint", "load_checkpoint"]

_FORMAT_VERSION = 1


def save_checkpoint(path, arrays: dict, scalars: dict | None = None):
    """arrays: name -> jnp/np array; scalars: name -> float/int."""
    payload = {f"arr_{k}": np.asarray(v) for k, v in arrays.items()}
    if scalars:
        for k, v in scalars.items():
            payload[f"scl_{k}"] = np.asarray(v)
    payload["__version__"] = np.asarray(_FORMAT_VERSION)
    np.savez(path, **payload)


def load_checkpoint(path, dtype=None):
    """Returns (arrays, scalars); arrays as jnp arrays."""
    data = np.load(path)
    version = int(data["__version__"])
    assert version == _FORMAT_VERSION, f"unknown checkpoint version {version}"
    arrays = {
        k[4:]: jnp.asarray(v, dtype=dtype if np.issubdtype(v.dtype, np.floating) else None)
        for k, v in data.items()
        if k.startswith("arr_")
    }
    scalars = {k[4:]: v.item() for k, v in data.items() if k.startswith("scl_")}
    return arrays, scalars
