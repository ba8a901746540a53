# Pallas 27-point stencil kernel vs lax.conv (zero padding): numerically
# identical. Runs in interpreter mode on CPU; the compiled path is exercised
# on TPU by the structured benchmarks.
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from flow_tpu.ops.pallas_stencil import stencil_apply_3d


def _conv_ref(xgrid, kernel):
    xg = xgrid[None, None]
    k = kernel[None, None]
    dn = lax.conv_dimension_numbers(xg.shape, k.shape, ("NCDHW", "OIDHW", "NCDHW"))
    return lax.conv_general_dilated(
        xg, k, window_strides=(1, 1, 1), padding="SAME", dimension_numbers=dn
    )[0, 0]


def test_pallas_stencil_matches_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((6, 8, 128)), dtype=jnp.float32)
    # XLA conv is cross-correlation: out[i] = sum_d x[i+d-1] k[d], exactly
    # the stencil's convention — same kernel, no flip
    k = jnp.asarray(rng.standard_normal((3, 3, 3)), dtype=jnp.float32)
    y = stencil_apply_3d(x, k, interpret=True)
    y_ref = _conv_ref(x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_pallas_stencil_2d_matches_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((16, 128)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3)), dtype=jnp.float32)
    from flow_tpu.ops.pallas_stencil import stencil_apply_2d

    y = stencil_apply_2d(x, k, interpret=True)
    xg = x[None, None]
    kk = k[None, None]
    dn = lax.conv_dimension_numbers(xg.shape, kk.shape, ("NCHW", "OIHW", "NCHW"))
    y_ref = lax.conv_general_dilated(
        xg, kk, window_strides=(1, 1), padding="SAME", dimension_numbers=dn
    )[0, 0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
