# IO subsystem: XDMF/HDF5 time series (readable back, valid XML), npz
# checkpoint roundtrip, metrics logger.
import os

import numpy as np
import jax.numpy as jnp

import flow_tpu
from flow_tpu import unit_square_mesh, FunctionSpace, VectorFunctionSpace, Function
from flow_tpu.io import XDMFFile, save_checkpoint, load_checkpoint
from flow_tpu.utils.metrics import MetricsLogger


def test_xdmf_time_series(tmp_path):
    import h5py
    import xml.etree.ElementTree as ET

    mesh = unit_square_mesh(4)
    S = FunctionSpace(mesh, 1)
    V = VectorFunctionSpace(mesh, 2)
    fn = Function(S, jnp.arange(S.n_dofs, dtype=mesh.dtype)).rename("temperature")
    vfn = Function(V, jnp.ones((V.n_dofs, 2), dtype=mesh.dtype)).rename("velocity")

    path = os.path.join(tmp_path, "out.xdmf")
    with XDMFFile(path) as xf:
        xf.write(fn, 0.0)
        xf.write(vfn, 0.0)
        xf.write(fn, 0.5)

    # valid XML with two temporal grids
    tree = ET.parse(path)
    grids = tree.getroot().findall(".//Grid[@GridType='Collection']")
    assert {g.get("Name") for g in grids} == {"temperature", "velocity"}

    with h5py.File(os.path.join(tmp_path, "out.h5")) as h5:
        assert h5["mesh/points"].shape == (mesh.n_points, 2)
        np.testing.assert_allclose(
            h5["temperature/0"][...], np.arange(mesh.n_points)
        )
        # vectors are padded to 3 components for paraview
        assert h5["velocity/1"].shape == (mesh.n_points, 3)


def test_checkpoint_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "state.npz")
    U = jnp.arange(12.0).reshape(6, 2)
    save_checkpoint(path, {"u": U}, {"t": 1.5, "step": 7})
    arrays, scalars = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(arrays["u"]), np.asarray(U))
    assert scalars == {"t": 1.5, "step": 7}


def test_metrics_logger(tmp_path):
    path = os.path.join(tmp_path, "metrics.jsonl")
    with MetricsLogger(path) as m:
        m.log(step=1, dt=0.1, unorm=2.0)
        m.log(step=2, dt=0.2, unorm=4.0)
    s = m.summary()
    assert s["unorm"]["mean"] == 3.0
    assert s["dt"]["max"] == 0.2
    import json

    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2 and lines[0]["step"] == 1


def test_expression_settable_params():
    from flow_tpu.utils import Expression

    e = Expression(lambda x, t, a: a * x[..., 0] + t, t=0.0, a=2.0)
    pts = jnp.asarray([[1.0, 0.0], [2.0, 0.0]])
    np.testing.assert_allclose(np.asarray(e(pts)), [2.0, 4.0])
    e.t = 1.5
    np.testing.assert_allclose(np.asarray(e(pts)), [3.5, 5.5])
    # usable as BC value / interpolation source
    mesh = unit_square_mesh(3)
    S = FunctionSpace(mesh, 1)
    u = flow_tpu.interpolate(e, S)
    assert np.isfinite(np.asarray(u.vector)).all()


def test_materials_values():
    from flow_tpu import materials

    assert abs(materials.water.density(293.15) - 998.2) < 0.2
    assert abs(materials.water.dynamic_viscosity(293.15) - 1.0e-3) < 5e-5
    assert abs(materials.water.thermal_conductivity(293.15) - 0.598) < 0.01
    assert 4150 < materials.water.specific_heat_capacity(293.15) < 4230
    assert abs(materials.air.density(293.15) - 1.204) < 0.01
    assert abs(materials.air.dynamic_viscosity(293.15) - 1.81e-5) < 1e-6
