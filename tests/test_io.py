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

    with open(path) as fh:
        lines = [json.loads(l) for l in fh]
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


def test_xdmf_checkpoint_roundtrip_p2(tmp_path):
    # full-fidelity write_checkpoint/read_checkpoint (dolfin restart API):
    # the COMPLETE P2 dof vector survives the roundtrip, and the viz series
    # lands on the P2 sub-triangulation grid
    import h5py
    import xml.etree.ElementTree as ET

    mesh = unit_square_mesh(4)
    V = VectorFunctionSpace(mesh, 2)
    rng = np.random.default_rng(3)
    vec = jnp.asarray(rng.standard_normal((V.n_dofs, 2)), dtype=mesh.dtype)
    u = Function(V, vec).rename("velocity")

    path = os.path.join(tmp_path, "chk.xdmf")
    with XDMFFile(path) as xf:
        xf.write_checkpoint(u, t=0.0)
        xf.write_checkpoint(Function(V, 2.0 * vec).rename("velocity"), t=0.25)
        # read back while the file is still open (mid-run restart probe)
        u0, t0 = xf.read_checkpoint(V, "velocity", counter=0)
        np.testing.assert_array_equal(np.asarray(u0.vector), np.asarray(vec))

    xf2 = XDMFFile(path)
    u1, t1 = xf2.read_checkpoint(V, "velocity", counter=-1)
    assert (t0, t1) == (0.0, 0.25)
    np.testing.assert_array_equal(np.asarray(u1.vector), 2.0 * np.asarray(vec))

    with h5py.File(os.path.join(tmp_path, "chk.h5")) as h5:
        # viz grid is the 4x refinement on the P2 dof points
        assert h5["mesh_p2/points"].shape == (V.n_dofs, 2)
        assert h5["mesh_p2/cells"].shape == (4 * mesh.n_cells, 3)
        cells = h5["mesh_p2/cells"][...]
        pts = h5["mesh_p2/points"][...]
        # every sub-triangle CCW with positive area
        d = pts[cells]
        e1, e2 = d[:, 1] - d[:, 0], d[:, 2] - d[:, 0]
        area = 0.5 * (e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
        assert (area > 0).all()
        # sub-triangulation tiles the domain exactly
        np.testing.assert_allclose(area.sum(), 1.0, atol=1e-12)

    tree = ET.parse(path)
    topo = tree.getroot().find(".//Topology")
    assert topo.get("NumberOfElements") == str(4 * mesh.n_cells)

    # shape mismatch raises
    Q = FunctionSpace(mesh, 1)
    try:
        xf2.read_checkpoint(Q, "velocity")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_xdmf_3d(tmp_path):
    import h5py
    import xml.etree.ElementTree as ET
    from flow_tpu import box_mesh

    mesh = box_mesh((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), 2, 2, 2)
    S = FunctionSpace(mesh, 1)
    V = VectorFunctionSpace(mesh, 2)
    fn = Function(S, jnp.arange(S.n_dofs, dtype=mesh.dtype)).rename("T")
    vfn = Function(V, jnp.ones((V.n_dofs, 3), dtype=mesh.dtype)).rename("u")

    path = os.path.join(tmp_path, "out3.xdmf")
    with XDMFFile(path) as xf:
        xf.write(fn, 0.0)
        xf.write(vfn, 0.0)
        # 3-D P2 checkpoint: restart vector stored, viz downsamples
        xf.write_checkpoint(vfn, t=0.0)
        v2, _ = xf.read_checkpoint(V, "u")
        np.testing.assert_array_equal(np.asarray(v2.vector), np.asarray(vfn.vector))

    tree = ET.parse(path)
    topo = tree.getroot().find(".//Topology")
    assert topo.get("TopologyType") == "Tetrahedron"
    geom = tree.getroot().find(".//Geometry")
    assert geom.get("GeometryType") == "XYZ"
    with h5py.File(os.path.join(tmp_path, "out3.h5")) as h5:
        assert h5["mesh/points"].shape == (mesh.n_points, 3)
        assert h5["u/1"].shape == (mesh.n_points, 3)  # already 3 comps, no pad


def test_profiling_utilities(tmp_path):
    # cost_report: XLA flops/bytes accounting for a compiled step; Timer;
    # trace produces a TensorBoard-readable directory
    from flow_tpu.utils import profiling

    mesh = unit_square_mesh(6)
    S = FunctionSpace(mesh, 2)
    from flow_tpu.fem import assembly
    from flow_tpu.fem.assembly import geometry
    import jax

    geom = geometry(mesh)

    def apply_K(x):
        return assembly.stiffness_apply(S, geom, x)

    x = jnp.ones(S.n_dofs, dtype=mesh.dtype)
    rep = profiling.cost_report(apply_K, x)
    assert isinstance(rep, dict)
    if rep:  # CPU backend provides flops
        assert rep.get("flops", 1.0) > 0

    with profiling.Timer("t") as t:
        pass
    assert t.elapsed >= 0.0

    stats = profiling.device_memory_stats()
    assert len(stats) == len(jax.devices())

    logdir = os.path.join(tmp_path, "tr")
    with profiling.trace(logdir):
        jax.block_until_ready(apply_K(x))
    # a plugins/profile/<ts> dir with at least one .pb / trace file
    found = []
    for root, _dirs, files in os.walk(logdir):
        found += files
    assert found, "no trace files written"


def test_xdmf_viz_series_read(tmp_path):
    # write -> read round-trip of the visualization series (dolfin XDMFFile
    # is read/write; `write` stores vertex values, exact on a P1 space) —
    # including re-opening the file cold (series index recovered from XML)
    import os

    import jax.numpy as jnp

    from flow_tpu import unit_square_mesh, FunctionSpace, VectorFunctionSpace, project
    from flow_tpu.io import XDMFFile

    mesh = unit_square_mesh(5)
    Q = FunctionSpace(mesh, 1)
    W = VectorFunctionSpace(mesh, 1)
    path = os.path.join(tmp_path, "series.xdmf")
    with XDMFFile(path) as xf:
        for k, t in enumerate([0.0, 0.5, 1.0]):
            p = project(lambda x: (1 + t) * x[..., 0], Q)
            u = project((lambda x: x[..., 1] + t, 0.0), W)
            xf.write(p.rename("pressure"), t)
            xf.write(u.rename("velocity"), t)

    xf2 = XDMFFile(path)  # cold open: no in-memory series
    m2 = xf2.read_mesh()
    assert m2.n_points == mesh.n_points and m2.n_cells == mesh.n_cells
    Q2 = FunctionSpace(m2, 1)
    W2 = VectorFunctionSpace(m2, 1)
    pr, t = xf2.read(Q2, "pressure", counter=1)
    assert t == 0.5
    want = 1.5 * m2.points_np[:, 0]
    assert jnp.allclose(pr.vector, jnp.asarray(want), atol=1e-12)
    ur, t = xf2.read(W2, "velocity", counter=-1)
    assert t == 1.0
    assert ur.vector.shape == (m2.n_points, 2)
    assert jnp.allclose(ur.vector[:, 0], jnp.asarray(m2.points_np[:, 1] + 1.0), atol=1e-12)


def test_dolfin_xml_roundtrip_2d(tmp_path):
    # the reference's Mesh('test.xml') interchange route
    # (/root/reference/tests/test_karman_vortex_street.py:52-53)
    from flow_tpu.io import read_dolfin_xml, write_dolfin_xml
    from flow_tpu.mesh import unit_square_mesh

    mesh = unit_square_mesh(3, diagonal="crossed")
    p = tmp_path / "m.xml"
    write_dolfin_xml(p, mesh)
    back = read_dolfin_xml(p)
    np.testing.assert_array_equal(back.cells_np, mesh.cells_np)
    np.testing.assert_allclose(back.points_np, mesh.points_np, rtol=0, atol=0)


def test_dolfin_xml_roundtrip_3d(tmp_path):
    from flow_tpu.io import read_dolfin_xml, write_dolfin_xml
    from flow_tpu.mesh3d import box_mesh

    mesh = box_mesh((0, 0, 0), (1, 2, 3), 2, 2, 2)
    p = tmp_path / "m3.xml"
    write_dolfin_xml(p, mesh)
    back = read_dolfin_xml(p)
    np.testing.assert_array_equal(back.cells_np, mesh.cells_np)
    np.testing.assert_allclose(back.points_np, mesh.points_np, rtol=0, atol=0)
