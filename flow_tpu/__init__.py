# flow_tpu — a TPU-native incompressible-flow FEM framework (JAX/XLA/Pallas).
#
# A ground-up rebuild of the capabilities of nschloe/flow (reference mounted
# at /root/reference): steady Stokes, unsteady Navier-Stokes via
# Chorin/IPCS/Rotational pressure-correction schemes, convection-diffusion
# with SUPG stabilization — with the entire FEniCS/PETSc/MPI backend replaced
# by jit-compiled JAX: batched-einsum element assembly, matrix-free Krylov
# under lax.while_loop, and shard_map domain decomposition over TPU meshes.
#
# Public API mirrors the reference package (flow/__init__.py:3-5):
#   flow_tpu.message, flow_tpu.navier_stokes, flow_tpu.stokes, flow_tpu.heat
from . import message  # noqa: F401
from . import mesh  # noqa: F401
from .mesh import (  # noqa: F401
    Mesh,
    unit_square_mesh,
    rectangle_mesh,
    refine_uniform,
    rectangle_with_hole_mesh,
    reorder_rcm,
)
from .io import read_msh  # noqa: F401
from .fem import formlang  # noqa: F401
from .fem.spaces import FunctionSpace, VectorFunctionSpace, Function  # noqa: F401
from .fem.bc import DirichletBC  # noqa: F401
from .fem.interpolate import project, interpolate, errornorm, norm  # noqa: F401

from . import stokes  # noqa: F401
from . import navier_stokes  # noqa: F401
from . import heat  # noqa: F401
from . import stabilization  # noqa: F401
from . import materials  # noqa: F401
from . import parabolic  # noqa: F401
from . import io  # noqa: F401
from . import utils  # noqa: F401
from . import native  # noqa: F401
from . import mesh3d  # noqa: F401
from .mesh3d import TetMesh, box_mesh, refine_uniform_tet  # noqa: F401
from . import experimental  # noqa: F401

__version__ = "0.1.0"
