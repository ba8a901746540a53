from . import elements, quadrature, spaces, bc, assembly, interpolate, transfer  # noqa: F401
from .transfer import prolong, prolong_vector  # noqa: F401
from .spaces import FunctionSpace, VectorFunctionSpace, Function, SubSpace  # noqa: F401
from .bc import DirichletBC, combine_bcs  # noqa: F401
from .interpolate import project, interpolate, errornorm, norm  # noqa: F401
