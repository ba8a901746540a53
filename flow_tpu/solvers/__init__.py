from . import krylov  # noqa: F401
from .krylov import cg, bicgstab, minres, gmres, SolveInfo  # noqa: F401
