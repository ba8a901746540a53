from .xdmf import XDMFFile  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .msh import read_msh  # noqa: F401
