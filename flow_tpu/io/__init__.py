from .xdmf import XDMFFile  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .msh import read_msh  # noqa: F401
from .dolfin_xml import read_dolfin_xml, write_dolfin_xml  # noqa: F401
