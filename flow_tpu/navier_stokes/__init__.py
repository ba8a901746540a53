# Re-export the pressure-correction schemes, mirroring
# /root/reference/flow/navier_stokes/__init__.py:4.
from .pressure_correction import Chorin, IPCS, Rotational  # noqa: F401
