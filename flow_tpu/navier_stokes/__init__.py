# Re-export the pressure-correction schemes, mirroring
# /root/reference/flow/navier_stokes/__init__.py:4, plus the TPU-native
# steppers (fused fast path; reverse-mode differentiable path).
from .pressure_correction import Chorin, IPCS, Rotational  # noqa: F401
from .fast import FastStepper  # noqa: F401
from .diffstep import DiffStepper  # noqa: F401
