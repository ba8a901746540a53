from . import karman, boussinesq, boussinesq3d, cavity3d  # noqa: F401
