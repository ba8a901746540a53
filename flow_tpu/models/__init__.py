from . import karman, boussinesq, boussinesq3d  # noqa: F401
