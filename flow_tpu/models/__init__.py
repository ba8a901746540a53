from . import karman, boussinesq  # noqa: F401
