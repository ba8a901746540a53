from . import structured  # noqa: F401
