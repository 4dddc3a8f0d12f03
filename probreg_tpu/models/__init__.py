from . import transformation  # noqa: F401
