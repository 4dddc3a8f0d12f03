from . import estep, pairwise  # noqa: F401
