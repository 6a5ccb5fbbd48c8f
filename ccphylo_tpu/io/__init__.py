from . import fileio, phylip  # noqa: F401
