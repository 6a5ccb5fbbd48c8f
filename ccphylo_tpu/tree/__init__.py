from . import newick_build, exact  # noqa: F401
