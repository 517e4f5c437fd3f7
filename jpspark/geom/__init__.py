from . import cell, pip, rtree, wkb  # noqa: F401
