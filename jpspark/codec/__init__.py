from . import image, phash  # noqa: F401
