from .plane_gather import plane_gather  # noqa: F401
