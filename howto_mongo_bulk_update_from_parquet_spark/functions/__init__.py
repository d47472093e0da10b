from .numeric import dec, dsum, davg  # noqa: F401
