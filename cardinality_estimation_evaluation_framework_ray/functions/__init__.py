from . import hashing, randkit  # noqa: F401
