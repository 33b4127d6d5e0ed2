from . import dedup, profile, similarity, surrogate  # noqa: F401
