from . import expr, text  # noqa: F401
