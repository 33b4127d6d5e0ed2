from . import dim_date, warehouse  # noqa: F401
