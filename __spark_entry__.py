"""Driver contract for the spark-graft builder (PySpark target).

Round 10 (VERDICT r9 #8): the former 12k-line monolith now lives in
``elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.registry``
— one module per query family plus a shared substrate — and this file
is the stable driver-facing shim. The contract is unchanged:

- ``entry(spark)`` runs the flagship query at sf0.001;
- ``queries()`` maps every registered query name to a
  ``(spark, sf_dir) -> DataFrame`` callable, the 50-slot driver
  verification window first;
- ``oracle_sql()`` maps each checkable query to its DuckDB ANSI-SQL
  twin (column names aligned for the driver's sorted-column value
  hash).

Determinism conventions (so value-hashes match across engines) are
documented in ``registry/_shared.py``.
"""

from __future__ import annotations

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.registry import (  # noqa: F401
    _DRIVER_WINDOW,
    _NO_ORACLE_TWINS,
    _REGISTRY,
    _WINDOW_ORDER,
    entry,
    oracle_sql,
    queries,
)

__all__ = [
    "entry",
    "queries",
    "oracle_sql",
    "_REGISTRY",
    "_WINDOW_ORDER",
    "_NO_ORACLE_TWINS",
    "_DRIVER_WINDOW",
]
