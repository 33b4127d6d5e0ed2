"""Declarative data-quality expectations over any table.

The reference's data-quality surface is the profiling plpgsql function
(`dags/data_profiling/query/data_profiling_function.sql:80-119`):
per-column completeness with a 90% Good/Bad threshold plus
negative-value flags, persisted as a report. `operators/profile`
reproduces that report; this module is the enforcement half the
reference leaves implicit in Postgres constraints
(`dataset/warehouse/init_stg.sql:195-343` PK/FK/UNIQUE): declarative
checks evaluated IN Spark, so violations are caught before the load
instead of by the sink database.

Every check compiles to aggregates over a single pass (or one
left-anti join for FK checks) — no per-rule scans, no collects beyond
the one-row verdict. At 100 TB a rule-per-scan design multiplies the
read cost by the rule count; here N column rules cost one scan.

Output shape (one row per check):
    check STRING, column STRING, violations BIGINT, total BIGINT,
    pass BOOLEAN
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Expectations"]


class Expectations:
    """Builder: accumulate checks, evaluate in one aggregation pass
    (plus one anti-join per FK rule)."""

    def __init__(self, df: DataFrame):
        self._df = df
        # (check name, column label, violation predicate)
        self._rules: list[tuple[str, str, Column]] = []
        self._fk: list[tuple[str, DataFrame, str]] = []
        self._unique: list[list[str]] = []

    def expect_not_null(self, col: str) -> "Expectations":
        self._rules.append(("not_null", col, F.col(col).isNull()))
        return self

    def expect_range(self, col: str, lo=None, hi=None) -> "Expectations":
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(col) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(col) > F.lit(hi))
        # nulls are not range violations (use expect_not_null for that)
        self._rules.append(("range", col, cond & F.col(col).isNotNull()))
        return self

    def expect_in_set(self, col: str, allowed: list) -> "Expectations":
        self._rules.append(
            ("in_set", col, ~F.col(col).isin(allowed) & F.col(col).isNotNull())
        )
        return self

    def expect_regex(self, col: str, pattern: str) -> "Expectations":
        self._rules.append(
            ("regex", col, ~F.col(col).rlike(pattern) & F.col(col).isNotNull())
        )
        return self

    def expect_unique(self, cols: list[str]) -> "Expectations":
        self._unique.append(cols)
        return self

    def expect_fk(
        self, col: str, dim: DataFrame, dim_key: str
    ) -> "Expectations":
        """Referential integrity: every non-null ``col`` exists in
        ``dim.dim_key`` — the orphan-audit twin of the reference's
        inner-join-as-FK-filter (SURVEY.md §1.4)."""
        self._fk.append((col, dim, dim_key))
        return self

    def evaluate(self) -> DataFrame:
        spark = self._df.sparkSession
        total = F.count(F.lit(1))
        aggs = [total.alias("__total")] + [
            F.sum(cond.cast("long")).alias(f"__v{i}")
            for i, (_, _, cond) in enumerate(self._rules)
        ]
        base = self._df.agg(*aggs)
        frames = [
            base.select(
                F.lit(check).alias("check"),
                F.lit(col).alias("column"),
                F.col(f"__v{i}").alias("violations"),
                F.col("__total").alias("total"),
                (F.col(f"__v{i}") == 0).alias("pass"),
            )
            for i, (check, col, _) in enumerate(self._rules)
        ]
        for cols in self._unique:
            dup = (
                self._df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("violations"),
                )
            )
            frames.append(
                dup.crossJoin(base.select(F.col("__total").alias("total"))).select(
                    F.lit("unique").alias("check"),
                    F.lit(",".join(cols)).alias("column"),
                    "violations",
                    "total",
                    (F.col("violations") == 0).alias("pass"),
                )
            )
        for col, dim, dim_key in self._fk:
            orphans = (
                self._df.select(F.col(col))
                .filter(F.col(col).isNotNull())
                .join(
                    dim.select(F.col(dim_key).alias(col)).distinct(),
                    col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            frames.append(
                orphans.crossJoin(base.select(F.col("__total").alias("total"))).select(
                    F.lit("fk").alias("check"),
                    F.lit(col).alias("column"),
                    "violations",
                    "total",
                    (F.col("violations") == 0).alias("pass"),
                )
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out
