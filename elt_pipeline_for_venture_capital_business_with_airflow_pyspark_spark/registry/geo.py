"""Registry family: geo (2 queries).

- geo_radius_join
- geo_nearest_neighbor
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register(
    "geo_radius_join",
    f"""
    WITH c AS (
      SELECT c_custkey,
             {_geo_coord_sql("c_custkey", "gc", "lat")} AS lat,
             {_geo_coord_sql("c_custkey", "gc", "lon")} AS lon
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             {_geo_coord_sql("s_suppkey", "gs", "lat")} AS lat,
             {_geo_coord_sql("s_suppkey", "gs", "lon")} AS lon
      FROM supplier
    ), pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             2 * 6371.0088 * asin(sqrt(
               pow(sin(radians(s.lat - c.lat) / 2), 2)
               + cos(radians(c.lat)) * cos(radians(s.lat))
                 * pow(sin(radians(s.lon - c.lon) / 2), 2)
             )) AS dist_km
      FROM c, s
    )
    SELECT c_custkey, s_suppkey,
           CAST(floor(dist_km * 100) AS BIGINT) AS dist_km_x100
    FROM pairs WHERE dist_km <= 500.0
    """,
)
def _geo_radius_join(spark: SparkSession, sf: str) -> DataFrame:
    """Spatial proximity WITHOUT a cross join
    (functions/geo.within_radius_join): every (customer, supplier)
    pair within 500 km of each other over deterministic synthetic
    coordinates. The reference schema stores office lat/lon
    (init_stg.sql:39-40) but never computes with them; this is the
    proximity query that schema exists for, built the 100-TB way —
    both sides bucketed into radius-sized grid cells, the supplier
    side replicated into its 3×3 cell neighborhood (lon wraps at the
    antimeridian), equi-join on the cell key, exact haversine
    predicate on the candidates. Cost is local-density-bounded and
    linear in |points|; the DuckDB oracle affords the plain cross
    join at sf≤0.1 and must agree pair-for-pair — proving the
    blocking loses NO recall (the invariant the cell sizing math
    guarantees for |lat| ≤ 66°)."""
    cust = _geo_coords(
        read_table(spark, sf, "customer").select("c_custkey"), "c_custkey", "gc"
    )
    supp = _geo_coords(
        read_table(spark, sf, "supplier").select("s_suppkey"), "s_suppkey", "gs"
    )
    return GEO.within_radius_join(cust, supp, 500.0).select(
        "c_custkey",
        F.col("s_suppkey_r").alias("s_suppkey"),
        F.floor(F.col("dist_km") * 100).cast("bigint").alias("dist_km_x100"),
    )


@_register(
    "geo_nearest_neighbor",
    f"""
    WITH c AS (
      SELECT c_custkey,
             {_geo_coord_sql("c_custkey", "gc", "lat")} AS lat,
             {_geo_coord_sql("c_custkey", "gc", "lon")} AS lon
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             {_geo_coord_sql("s_suppkey", "gs", "lat")} AS lat,
             {_geo_coord_sql("s_suppkey", "gs", "lon")} AS lon
      FROM supplier
    ), pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             2 * 6371.0088 * asin(sqrt(
               pow(sin(radians(s.lat - c.lat) / 2), 2)
               + cos(radians(c.lat)) * cos(radians(s.lat))
                 * pow(sin(radians(s.lon - c.lon) / 2), 2)
             )) AS dist_km
      FROM c, s
    ), keyed AS (
      SELECT c_custkey, s_suppkey,
             CAST(floor(dist_km * 10000) AS BIGINT) AS dist_km_x10000
      FROM pairs WHERE dist_km <= 1000.0
    )
    SELECT c_custkey, s_suppkey, dist_km_x10000 FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                 ORDER BY dist_km_x10000, s_suppkey) AS rn
      FROM keyed
    ) WHERE rn = 1
    """,
)
def _geo_nearest_neighbor(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-supplier-per-customer within a 1000 km service radius:
    the radius-capped nearest-neighbor join, built on the same
    cell-blocked candidate generation as geo_radius_join (an
    equi-join, never a cross join) + one per-customer ranking window
    over the radius-bounded candidate set. The cap is the scale
    contract — uncapped global-NN needs expanding-ring probes, while
    the capped form stays one blocked join; customers with no
    supplier in range are absent by definition. Ranking key is the
    exact-integer floor(dist·1e4) with supplier-id tie-break, so
    winner selection is deterministic and cross-engine stable; the
    oracle ranks the plain cross join."""
    cust = _geo_coords(
        read_table(spark, sf, "customer").select("c_custkey"), "c_custkey", "gc"
    )
    supp = _geo_coords(
        read_table(spark, sf, "supplier").select("s_suppkey"), "s_suppkey", "gs"
    )
    cand = GEO.within_radius_join(cust, supp, 1000.0).select(
        "c_custkey",
        F.col("s_suppkey_r").alias("s_suppkey"),
        F.floor(F.col("dist_km") * 10000).cast("bigint").alias("dist_km_x10000"),
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_km_x10000", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", "dist_km_x10000")
    )
