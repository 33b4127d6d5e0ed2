"""Geo expressions: haversine distance and cell-blocked proximity
joins.

The reference stores office coordinates (`dataset/warehouse/
init_stg.sql:39-40`, `latitude/longitude numeric(9,6)`) but never
computes with them — proximity ("offices within r km", "nearest
office to each company") is the natural next query a user of that
schema asks. Built here as pure Column expressions (codegen'd, no
UDF) plus the 100 TB join shape: never a cross join — candidates are
blocked on a lat/lon grid cell sized to the query radius, so each
point joins only its own and the 8 neighboring cells (the standard
spatial-binning reduction, the geo analogue of LSH banding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["haversine_km", "within_radius_join"]

_EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (degree) coordinate
    pairs — single codegen'd expression tree, ~0.5% accuracy vs true
    geodesics (spherical model)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(
        F.sin(dlon / 2), 2
    )
    return F.lit(2 * _EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def _cell(
    lat: Column, lon: Column, lat_deg: float, lon_deg: float, n_lon: int
) -> tuple[Column, Column]:
    # lon cells tile [-180, 180) exactly (n_lon * lon_deg == 360), so a
    # plain modulo makes the index wrap: lon 179.9° and -179.9° land in
    # adjacent cells instead of opposite ends of the number line.
    raw_lon = F.floor((lon + F.lit(180.0)) / F.lit(lon_deg)).cast("long")
    return (
        F.floor(lat / F.lit(lat_deg)).cast("long"),
        ((raw_lon % n_lon) + n_lon) % n_lon,
    )


def within_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    *,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    suffix: str = "_r",
    max_abs_lat: float = 66.0,
    check_lat_bounds: bool = False,
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` — WITHOUT a cross
    join. Both sides are bucketed into grid cells at least one query
    radius wide; the right side is replicated into its 3×3 cell
    neighborhood so every true pair shares an equi-join key, then the
    exact haversine predicate filters the candidates. Cost is
    |cells touched| × local density, linear for bounded density —
    the plan survives a billion points where a cross join cannot.

    A longitude degree spans FEWER km at higher latitude
    (111.195·cos φ), i.e. a km radius spans MORE lon-degrees — sizing
    lon cells at the equator scale would MISS pairs away from it. Lon
    cells are therefore sized for the worst latitude the data may
    reach (``max_abs_lat``, default 66° ≈ the polar circles, a 2.5×
    widening); data beyond it loses recall — pass a larger bound, or
    ``check_lat_bounds=True`` to fail the job on the first
    out-of-bounds latitude instead of silently missing pairs (recall,
    never precision, is at stake). Lon cell indices wrap modulo the
    cell count, so pairs straddling the ±180° antimeridian share a
    join key like any other neighbors. Output: all left columns +
    right columns suffixed + ``dist_km``.
    """
    import math

    if not 0 < max_abs_lat < 90:
        raise ValueError("max_abs_lat must be in (0, 90)")
    # 1 degree latitude ≈ 111.195 km (2πR/360)
    lat_deg = radius_km / 111.195
    lon_deg = radius_km / (111.195 * math.cos(math.radians(max_abs_lat)))
    # Snap the lon cell width UP so cells tile 360° exactly — a ragged
    # seam cell narrower than one radius would break the "neighbors
    # are ±1 cell" invariant right at the antimeridian.
    n_lon = max(1, int(360.0 / lon_deg))
    lon_deg = 360.0 / n_lon
    # With <3 lon cells the ±1 neighborhood offsets alias each other
    # modulo n_lon and would duplicate candidate pairs.
    lon_offsets = [-1, 0, 1] if n_lon >= 3 else list(range(n_lon))

    def _checked(lat: Column) -> Column:
        if not check_lat_bounds:
            return lat
        return F.when(
            F.abs(lat) > F.lit(max_abs_lat),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"within_radius_join: |latitude| > max_abs_lat="
                        f"{max_abs_lat}; recall is not guaranteed — raise "
                        f"max_abs_lat or filter the input. Offending value: "
                    ),
                    lat.cast("string"),
                )
            ).cast("double"),
        ).otherwise(lat)

    lcell = _cell(
        _checked(F.col(lat_col)), F.col(lon_col), lat_deg, lon_deg, n_lon
    )
    lhs = left.withColumn("__cx", lcell[0]).withColumn("__cy", lcell[1])

    rcols = [F.col(c).alias(f"{c}{suffix}") for c in right.columns]
    rcell = _cell(
        _checked(F.col(f"{lat_col}{suffix}")),
        F.col(f"{lon_col}{suffix}"),
        lat_deg,
        lon_deg,
        n_lon,
    )
    rhs = (
        right.select(*rcols)
        .withColumn("__rcx", rcell[0])
        .withColumn("__rcy", rcell[1])
        .withColumn("__dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn(
            "__dy",
            F.explode(F.array(*[F.lit(d) for d in lon_offsets])),
        )
        .withColumn("__cx", F.col("__rcx") + F.col("__dx"))
        .withColumn(
            "__cy",
            ((F.col("__rcy") + F.col("__dy")) % n_lon + n_lon) % n_lon,
        )
        .drop("__rcx", "__rcy", "__dx", "__dy")
    )

    dist = haversine_km(
        F.col(lat_col),
        F.col(lon_col),
        F.col(f"{lat_col}{suffix}"),
        F.col(f"{lon_col}{suffix}"),
    )
    return (
        lhs.join(rhs, ["__cx", "__cy"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .drop("__cx", "__cy")
    )
