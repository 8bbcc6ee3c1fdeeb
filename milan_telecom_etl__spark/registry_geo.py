"""Registry entries: geometry operators (C6-C8) on a synthetic grid
derived from `part` (testdata has no geo tables; the derivation is
deterministic on both sides).

The UTM oracle SQL is *generated from the same Python constants* as the
Spark expression (operators/geo.py), so both engines evaluate the
identical Snyder series; results are rounded to 4 decimals (0.1 mm).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import geo as G
from .queries_registry import register
from .sources.parquet import load_table

# Synthetic grid: cell (lon0, lat0) square of 0.01° over the Milan area.
# ::DOUBLE — DuckDB round() yields DECIMAL, whose string form ("9.00")
# differs from Spark's double ("9.0").
_LON0 = "round(9.0 + (p_partkey % 50) * 0.01, 2)::DOUBLE"
_LAT0 = "round(45.3 + ((p_partkey // 50) % 50) * 0.01, 2)::DOUBLE"


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("cell_id"),
        F.round(9.0 + (F.col("p_partkey") % 50) * 0.01, 2).alias("lon0"),
        F.round(45.3 + ((F.col("p_partkey") / 50).cast("long") % 50) * 0.01, 2).alias("lat0"),
    )


@register(
    "grid_envelope",
    f"""
    WITH cells AS (
      SELECT p_partkey AS cell_id, {_LON0} AS lon0, {_LAT0} AS lat0 FROM part
    )
    SELECT cell_id,
           lon0 AS minx, lat0 AS miny,
           round(lon0 + 0.01, 2)::DOUBLE AS maxx, round(lat0 + 0.01, 2)::DOUBLE AS maxy,
           lon0::VARCHAR || ',' || lat0::VARCHAR || ',' ||
           round(lon0 + 0.01, 2)::DOUBLE::VARCHAR || ',' ||
           round(lat0 + 0.01, 2)::DOUBLE::VARCHAR AS bounds
    FROM cells
    """,
)
def q_grid_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: envelope + "minx,miny,maxx,maxy" bounds derivation
    (reference src/etl.py:39-42) over synthetic polygon cells, computed
    from the actual coordinate arrays via array folds."""
    cells = _cells(spark, sf_dir)
    # build the polygon coordinates array, then fold it back to an
    # envelope — exercising the real C7 path, not algebra on lon0/lat0
    lon1 = F.round(F.col("lon0") + 0.01, 2)
    lat1 = F.round(F.col("lat0") + 0.01, 2)
    ring = F.array(
        F.array(F.col("lon0"), F.col("lat0")),
        F.array(lon1, F.col("lat0")),
        F.array(lon1, lat1),
        F.array(F.col("lon0"), lat1),
        F.array(F.col("lon0"), F.col("lat0")),
    )
    with_coords = cells.select("cell_id", F.array(ring).alias("coordinates"))
    env = G.polygon_envelope(F.col("coordinates"))
    return with_coords.select(
        "cell_id",
        env["minx"].alias("minx"),
        env["miny"].alias("miny"),
        env["maxx"].alias("maxx"),
        env["maxy"].alias("maxy"),
        G.bounds_string(env).alias("bounds"),
    )


def _tm_sql(lon: str, lat: str) -> tuple[str, str]:
    """The Snyder forward series as DuckDB SQL, from the same constants."""
    lam0 = math.radians(G.UTM32_LON0_DEG)
    e2, ep2 = G._E2, G._EP2
    m0, m2, m4, m6 = G._M0, G._M2, G._M4, G._M6
    a, k0 = G.WGS84_A, G.UTM_K0
    lam = f"radians({lon})"
    phi = f"radians({lat})"
    n_rad = f"({a!r} / sqrt(1.0 - {e2!r} * sin({phi}) * sin({phi})))"
    t = f"(tan({phi}) * tan({phi}))"
    c = f"({ep2!r} * cos({phi}) * cos({phi}))"
    a_ = f"(({lam} - {lam0!r}) * cos({phi}))"
    m = (
        f"({a!r} * ({m0!r} * {phi} - {m2!r} * sin(2.0 * {phi})"
        f" + {m4!r} * sin(4.0 * {phi}) - {m6!r} * sin(6.0 * {phi})))"
    )
    x = (
        f"({k0!r} * {n_rad} * ({a_} + (1.0 - {t} + {c}) * {a_}^3 / 6.0"
        f" + (5.0 - 18.0 * {t} + {t} * {t} + 72.0 * {c} - 58.0 * {ep2!r})"
        f" * {a_}^5 / 120.0) + {G.UTM_FALSE_EASTING!r})"
    )
    y = (
        f"({k0!r} * ({m} + {n_rad} * tan({phi}) * ({a_}^2 / 2.0"
        f" + (5.0 - {t} + 9.0 * {c} + 4.0 * {c} * {c}) * {a_}^4 / 24.0"
        f" + (61.0 - 58.0 * {t} + {t} * {t} + 600.0 * {c} - 330.0 * {ep2!r})"
        f" * {a_}^6 / 720.0)) + {G.UTM_FALSE_NORTHING!r})"
    )
    return x, y


def _utm_sql() -> str:
    x, y = _tm_sql("lon0", "lat0")
    return f"""
    WITH cells AS (
      SELECT p_partkey AS cell_id, {_LON0} AS lon0, {_LAT0} AS lat0 FROM part
    )
    SELECT cell_id, round({x}, 4) AS easting, round({y}, 4) AS northing
    FROM cells
    """


@register("utm_reproject", _utm_sql())
def q_utm_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: EPSG:4326 → EPSG:32632 reprojection as a pure column
    expression (replaces pyproj/geopandas to_crs at reference
    src/etl.py:34-35) — identical Snyder series on both engines."""
    cells = _cells(spark, sf_dir)
    x, y = G.tm_forward_xy(F.col("lon0"), F.col("lat0"))
    return cells.select(
        "cell_id", F.round(x, 4).alias("easting"), F.round(y, 4).alias("northing")
    )


# ---------------------------------------------------------------------------
# Spatial join: point-in-polygon zone assignment (the PostGIS ST_Contains
# join of the reference — src/database.py GIST index — as pure folds).
# Vertex coordinates carry a 4th decimal chosen so no edge has a
# small-denominator rational slope: the cell centroids live on a
# 0.01° grid ending in .005, and a "nice" slope (e.g. exactly 4.0)
# makes edge/scanline intersections land EXACTLY on centroid
# coordinates, where the two engines' last-ulp can disagree.
# ---------------------------------------------------------------------------

_ZONES: list[tuple[int, list[tuple[float, float]]]] = [
    (1, [(9.0031, 45.3077), (9.2473, 45.3139), (9.1937, 45.4871), (9.0279, 45.4433), (9.0031, 45.3077)]),
    (2, [(9.2531, 45.3037), (9.4977, 45.3171), (9.4633, 45.5339), (9.2579, 45.4971), (9.2531, 45.3037)]),
    (3, [(9.0077, 45.4531), (9.1833, 45.4979), (9.2471, 45.7433), (9.0139, 45.6977), (9.0077, 45.4531)]),
    (4, [(9.2633, 45.5431), (9.4877, 45.5479), (9.4431, 45.7877), (9.2779, 45.7533), (9.2633, 45.5431)]),
]


def _zones_values_sql() -> str:
    rows = []
    for zid, ring in _ZONES:
        pts = ", ".join(f"[{x!r}, {y!r}]" for x, y in ring)
        rows.append(f"({zid}, [{pts}])")
    return ", ".join(rows)


@register(
    "spatial_join_zones",
    f"""
    WITH cells AS (
      SELECT p_partkey AS cell_id,
             {_LON0} + 0.005 AS px, {_LAT0} + 0.005 AS py
      FROM part
    ), zones(zone_id, ring) AS (VALUES {_zones_values_sql()}),
    hits AS (
      SELECT zone_id, px, py
      FROM cells, zones
      WHERE (len(list_filter(range(1, len(ring)), i ->
               ((ring[i][2] > py) <> (ring[i+1][2] > py)) AND
               (px < (ring[i+1][1] - ring[i][1]) * (py - ring[i][2])
                      / (ring[i+1][2] - ring[i][2]) + ring[i][1])
             )) % 2) = 1
    )
    SELECT zone_id, CAST(count(*) AS BIGINT) AS n_cells,
           round(min(px), 6) AS min_lon, round(max(py), 6) AS max_lat
    FROM hits GROUP BY zone_id
    """,
)
def q_spatial_join_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial join: assign each grid-cell centroid to the irregular
    polygon zone containing it — ray-casting crossing-number as a pure
    column fold (operators/geo.py point_in_ring), zones broadcast as
    literals. The Spark substitute for the reference's ST_Contains +
    GIST plan: at 100 TB you prefilter candidates by envelope (a range
    join on a Z-order/geohash key) and run this exact test on the
    survivors."""
    from .operators.geo import point_in_ring

    cells = _cells(spark, sf_dir).select(
        "cell_id",
        (F.col("lon0") + 0.005).alias("px"),
        (F.col("lat0") + 0.005).alias("py"),
    )
    zones = [
        F.struct(
            F.lit(zid).alias("zone_id"),
            F.array(*[F.array(F.lit(x), F.lit(y)) for x, y in ring]).alias("ring"),
        )
        for zid, ring in _ZONES
    ]
    z = F.explode(F.array(*zones)).alias("z")
    exploded = cells.select("cell_id", "px", "py", z).select(
        "cell_id", "px", "py", F.col("z.zone_id").alias("zone_id"), F.col("z.ring").alias("ring")
    )
    hits = exploded.filter(point_in_ring(F.col("px"), F.col("py"), F.col("ring")))
    return hits.groupBy("zone_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(F.min("px"), 6).alias("min_lon"),
        F.round(F.max("py"), 6).alias("max_lat"),
    )
