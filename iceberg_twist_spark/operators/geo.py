"""Geospatial enrichment — haversine distances, nearest-station
assignment, and bounding-box filtering.

The reference's deployment is literally a GPS-tracked drifting
iceberg: position fixes every 5 minutes, a GPS coordinate in every
broadcast (`iceberg-twist/notes.org:19,34`). Enriching telemetry with
"nearest station / inside region / distance travelled" is the natural
analytical surface over that data. The fixture has no coordinate
columns, so positions are derived deterministically from event ids
(pure modular arithmetic — identical on any engine), which keeps the
whole family oracle-checkable.

Scale notes: the station dimension is tiny by nature (thousands of
rows at most) → broadcast; nearest-station is broadcast-expand (×|dim|)
then a per-event WindowGroupLimit rank, so each partition emits one
row per event before any shuffle. Bounding-box filtering is a pure
row-local predicate — it pushes to the scan when coordinates are
materialized columns. Haversine is closed-form trig on doubles, fully
inside whole-stage codegen; no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_twist_spark.catalog import load_tables
from iceberg_twist_spark.common import duck_r4, r4
from iceberg_twist_spark.registry import register

EARTH_RADIUS_KM = 6371.0

# Reference stations (id, lat, lon) — a Greenland-ish coastal picket
# line, the deployment geography of the reference hardware.
STATIONS = (
    ("st_nuuk", 64.17, -51.74),
    ("st_ilulissat", 69.22, -51.10),
    ("st_tasiilaq", 65.61, -37.64),
    ("st_qaanaaq", 77.47, -69.23),
    ("st_narsaq", 60.91, -46.05),
)

# Deterministic synthetic position from the event id: latitude in
# [55, 80) (iceberg alley), longitude in [-75, -30).
_LAT_SQL = "(CAST(event_id * 13 % 2500 AS DOUBLE) / 100.0 + 55.0)"
_LON_SQL = "(CAST(event_id * 29 % 4500 AS DOUBLE) / 100.0 - 75.0)"


def _lat(col: Column) -> Column:
    return (col * 13 % 2500).cast("double") / 100.0 + 55.0


def _lon(col: Column) -> Column:
    return (col * 29 % 4500).cast("double") / 100.0 - 75.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, closed-form (no UDF)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return f"""(2.0 * {EARTH_RADIUS_KM} * asin(sqrt(
        pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)
        + cos(radians({lat1})) * cos(radians({lat2}))
          * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)
    )))"""


_STATIONS_SQL = "(VALUES " + ", ".join(
    f"('{s}', CAST({la} AS DOUBLE), CAST({lo} AS DOUBLE))" for s, la, lo in STATIONS
) + ") AS s(station_id, s_lat, s_lon)"

_NEAREST_ORACLE = f"""
WITH pos AS (
    SELECT event_id, user_id,
           {_LAT_SQL} AS lat, {_LON_SQL} AS lon
    FROM events
),
d AS (
    SELECT p.event_id, p.user_id, p.lat, p.lon, s.station_id,
           {duck_r4(_haversine_sql('p.lat', 'p.lon', 's.s_lat', 's.s_lon'))} AS dist_km
    FROM pos p CROSS JOIN {_STATIONS_SQL}
)
SELECT event_id, user_id, lat, lon, station_id, dist_km
FROM d
QUALIFY row_number() OVER (
    PARTITION BY event_id ORDER BY dist_km, station_id
) = 1
"""


# Grid cell size for the nearest-station candidate index. 5 degrees
# keeps the candidate map tiny (≤ a few thousand cells planet-wide)
# while the 2·circumradius pruning margin stays ~650 km at these
# latitudes — sharp enough to cut a real station dimension down to a
# handful of candidates per cell.
CELL_DEG = 5.0


@register("q_geo_nearest_station", oracle=_NEAREST_ORACLE, tags=("geo", "join", "window"))
def q_geo_nearest_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest reference station per event by haversine distance,
    via a grid-cell candidate index — never a position×station
    nested loop.

    Positions hash to 5° lat/lon cells. A cell→candidate-station map
    is built in-plan from the *distinct cells* (≤ dozens of rows) by
    exploding the static station list over them — a narrow row
    expansion, no join node — with exact triangle-inequality pruning:
    station ``s`` survives for cell ``c`` only if
    ``d(center_c, s) ≤ min_t d(center_c, t) + 2·R_c`` where ``R_c`` is
    the cell circumradius (max center→corner distance). Any station
    failing that bound is strictly farther than the cell's best for
    EVERY point in the cell, so pruning never changes the winner.
    Positions then equi-join the broadcast candidate map on the cell
    key, compute exact haversine only against candidates, and a
    per-event rank that WindowGroupLimit prunes map-side picks the
    winner. With |stations| in the thousands this is O(|events| ×
    candidates-per-cell), not O(|events| × |stations|). (With a
    station *table* instead of static config, the explode becomes a
    cells×stations shuffle-less broadcast join — cells stay tiny
    either way.)

    The rank orders on the *rounded* distance with a station-id
    tiebreak, so the winner is engine-independent.
    """
    events = load_tables(spark, sf_dir)["events"]
    station_arr = F.array(*[
        F.struct(
            F.lit(s).alias("station_id"),
            F.lit(float(la)).alias("s_lat"),
            F.lit(float(lo)).alias("s_lon"),
        )
        for s, la, lo in STATIONS
    ])
    cell = lambda c: F.floor(c / CELL_DEG).cast("int")  # noqa: E731
    pos = events.select(
        "event_id", "user_id",
        _lat(F.col("event_id")).alias("lat"),
        _lon(F.col("event_id")).alias("lon"),
    ).withColumns({"cell_lat": cell(F.col("lat")), "cell_lon": cell(F.col("lon"))})

    # Candidate map: distinct occupied cells (map-side combines to a
    # handful of rows) × the static station list via explode — a
    # narrow row expansion, never a nested-loop join node.
    cells = pos.select("cell_lat", "cell_lon").distinct()
    c_lat = (F.col("cell_lat") + 0.5) * CELL_DEG
    c_lon = (F.col("cell_lon") + 0.5) * CELL_DEG
    half = CELL_DEG / 2.0
    radius = F.greatest(*[
        haversine_km(c_lat, c_lon, c_lat + dla, c_lon + dlo)
        for dla in (-half, half) for dlo in (-half, half)
    ])
    pairs = (
        cells.select("cell_lat", "cell_lon", F.explode(station_arr).alias("st"))
        .select("cell_lat", "cell_lon", "st.station_id", "st.s_lat", "st.s_lon")
        .withColumn(
            "d_center",
            haversine_km(c_lat, c_lon, F.col("s_lat"), F.col("s_lon")),
        )
        .withColumn("r_cell", radius)
    )
    w_cell = Window.partitionBy("cell_lat", "cell_lon")
    cand = (
        pairs.withColumn("d_best", F.min("d_center").over(w_cell))
        .filter(F.col("d_center") <= F.col("d_best") + 2 * F.col("r_cell"))
        .select("cell_lat", "cell_lon", "station_id", "s_lat", "s_lon")
    )

    d = pos.join(F.broadcast(cand), ["cell_lat", "cell_lon"]).withColumn(
        "dist_km",
        r4(haversine_km(F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon"))),
    )
    w = Window.partitionBy("event_id").orderBy("dist_km", "station_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "lat", "lon", "station_id", "dist_km")
    )


# Disko Bay-ish analysis box + its center point.
BBOX = {"lat_min": 66.0, "lat_max": 72.0, "lon_min": -56.0, "lon_max": -48.0}
_C_LAT = (BBOX["lat_min"] + BBOX["lat_max"]) / 2
_C_LON = (BBOX["lon_min"] + BBOX["lon_max"]) / 2

_BBOX_ORACLE = f"""
WITH pos AS (
    SELECT event_id, user_id, value,
           {_LAT_SQL} AS lat, {_LON_SQL} AS lon
    FROM events
)
SELECT event_id, user_id, value, lat, lon,
       {duck_r4(_haversine_sql('lat', 'lon', str(_C_LAT), str(_C_LON)))} AS dist_center_km
FROM pos
WHERE lat BETWEEN {BBOX["lat_min"]} AND {BBOX["lat_max"]}
  AND lon BETWEEN {BBOX["lon_min"]} AND {BBOX["lon_max"]}
"""


@register("q_geo_bbox", oracle=_BBOX_ORACLE, tags=("geo", "filter"))
def q_geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box region filter + distance-to-center enrichment.

    The box predicate is row-local arithmetic — with materialized
    coordinate columns it pushes down to the scan (min/max pruning on
    parquet row groups / Iceberg partition bounds at scale)."""
    events = load_tables(spark, sf_dir)["events"]
    pos = events.select(
        "event_id", "user_id", "value",
        _lat(F.col("event_id")).alias("lat"),
        _lon(F.col("event_id")).alias("lon"),
    )
    return pos.filter(
        F.col("lat").between(BBOX["lat_min"], BBOX["lat_max"])
        & F.col("lon").between(BBOX["lon_min"], BBOX["lon_max"])
    ).withColumn(
        "dist_center_km",
        r4(haversine_km(F.col("lat"), F.col("lon"), F.lit(_C_LAT), F.lit(_C_LON))),
    )


_DRIFT_ORACLE = f"""
WITH pos AS (
    SELECT user_id, event_id,
           {_LAT_SQL} AS lat, {_LON_SQL} AS lon
    FROM events
),
hops AS (
    SELECT user_id, lat, lon,
           lag(lat) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_lat,
           lag(lon) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_lon
    FROM pos
)
SELECT user_id,
       CAST(count(prev_lat) AS BIGINT) AS n_hops,
       {duck_r4(f"sum({_haversine_sql('prev_lat', 'prev_lon', 'lat', 'lon')})")} AS track_km
FROM hops GROUP BY user_id
"""


@register("q_geo_track_length", oracle=_DRIFT_ORACLE, tags=("geo", "window", "agg"))
def q_geo_track_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor drift-track length: sum of consecutive-fix haversine
    hops (lag over event order) — the "how far did the iceberg drift"
    query. One shuffle on user_id shared by the lag window and the
    final aggregate."""
    events = load_tables(spark, sf_dir)["events"]
    pos = events.select(
        "user_id", "event_id",
        _lat(F.col("event_id")).alias("lat"),
        _lon(F.col("event_id")).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    hops = pos.select(
        "user_id", "lat", "lon",
        F.lag("lat").over(w).alias("prev_lat"),
        F.lag("lon").over(w).alias("prev_lon"),
    )
    return hops.groupBy("user_id").agg(
        F.count("prev_lat").cast("long").alias("n_hops"),
        r4(
            F.sum(
                haversine_km(
                    F.col("prev_lat"), F.col("prev_lon"), F.col("lat"), F.col("lon")
                )
            )
        ).alias("track_km"),
    )
