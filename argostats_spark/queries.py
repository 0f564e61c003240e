"""Query inventory — every operator from SURVEY.md §2 as a (Spark builder,
DuckDB oracle SQL) pair, exercised on the driver's testdata tables.

Each entry demonstrates one (or a cluster of) operator IDs from the
survey; the oracle SQL is the ANSI-SQL twin the driver runs in DuckDB at
sf0.01 and hash-compares. Cross-engine determinism rules used throughout:

- money/maths aggregates go through DECIMAL (exact, order-independent)
  and are cast to DOUBLE at the end, or are ROUND()ed after a double agg
  whose accumulation error is orders of magnitude below the rounding
  step;
- raw event timestamps have shipped as nanosecond INT64 and as µs
  TIMESTAMP (the loader branches on the stored dtype) — so timestamps
  are always truncated to seconds/hours (epoch BIGINT) or dates before
  being returned or used as ordering keys (ties broken by unique ids);
- hashes use md5 (present and identical in both engines); DuckDB lacks
  xxhash64/width_bucket, so fingerprints are md5-prefix 60-bit ints and
  histograms use floor();
- DuckDB sum(BIGINT) returns HUGEINT → always CAST ... AS BIGINT.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from .functions.arrays import cosine_similarity, dot_product, l2_norm
from .functions.geo import haversine_arg, haversine_km
from .functions.text import STOPWORDS, quality_score, tokens, word_ngrams
from .operators.spatial import kernel_weighted_mean

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


_PYFILES_SHIPPED: set[str] = set()


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the argostats_spark package to executor Python workers.

    The driver may import __spark_entry__ from an arbitrary cwd; the
    driver *process* gets sys.path patched, but executor Python workers
    spawn fresh and unpickle UDF closures by module reference — without
    this, every applyInPandas/mapInPandas query dies with
    ModuleNotFoundError. addPyFile of a package zip is the standard,
    cluster-safe fix (works identically on a real cluster)."""
    app_id = spark.sparkContext.applicationId
    if app_id in _PYFILES_SHIPPED:
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = tempfile.mkdtemp(prefix="argostats_pyfiles_")
    zip_base = os.path.join(staging, "argostats_spark_pkg")
    shutil.make_archive(zip_base, "zip", root_dir=os.path.dirname(pkg_dir),
                        base_dir="argostats_spark")
    spark.sparkContext.addPyFile(zip_base + ".zip")
    _PYFILES_SHIPPED.add(app_id)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_workers_can_import(spark)
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table, tolerant of how `ts` is physically encoded.

    The testdata generator has shipped two encodings: TIMESTAMP(NANOS)
    (which Spark's reader only accepts as raw INT64 via the legacy
    nanosAsLong conf) and plain TIMESTAMP(MICROS) without a timezone
    (read as TIMESTAMP_NTZ). Branch on the dtype actually stored so a
    testdata regeneration can't break every events query at once; either
    way downstream sees one canonical µs TimestampType column."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # pin UTC: ts becomes a zoned TimestampType, and the session TZ must
    # not shift year()/hour() vs the oracle's TZ-naive reading of the
    # same instants
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # exact integer division: long/long with `/` promotes to double,
        # and epoch nanoseconds (~1.7e18) exceed double's 2^53 exact
        # range — events within ~128 ns of a second boundary could land
        # in the wrong second vs the oracle's exact ns arithmetic
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        # naive µs values are the same UTC instants; the cast reads them
        # through the UTC-pinned session, so the resulting TimestampType
        # is value-identical to the legacy path
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def query(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


# =========================================================================
# Flagship: gridded kernel-weighted climatology (SURVEY §2.3 J2, §2.4
# A1-A3, §2.8 F2/F3) — the reference's atlas core (atlas.py:93-142)
# demonstrated on the customer table with deterministic synthetic
# coordinates, so DuckDB can brute-force the same θ-join.
# =========================================================================

_RESO = 10.0          # grid resolution, degrees
_SF = 1.0             # smoothing factor → kernel radius = 10° of arc
_THETA = math.sin(math.radians(_SF * _RESO) / 2.0) ** 2

_PTS_SQL = """
    SELECT CAST(((c_custkey * 37) % 360) - 180 + 0.5 AS DOUBLE) AS lon,
           CAST(((c_custkey * 53) % 160) - 80 + 0.5 AS DOUBLE) AS lat,
           c_acctbal AS val
    FROM customer
"""


def _synth_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        (F.pmod(F.col("c_custkey") * 37, F.lit(360)) - 180 + 0.5).cast("double").alias("lon"),
        (F.pmod(F.col("c_custkey") * 53, F.lit(160)) - 80 + 0.5).cast("double").alias("lat"),
        F.col("c_acctbal").alias("val"),
    )


def _grid(spark: SparkSession) -> DataFrame:
    lons = spark.range(36).select((F.col("id") * 10 - 175).cast("double").alias("glon"))
    lats = spark.range(16).select((F.col("id") * 10 - 75).cast("double").alias("glat"))
    return lons.crossJoin(lats)


@query(
    "clim_kernel_grid",
    f"""
    WITH pts AS ({_PTS_SQL}),
    grid AS (
      SELECT CAST(i * 10 - 175 AS DOUBLE) AS glon, CAST(j * 10 - 75 AS DOUBLE) AS glat
      FROM range(0, 36) t(i) CROSS JOIN range(0, 16) s(j)
    ),
    pairs AS (
      SELECT glon, glat, val,
             pow(sin(radians(lat - glat) / 2), 2)
             + cos(radians(glat)) * cos(radians(lat)) * pow(sin(radians(lon - glon) / 2), 2)
               AS hav
      FROM grid JOIN pts ON
             pow(sin(radians(lat - glat) / 2), 2)
             + cos(radians(glat)) * cos(radians(lat)) * pow(sin(radians(lon - glon) / 2), 2)
             <= {_THETA!r}
    )
    SELECT glon, glat,
           round(CAST(sum(exp(-hav / {_THETA!r}) * val) / sum(exp(-hav / {_THETA!r})) AS DOUBLE), 4)
             AS mean_val,
           count(*) AS n_points
    FROM pairs GROUP BY glon, glat
    """,
)
def q_clim_kernel_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 binned neighborhood join + A1-A3 kernel-weighted mean.

    Spark side uses the engine's adaptive-halo binned join
    (operators/spatial.py); the oracle brute-forces the θ-join — their
    equality is the correctness proof for the binning (SURVEY §7.4.1).
    """
    out = kernel_weighted_mean(
        _grid(spark), _synth_points(spark, sf_dir),
        value_cols=["val"], reso_deg=_RESO, smoothing_factor=_SF,
    )
    return out.select(
        "glon", "glat",
        F.round(F.col("mean_val").cast("double"), 4).alias("mean_val"),
        F.col("n_points").cast("long").alias("n_points"),
    )


# =========================================================================
# Relational core on the TPC-H-ish tables
# =========================================================================

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — groupBy + 8 aggregates (SURVEY §2.4 A1/A12;
    partial+final agg comes free from Spark, §2.4 'absent' note)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
             .cast("double").alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P3 projection + compound predicate; X2/X3: both the filter
    and the 5-column projection reach the parquet scan (pushdown)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")


@query(
    "compound_predicate",
    """
    SELECT user_id, count(*) AS n_errors,
           round(CAST(sum(value) AS DOUBLE), 3) AS sum_value
    FROM events
    WHERE event_type = 'error' AND value > 50
    GROUP BY user_id
    """,
)
def q_compound_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5 quality-style compound predicate + A12 per-group counts."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 50))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors"),
            F.round(F.sum("value").cast("double"), 3).alias("sum_value"),
        )
    )


@query(
    "scalar_suite",
    """
    SELECT 'dateparts' AS which,
           printf('%04d-%02d-%02d', year(ts), month(ts), dayofmonth(ts)) AS k1,
           printf('%03d-%02d', dayofyear(ts), hour(ts)) AS k2,
           count(*) AS n
    FROM events GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'strings' AS which,
           upper(substr(c_name, 1, 8)) AS k1,
           concat(CAST(length(c_name) AS VARCHAR), '#', c_mktsegment, '#',
                  CAST(c_nationkey AS VARCHAR)) AS k2,
           count(*) AS n
    FROM customer
    WHERE c_name LIKE '%er#%' OR c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY 1, 2, 3
    UNION ALL
    SELECT 'nulls' AS which, status AS k1,
           concat(CAST(n_big AS VARCHAR), '#', CAST(n_not_urgent AS VARCHAR)) AS k2,
           n
    FROM (
      SELECT coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status,
             CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
             count(nullif(o_orderpriority, '1-URGENT')) AS n_not_urgent,
             count(*) AS n
      FROM orders GROUP BY 1
    )
    """,
)
def q_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function suite, one tagged union over three demos (merged
    from the former ``dateparts`` / ``string_functions`` /
    ``null_handling`` queries so every registry entry fits in the
    driver's 50-query correctness window):

    - ``dateparts`` — F1 date-part extraction (reference's hand-rolled
      tools/datetools.py:7-62 as built-ins), parts formatted with
      printf-style format strings (identical in both engines);
    - ``strings`` — LIKE / IN predicates, upper/substr/length/concat
      (the reference encodes strings away at ingest; Spark keeps the
      full string library);
    - ``nulls`` — nullif/coalesce/conditional counting: real NULL
      semantics replacing the reference's sentinel encodings
      (SURVEY §1.2).
    """
    ev = _t(spark, sf_dir, "events")
    dateparts = (
        ev.groupBy(
            F.format_string(
                "%04d-%02d-%02d", F.year("ts"), F.month("ts"), F.dayofmonth("ts")
            ).alias("k1"),
            F.format_string("%03d-%02d", F.dayofyear("ts"), F.hour("ts")).alias("k2"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("dateparts").alias("which"), "k1", "k2", "n")
    )

    c = _t(spark, sf_dir, "customer")
    strings = (
        c.filter(
            F.col("c_name").like("%er#%")
            | F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        )
        .groupBy(
            F.upper(F.substring("c_name", 1, 8)).alias("k1"),
            F.concat(
                F.length("c_name").cast("string"), F.lit("#"),
                F.col("c_mktsegment"), F.lit("#"),
                F.col("c_nationkey").cast("string"),
            ).alias("k2"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("strings").alias("which"), "k1", "k2", "n")
    )

    o = _t(spark, sf_dir, "orders")
    nulls = (
        o.groupBy(
            F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias("k1")
        )
        .agg(
            F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0))
            .cast("long").alias("n_big"),
            F.count(F.nullif("o_orderpriority", F.lit("1-URGENT"))).alias("n_not_urgent"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.lit("nulls").alias("which"), "k1",
            F.concat(
                F.col("n_big").cast("string"), F.lit("#"),
                F.col("n_not_urgent").cast("string"),
            ).alias("k2"),
            "n",
        )
    )
    return dateparts.unionByName(strings).unionByName(nulls)


@query(
    "haversine",
    f"""
    WITH pts AS ({_PTS_SQL})
    SELECT lon, lat,
           round(2 * 6371.0 * asin(sqrt(
             pow(sin(radians(0 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(0)) * pow(sin(radians(0 - lon) / 2), 2)
           )), 3) AS dist_km
    FROM pts
    """,
)
def q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 haversine as a pure column expression (reference atlas.py:48-63)
    — whole-stage-codegen'd, no UDF."""
    pts = _synth_points(spark, sf_dir)
    return pts.select(
        "lon", "lat",
        F.round(haversine_km("lon", "lat", F.lit(0.0), F.lit(0.0)), 3).alias("dist_km"),
    )


@query(
    "join_multiway",
    """
    SELECT r_name, n_name,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 equi-join chain with broadcast dimension tables (J4 pattern):
    nation/region are tiny → broadcast, no shuffle on the fact side
    beyond the final aggregation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
    )


@query(
    "join_variants",
    """
    SELECT 'semi' AS variant, CAST(c_custkey AS BIGINT) AS custkey, c_name AS str_val,
           CAST(NULL AS BIGINT) AS num_a, CAST(NULL AS DOUBLE) AS num_b
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    UNION ALL
    SELECT 'anti', CAST(c_custkey AS BIGINT), c_mktsegment,
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'left_outer', CAST(c_custkey AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(count(o_orderkey) AS BIGINT),
           CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    UNION ALL
    SELECT 'full_outer', CAST(coalesce(b.ck, e.ck) AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(coalesce(n_orders, 0) AS BIGINT),
           CAST(coalesce(n_events, 0) AS DOUBLE)
    FROM (SELECT o_custkey AS ck, count(*) AS n_orders FROM orders GROUP BY o_custkey) b
    FULL OUTER JOIN
         (SELECT user_id % 1500 AS ck, count(*) AS n_events FROM events GROUP BY 1) e
    ON b.ck = e.ck
    """,
)
def q_join_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-variant suite, one tagged union over the four join types the
    reference lacks entirely (SURVEY §2.3 'absent'; merged from the
    former ``join_semi`` / ``join_anti`` / ``join_outer`` /
    ``join_full_outer`` queries to fit the driver's 50-query window):

    - ``semi`` — customers with a >200k order (left-semi);
    - ``anti`` — customers with no orders (left-anti);
    - ``left_outer`` — per-customer order counts keeping zero-order
      customers;
    - ``full_outer`` — buyers ⟗ event users on a synthetic shared key.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    ck = F.col("c_custkey").cast("long")
    null_a = F.lit(None).cast("long")
    null_b = F.lit(None).cast("double")

    semi = (
        c.join(o.filter(F.col("o_totalprice") > 200000),
               c.c_custkey == o.o_custkey, "left_semi")
        .select(F.lit("semi").alias("variant"), ck.alias("custkey"),
                F.col("c_name").alias("str_val"),
                null_a.alias("num_a"), null_b.alias("num_b"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("variant"), ck.alias("custkey"),
                F.col("c_mktsegment").alias("str_val"),
                null_a.alias("num_a"), null_b.alias("num_b"))
    )
    left_outer = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                F.lit(0).cast("decimal(18,2)"),
            ).cast("double").alias("total"),
        )
        .select(F.lit("left_outer").alias("variant"), ck.alias("custkey"),
                F.lit(None).cast("string").alias("str_val"),
                F.col("n_orders").alias("num_a"), F.col("total").alias("num_b"))
    )
    buyers = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    eventers = ev.groupBy((F.col("user_id") % 1500).alias("ck")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    full_outer = (
        buyers.join(eventers, buyers.ck == eventers.ck, "full_outer")
        .select(
            F.lit("full_outer").alias("variant"),
            F.coalesce(buyers.ck, eventers.ck).cast("long").alias("custkey"),
            F.lit(None).cast("string").alias("str_val"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("num_a"),
            F.coalesce("n_events", F.lit(0)).cast("double").alias("num_b"),
        )
    )
    return semi.unionByName(anti).unionByName(left_outer).unionByName(full_outer)


@query(
    "join_range_bands",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0.0, 50000.0), ('medium', 50000.0, 150000.0),
             ('large', 150000.0, 1000000000.0)
    )
    SELECT band, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def q_join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) θ-join against a broadcast band table — the
    non-spatial cousin of J2."""
    o = _t(spark, sf_dir, "orders")
    bands = F.broadcast(
        spark.createDataFrame(
            [("small", 0.0, 50000.0), ("medium", 50000.0, 150000.0),
             ("large", 150000.0, 1e9)],
            "band string, lo double, hi double",
        )
    )
    return (
        o.join(bands, (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@query(
    "join_asof",
    """
    SELECT e.event_id,
           e.user_id,
           CAST(epoch(date_trunc('second', max(c.ts))) AS BIGINT) AS last_click_s
    FROM events e JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.user_id
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (absent from the reference): for each error event the
    most recent click by the same user. Expressed as a range join +
    max-aggregate; the streaming module has the stateful variant."""
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("e_ts")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return (
        err.join(clk, (err.user_id == clk.c_user) & (clk.c_ts <= err.e_ts))
        .groupBy("event_id", "user_id")
        .agg(F.unix_timestamp(F.max("c_ts")).alias("last_click_s"))
    )


@query(
    "dict_encode",
    """
    SELECT event_type,
           CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1 WHEN 'purchase' THEN 2
                           WHEN 'signup' THEN 3 WHEN 'error' THEN 4 ELSE -1 END AS type_code,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_dict_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/F11 dictionary encoding — the reference's string→int8 encoders
    (toctools.py:195-196) as a broadcast-joined dimension table."""
    ev = _t(spark, sf_dir, "events")
    dim = F.broadcast(
        spark.createDataFrame(
            [("click", 0), ("view", 1), ("purchase", 2), ("signup", 3), ("error", 4)],
            "event_type string, type_code int",
        )
    )
    return (
        ev.join(dim, "event_type", "left")
        .withColumn("type_code", F.coalesce("type_code", F.lit(-1)))
        .groupBy("event_type", "type_code")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# =========================================================================
# Window functions (SURVEY §2.5 W1-W4)
# =========================================================================

@query(
    "window_suite",
    """
    SELECT 'first_order' AS which, CAST(c_custkey AS BIGINT) AS k1,
           CAST(o_orderkey AS BIGINT) AS k2,
           strftime(o_orderdate, '%Y-%m-%d') AS sval, CAST(NULL AS DOUBLE) AS nval
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    UNION ALL
    SELECT 'lag_gap', CAST(user_id AS BIGINT), CAST(event_id AS BIGINT),
           CAST(NULL AS VARCHAR),
           CAST(ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
                AS DOUBLE)
    FROM (
      SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
      FROM events
    )
    UNION ALL
    SELECT 'cumsum', CAST(o_custkey AS BIGINT), CAST(o_orderkey AS BIGINT),
           CAST(NULL AS VARCHAR),
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
    FROM orders
    """,
)
def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function suite, one tagged union over three demos (merged
    from the former ``window_row_number`` / ``window_lag_gap`` /
    ``window_cumsum`` queries to fit the driver's 50-query window):

    - ``first_order`` — W1/W2/A6 per-group row numbering + group-wise
      first (the reference's IPROF assignment, toctools.py:175);
    - ``lag_gap`` — W3 lag over an event-time window, seconds between
      consecutive events per user (ordering key is second-truncated
      ts + unique id so both engines sort identically despite the
      ns/µs precision gap);
    - ``cumsum`` — W4 running total (the reference's np.cumsum over
      depth, atlas.py:323-324) as a running-window aggregate.
    """
    o = _t(spark, sf_dir, "orders")
    null_s = F.lit(None).cast("string")
    null_n = F.lit(None).cast("double")

    w1 = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    first_order = (
        o.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            F.lit("first_order").alias("which"),
            F.col("o_custkey").cast("long").alias("k1"),
            F.col("o_orderkey").cast("long").alias("k2"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("sval"),
            null_n.alias("nval"),
        )
    )

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_s")
    )
    w2 = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    lag_gap = ev.select(
        F.lit("lag_gap").alias("which"),
        F.col("user_id").cast("long").alias("k1"),
        F.col("event_id").cast("long").alias("k2"),
        null_s.alias("sval"),
        (F.col("ts_s") - F.lag("ts_s").over(w2)).cast("double").alias("nval"),
    )

    w3 = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cumsum = o.select(
        F.lit("cumsum").alias("which"),
        F.col("o_custkey").cast("long").alias("k1"),
        F.col("o_orderkey").cast("long").alias("k2"),
        null_s.alias("sval"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w3).cast("double"), 2)
         .alias("nval"),
    )
    return first_order.unionByName(lag_gap).unionByName(cumsum)


@query(
    "sessionize",
    """
    WITH e AS (
      SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts_s,
             CASE WHEN ts_s - lag(ts_s) OVER w > 3600 OR lag(ts_s) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ),
    sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_s
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (lag + cumulative sum over gaps > 1h) — the batch
    twin of the streaming session window; a pattern the reference lacks
    entirely (SURVEY §2.9)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_s")
    )
    w = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    run = W.partitionBy("user_id").orderBy("ts_s").rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            (F.col("ts_s") - F.lag("ts_s").over(w) > 3600) | F.lag("ts_s").over(w).isNull(),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(run).cast("long"))
    return sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))


# =========================================================================
# Sorts / limits / top-k (SURVEY §2.6) and set ops (§2.7)
# =========================================================================

@query(
    "topk_suite",
    """
    SELECT 'global' AS which, CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice
          FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20)
    UNION ALL
    SELECT 'per_group', CAST(o_custkey AS BIGINT), CAST(o_orderkey AS BIGINT),
           CAST(o_totalprice AS DOUBLE)
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k suite (merged ``topk_orders`` + ``topk_per_group``):

    - ``global`` — ORDER BY + LIMIT 20, planned as TakeOrderedAndProject
      (no full sort materialization at scale; unique tie-break key keeps
      both engines deterministic);
    - ``per_group`` — per-customer top-3 via ranking window.
    """
    o = _t(spark, sf_dir, "orders")
    top_global = (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select(
            F.lit("global").alias("which"),
            F.col("o_custkey").cast("long"),
            F.col("o_orderkey").cast("long"),
            F.col("o_totalprice").cast("double"),
        )
    )
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    per_group = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.lit("per_group").alias("which"),
            F.col("o_custkey").cast("long"),
            F.col("o_orderkey").cast("long"),
            F.col("o_totalprice").cast("double"),
        )
    )
    return top_global.unionByName(per_group)


@query(
    "set_ops",
    """
    SELECT 'union_all' AS op, CAST(event_id AS BIGINT) AS k1,
           CAST(user_id AS BIGINT) AS k2, tag
    FROM (
      SELECT event_id, user_id, 'err' AS tag FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT event_id, user_id, 'buy' AS tag FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'intersect', CAST(custkey AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
    FROM (
      SELECT o_custkey AS custkey FROM orders JOIN customer ON c_custkey = o_custkey
      WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    )
    UNION ALL
    SELECT 'except', CAST(custkey AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
    FROM (
      SELECT c_custkey AS custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation suite (merged ``union_all`` / ``set_intersect`` /
    ``set_except``):

    - ``union_all`` — U1: the reference's pd.concat of per-WMO frames
      (toctools.py:145) as a proper distributed union;
    - ``intersect`` — BUILDING-segment buyers ∩ big-ticket buyers
      (absent from the reference, free in Spark);
    - ``except`` — customers minus those with finished orders
      (distinct semantics, Spark ``subtract``).
    """
    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    null_k = F.lit(None).cast("long")
    null_s = F.lit(None).cast("string")

    errs = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.lit("err").alias("tag")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.lit("buy").alias("tag")
    )
    union_all = errs.unionByName(buys).select(
        F.lit("union_all").alias("op"),
        F.col("event_id").cast("long").alias("k1"),
        F.col("user_id").cast("long").alias("k2"),
        "tag",
    )

    ia = o.join(c, o.o_custkey == c.c_custkey).filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("o_custkey").alias("custkey"))
    ib = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    intersect = ia.intersect(ib).select(
        F.lit("intersect").alias("op"),
        F.col("custkey").cast("long").alias("k1"),
        null_k.alias("k2"), null_s.alias("tag"),
    )

    ea = c.select(F.col("c_custkey").alias("custkey"))
    eb = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract == EXCEPT (distinct semantics)
    excpt = ea.subtract(eb).select(
        F.lit("except").alias("op"),
        F.col("custkey").cast("long").alias("k1"),
        null_k.alias("k2"), null_s.alias("tag"),
    )
    return union_all.unionByName(intersect).unionByName(excpt)


# =========================================================================
# Aggregations (SURVEY §2.4) beyond Q1
# =========================================================================

@query(
    "distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 distinct."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "histograms",
    """
    SELECT 'year' AS which, CAST(year(o_orderdate) AS BIGINT) AS bucket, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1, 2
    UNION ALL
    SELECT 'value', CAST(floor(l_quantity / 5) AS BIGINT), count(*),
           CAST(NULL AS DOUBLE)
    FROM lineitem GROUP BY 1, 2
    """,
)
def q_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 histogram suite (merged ``year_histogram`` + ``value_histogram``):

    - ``year`` — count-per-year histogram, the reference's np.histogram
      over profile years (README.md:60-65), plus per-year revenue;
    - ``value`` — fixed-bin histogram via floor(x/w) (DuckDB lacks
      width_bucket, so the bin rule is the shared floor form).
    """
    o = _t(spark, sf_dir, "orders")
    year = o.groupBy(F.year("o_orderdate").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    ).select(F.lit("year").alias("which"), "bucket", "n", "total")
    li = _t(spark, sf_dir, "lineitem")
    value = li.groupBy(
        F.floor(F.col("l_quantity") / 5).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("value").alias("which"), "bucket", "n",
        F.lit(None).cast("double").alias("total"),
    )
    return year.unionByName(value)


@query(
    "stats_suite",
    """
    WITH mm AS (
      SELECT strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
             strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship,
             min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
             count(*) AS n, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem
    ),
    st AS (
      SELECT l_returnflag,
             round(CAST(stddev_samp(l_quantity) AS DOUBLE), 4) AS sd_qty,
             round(CAST(var_samp(l_discount) AS DOUBLE), 6) AS var_disc,
             round(CAST(corr(l_quantity, l_extendedprice) AS DOUBLE), 5) AS corr_qty_price,
             round(CAST(covar_samp(l_quantity, l_discount) AS DOUBLE), 5) AS cov_qty_disc
      FROM lineitem GROUP BY l_returnflag
    ),
    qt AS (
      SELECT event_type,
             round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS median_value,
             round(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS p90_value
      FROM events GROUP BY event_type
    )
    SELECT 'minmax' AS which, 'all' AS grp, 'min_ship' AS stat,
           min_ship AS sval, CAST(NULL AS DOUBLE) AS nval FROM mm
    UNION ALL SELECT 'minmax', 'all', 'max_ship', max_ship, CAST(NULL AS DOUBLE) FROM mm
    UNION ALL SELECT 'minmax', 'all', 'min_price', CAST(NULL AS VARCHAR),
                     CAST(min_price AS DOUBLE) FROM mm
    UNION ALL SELECT 'minmax', 'all', 'max_price', CAST(NULL AS VARCHAR),
                     CAST(max_price AS DOUBLE) FROM mm
    UNION ALL SELECT 'minmax', 'all', 'n', CAST(NULL AS VARCHAR),
                     CAST(n AS DOUBLE) FROM mm
    UNION ALL SELECT 'minmax', 'all', 'n_orders', CAST(NULL AS VARCHAR),
                     CAST(n_orders AS DOUBLE) FROM mm
    UNION ALL SELECT 'stats', l_returnflag, 'sd_qty', CAST(NULL AS VARCHAR), sd_qty FROM st
    UNION ALL SELECT 'stats', l_returnflag, 'var_disc', CAST(NULL AS VARCHAR), var_disc FROM st
    UNION ALL SELECT 'stats', l_returnflag, 'corr_qty_price', CAST(NULL AS VARCHAR),
                     corr_qty_price FROM st
    UNION ALL SELECT 'stats', l_returnflag, 'cov_qty_disc', CAST(NULL AS VARCHAR),
                     cov_qty_disc FROM st
    UNION ALL SELECT 'quantile', event_type, 'median_value', CAST(NULL AS VARCHAR),
                     median_value FROM qt
    UNION ALL SELECT 'quantile', event_type, 'p90_value', CAST(NULL AS VARCHAR),
                     p90_value FROM qt
    """,
)
def q_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics suite, melted to (which, grp, stat, sval, nval) rows
    (merged ``minmax_stats`` / ``stats_aggregates`` / ``exact_median``):

    - ``minmax`` — A10 min/max + A7 distinct count in one global
      aggregate over lineitem;
    - ``stats`` — stddev/variance/correlation/covariance per return
      flag (absent from the reference, free in Spark; both engines use
      the same sample definitions);
    - ``quantile`` — exact interpolated median/p90 per event type:
      Spark ``percentile`` == DuckDB ``quantile_cont`` (both linear
      interpolation); the approx variant exists in the API but has no
      cross-engine oracle, so the exact form is the one verified.

    Each sub-result melts via ``stack`` (one generator per select) —
    the aggregates themselves run once, not once per melted row.
    """
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")

    mm = li.agg(
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    mm_melt = mm.select(
        F.lit("minmax").alias("which"), F.lit("all").alias("grp"),
        F.expr(
            "stack(6,"
            " 'min_ship', min_ship, CAST(NULL AS DOUBLE),"
            " 'max_ship', max_ship, CAST(NULL AS DOUBLE),"
            " 'min_price', CAST(NULL AS STRING), CAST(min_price AS DOUBLE),"
            " 'max_price', CAST(NULL AS STRING), CAST(max_price AS DOUBLE),"
            " 'n', CAST(NULL AS STRING), CAST(n AS DOUBLE),"
            " 'n_orders', CAST(NULL AS STRING), CAST(n_orders AS DOUBLE)"
            ") AS (stat, sval, nval)"
        ),
    )

    st = li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 5).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 5).alias("cov_qty_disc"),
    )
    st_melt = st.select(
        F.lit("stats").alias("which"), F.col("l_returnflag").alias("grp"),
        F.expr(
            "stack(4,"
            " 'sd_qty', CAST(NULL AS STRING), sd_qty,"
            " 'var_disc', CAST(NULL AS STRING), var_disc,"
            " 'corr_qty_price', CAST(NULL AS STRING), corr_qty_price,"
            " 'cov_qty_disc', CAST(NULL AS STRING), cov_qty_disc"
            ") AS (stat, sval, nval)"
        ),
    )

    qt = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("median_value"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90_value"),
    )
    qt_melt = qt.select(
        F.lit("quantile").alias("which"), F.col("event_type").alias("grp"),
        F.expr(
            "stack(2,"
            " 'median_value', CAST(NULL AS STRING), median_value,"
            " 'p90_value', CAST(NULL AS STRING), p90_value"
            ") AS (stat, sval, nval)"
        ),
    )
    return mm_melt.unionByName(st_melt).unionByName(qt_melt)


@query(
    "group_count",
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
)
def q_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 counts per group."""
    return _t(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "rollup_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent from the reference; SURVEY §2.4)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cube_counts",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@query(
    "json_extract",
    """
    SELECT event_type,
           CAST(sum(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT)
             AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction (F15 modernized): pull a field out of
    the JSON props string with a shared regex (engine-neutral)."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1).try_cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


@query(
    "pivot_status_by_year",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS year,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
    FROM orders GROUP BY 1
    """,
)
def q_pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) — Spark's pivot() vs conditional-sum SQL."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy(F.year("o_orderdate").alias("year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return p.select(
        "year",
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_pending"),
    )


@query(
    "events_hourly_window",
    """
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s, event_type,
           count(*) AS n, round(CAST(sum(value) AS DOUBLE), 3) AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def q_events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time window (batch twin of the streaming ingest,
    SURVEY §2.9): Spark's window() operator; epoch-aligned 1h tumbles
    equal date_trunc('hour')."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value").cast("double"), 3).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_s"),
            "event_type", "n", "sum_value", "n_users",
        )
    )


# =========================================================================
# Text analysis on documents (training-data pipeline surface)
# =========================================================================

_TOKS_SQL = r"string_split_regex(trim(lower(text)), '\s+')"


@query(
    "text_suite",
    rf"""
    WITH t AS (
      SELECT doc_id, lang, text,
             {_TOKS_SQL} AS ltoks,
             CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_tok,
             CAST(length(text) AS DOUBLE) AS n_chr,
             CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
               AS n_punct,
             trim(regexp_replace(
               regexp_replace(lower(text), '[\x00-\x1f\x7f]', ' ', 'g'),
               '\s+', ' ', 'g')) AS norm
      FROM documents
    ),
    s AS (
      SELECT *,
             len(list_filter(ltoks, x -> x IN ('the','and','of','to','is'))) AS s_en,
             len(list_filter(ltoks, x -> x IN ('der','die','und','ist','das'))) AS s_de,
             len(list_filter(ltoks, x -> x IN ('le','la','et','est','les'))) AS s_fr,
             len(list_filter(ltoks, x -> x IN ('el','la','que','es','los'))) AS s_es
      FROM t
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           CAST(len(ltoks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(ltoks)) AS BIGINT) AS n_unique,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           round(
             least(n_tok / 20.0, 1.0) * 0.4
             + (CASE WHEN n_tok > 0 AND n_chr / n_tok >= 3.0 AND n_chr / n_tok <= 12.0
                     THEN 1.0 ELSE 0.5 END) * 0.3
             + (1.0 - least((CASE WHEN n_chr > 0 THEN n_punct / n_chr ELSE 0.0 END) * 4.0, 1.0))
               * 0.3,
           6) AS quality,
           ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp60,
           ('0x' || substr(md5(text), 1, 15))::BIGINT % 64 AS shard,
           CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS pred,
           md5(norm) AS norm_hash,
           CAST(length(norm) AS BIGINT) AS norm_len
    FROM s
    """,
)
def q_text_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis suite: ONE scan of the documents table computing
    every per-document text operator as a wide row (merged from the
    former ``text_token_stats`` / ``text_quality`` / ``text_langid`` /
    ``text_fingerprint`` / ``text_normalize`` queries — a single-pass
    plan a real curation pipeline would run, and one registry slot in
    the driver's 50-query correctness window):

    - token counting (whitespace tokenizer): n_tokens / n_unique /
      n_chars_actual;
    - quality scoring (length / punctuation / word-shape ratios),
      rounded to 6 decimals (functions/text.quality_score);
    - 60-bit md5-prefix fingerprint + shard assignment (md5 is the one
      hash both engines share; the engine also exposes xxhash64 where
      no oracle is needed);
    - language-ID stopword vote (argmax, ties to the earlier language
      in STOPWORDS order) returned per-document beside the true lang
      label;
    - canonical normalization (control-strip, lower, whitespace
      collapse, trim) verified as md5 + length so the full normalized
      text is checked without shipping it. Control-strip and lower()
      commute (control chars are caseless), so normalize_text == the
      oracle's lower-first expression.

    All columns are built-in column expressions — JVM-side, one
    whole-stage-codegen span, no Python in the path.
    """
    from .functions.text import normalize_text

    d = _t(spark, sf_dir, "documents")
    toks_lower = tokens(F.lower(F.col("text")))
    toks_li = F.transform(tokens(F.col("text")), lambda t: F.lower(t))

    def vote(words: list[str]):
        def is_marker(t):
            out = F.lit(False)
            for w in words:
                out = out | (t == F.lit(w))
            return out

        return F.size(F.filter(toks_li, is_marker))

    pred = F.lit("und")
    best = F.lit(0)
    for lang, words in STOPWORDS.items():
        s = vote(words)
        pred = F.when(s > best, F.lit(lang)).otherwise(pred)
        best = F.greatest(best, s)

    fp = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
    norm = normalize_text("text")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.size(toks_lower).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks_lower)).cast("long").alias("n_unique"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.round(quality_score("text"), 6).alias("quality"),
        fp.alias("fp60"),
        (fp % 64).alias("shard"),
        pred.alias("pred"),
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("long").alias("norm_len"),
    )


@query(
    "binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest
    FROM documents
    """,
)
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payload + typed metadata
    (byte length, content digest). The decode/feature-extract stage is
    operators/multimodal.py (Pandas-UDF, stubbed decode)."""
    d = _t(spark, sf_dir, "documents")
    b = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("digest"),
    )


# =========================================================================
# Deduplication family on documents
# =========================================================================

@query(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, count(*) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS keep_id
    FROM documents GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy, keep lowest id (dedup operator #1)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").cast("long").alias("keep_id"),
    )


_SHINGLES_SQL = r"""
      SELECT doc_id, lang,
             list_distinct(
               list_transform(
                 range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 2, 0) + 1),
                 i -> array_to_string(
                        list_slice(string_split_regex(trim(lower(text)), '\s+'), i, i + 2), ' ')
               )
             ) AS sh
      FROM documents
"""


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH d AS ({_SHINGLES_SQL})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
    FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.04
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs (dedup operator #4): word-3-gram
    shingle sets, same-language blocking, |∩|/|∪| >= 0.04."""
    d = _t(spark, sf_dir, "documents")
    sh = F.array_distinct(word_ngrams("text", 3))
    docs = d.select("doc_id", "lang", sh.alias("sh"))
    a = docs.alias("a")
    b = docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter.cast("double") / union
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jac.alias("jac_raw"),
        )
        .filter(F.col("jac_raw") >= 0.04)
        .select("id_a", "id_b", F.round("jac_raw", 6).alias("jaccard"))
    )


_SH_EXPR = (
    r"list_distinct(list_transform("
    r"range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 2, 0) + 1), "
    r"i -> array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), i, i + 2),"
    r" ' ')))"
)

_MINHASH_SQL = f"""
      SELECT doc_id,
             {_SH_EXPR} AS sh,
             list_aggregate(list_transform({_SH_EXPR}, t -> md5('s1|' || t)), 'min') AS mh1,
             list_aggregate(list_transform({_SH_EXPR}, t -> md5('s2|' || t)), 'min') AS mh2
      FROM documents
"""


@query(
    "dedup_minhash_lsh",
    f"""
    WITH d AS ({_MINHASH_SQL})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
             AS jaccard
    FROM d a JOIN d b ON a.mh1 = b.mh1 AND a.mh2 = b.mh2 AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup (dedup operator #2): word-3-gram shingle
    minhash signatures (min of salted md5 — identical hash family in
    both engines), one band of two rows as the LSH bucket key,
    candidates verified by exact shingle Jaccard >= 0.6.

    Scale shape: the bucket equi-join replaces the O(n²) pair space —
    at 100 TB the band key is the shuffle key and verification touches
    only candidates. Shingles (not raw tokens) keep the hash space
    large enough that buckets stay small under a tiny vocabulary."""
    d = _t(spark, sf_dir, "documents")

    # Everything codegen, no arrays, no Python: shingles via
    # posexplode + lead() window (interpreted higher-order functions
    # measured 8x slower building the same shingles), signatures as
    # partial-aggregate min(md5), and Jaccard verification as exploded
    # equi-joins restricted to candidate pairs — |∩| is a count, |∪| is
    # n_a + n_b − |∩|, so shingle payloads never travel with a pair.
    # Shingles with ZERO extra shuffles: slice the token array by 1 and
    # 2, arrays_zip, explode — all codegen (the posexplode+lead()-window
    # form costs a full shuffle+sort by doc_id; the interpreted-HOF form
    # measured 8x slower still). Duplicates survive here: min(md5) over
    # a multiset equals min over its set, so signatures don't need
    # distinct — only verification does, and that dedups candidates only.
    tk = d.select("doc_id", tokens(F.lower(F.col("text"))).alias("tk"))
    sh_raw = (
        tk.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.col("tk").alias("t0"),
                    F.slice("tk", 2, F.size("tk")).alias("t1"),
                    F.slice("tk", 3, F.size("tk")).alias("t2"),
                )
            ).alias("z"),
        )
        .filter(F.col("z.t2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "z.t0", "z.t1", "z.t2").alias("g"))
    )
    # ONE shuffle over the full shingle stream: distinct count + both
    # band mins in a single grouped aggregate (Catalyst plans the mixed
    # distinct/non-distinct agg as one exchange with an Expand).
    stats = sh_raw.groupBy("doc_id").agg(
        F.count_distinct("g").alias("n_sh"),
        F.min(F.md5(F.concat(F.lit("s1|"), F.col("g")))).alias("mh1"),
        F.min(F.md5(F.concat(F.lit("s2|"), F.col("g")))).alias("mh2"),
    )
    a, b = stats.alias("a"), stats.alias("b")
    # candidates are tiny by LSH construction — materialize once
    # (localCheckpoint) so the expensive stats agg isn't re-derived for
    # every downstream reference (lineage reuse, not data reuse, was
    # measured to re-run the whole subtree per reference)
    cand = a.join(
        b,
        (F.col("a.mh1") == F.col("b.mh1"))
        & (F.col("a.mh2") == F.col("b.mh2"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
        F.col("a.n_sh").alias("n_a"), F.col("b.n_sh").alias("n_b"),
    ).localCheckpoint(eager=True)

    # Verification touches candidate docs only: ONE more pass over the
    # shingle stream, gated by a broadcast of the candidate id set (no
    # full-table shuffle); distinct applies to that small subset, and
    # |∩| is a count over broadcast joins.
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh_cand = (
        sh_raw.join(F.broadcast(ids), "doc_id")
        .select("doc_id", "g").distinct()
        .localCheckpoint(eager=True)
    )
    sa = sh_cand.select(F.col("doc_id").alias("id_a"), "g")
    sb = sh_cand.select(F.col("doc_id").alias("id_b"), "g")
    inter = (
        cand.join(sa, "id_a").join(sb, ["id_b", "g"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.select("id_a", "id_b", jac.alias("jac_raw"))
        .filter(F.col("jac_raw") >= 0.6)
        .select("id_a", "id_b", F.round("jac_raw", 6).alias("jaccard"))
    )


# =========================================================================
# Similarity search on embeddings
# =========================================================================

@query(
    "cosine_topk",
    """
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT qid, vec_id,
             round(
               list_sum(list_transform(range(1, len(qv) + 1),
                        i -> CAST(qv[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                          i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))),
             5) AS sim
      FROM q JOIN embeddings ON vec_id <> qid
    )
    SELECT qid, vec_id, sim FROM (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
      FROM pairs
    ) WHERE rn <= 5
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (similarity-search baseline): JVM-side
    zip_with/aggregate dot products, ranking window per query. The
    IVF-bucketed scale path is operators/similarity.py."""
    e = _t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
    )
    pairs = q.join(e, F.col("vec_id") != F.col("qid")).select(
        "qid", "vec_id",
        F.round(cosine_similarity("qv", "embedding"), 5).alias("sim"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id", "sim")
    )


@query(
    "vector_norms",
    """
    SELECT vec_id, label,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 5) AS l2,
           CAST(len(list_distinct(list_transform(embedding,
                 x -> round(CAST(x AS DOUBLE), 1)))) AS BIGINT) AS n_distinct_rounded
    FROM embeddings WHERE vec_id < 100
    """,
)
def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 sorted/distinct array ops + vector norms over the embedding
    column (array higher-order functions, no explode)."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    rounded = F.transform("embedding", lambda x: F.round(x.cast("double"), 1))
    return e.select(
        "vec_id", "label",
        F.round(l2_norm("embedding"), 5).alias("l2"),
        F.size(F.array_distinct(rounded)).cast("long").alias("n_distinct_rounded"),
    )


@query(
    "centroid_per_label",
    """
    SELECT label, count(*) AS n,
           round(CAST(sum(CAST(embedding[1] AS DOUBLE)) AS DOUBLE) / count(*), 5) AS c0,
           round(CAST(sum(CAST(embedding[2] AS DOUBLE)) AS DOUBLE) / count(*), 5) AS c1,
           round(CAST(sum(CAST(embedding[64] AS DOUBLE)) AS DOUBLE) / count(*), 5) AS c63
    FROM embeddings GROUP BY label
    """,
)
def q_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (the IVF coarse-quantizer training
    step): element_at on the vector + grouped mean."""
    e = _t(spark, sf_dir, "embeddings")
    comp = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    n = F.count(F.lit(1))
    return e.groupBy("label").agg(
        n.alias("n"),
        F.round(F.sum(comp(1)) / n, 5).alias("c0"),
        F.round(F.sum(comp(2)) / n, 5).alias("c1"),
        F.round(F.sum(comp(64)) / n, 5).alias("c63"),
    )


@query(
    "embedding_near_pairs",
    """
    WITH n AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(range(1, len(a.v) + 1),
                 i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 5) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
          / (a.nrm * b.nrm) >= 0.4
    """,
)
def q_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup operator #5), exact
    all-pairs form — the verification oracle for the LSH-bucketed scale
    path in operators/dedup.py::embedding_near_dups."""
    e = _t(spark, sf_dir, "embeddings")
    n = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        l2_norm("embedding").alias("nrm"),
    )
    a, b = n.alias("a"), n.alias("b")
    cos = dot_product(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("c"),
        )
        .filter(F.col("c") >= 0.4)
        .select("id_a", "id_b", F.round("c", 5).alias("cosine"))
    )


@query(
    "array_level_filter",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(CAST(list_sum(list_transform(
                 list_filter(embedding, x -> x > 0),
                 x -> CAST(x AS DOUBLE))) AS DOUBLE), 5) AS sum_pos
    FROM embeddings WHERE vec_id < 200
    """,
)
def q_array_level_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/P8 per-level array predicate — the reference's QC level masks
    (filter over arrays_zip, interpolation.py:174-179) as higher-order
    functions; no explode, no UDF."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    pos = F.filter("embedding", lambda x: x > 0)
    return e.select(
        "vec_id",
        F.size(pos).cast("long").alias("n_pos"),
        F.round(
            F.aggregate(pos, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 5
        ).alias("sum_pos"),
    )


@query(
    "array_adjacent_diff",
    """
    SELECT vec_id,
           round(CAST(list_sum(list_transform(range(1, len(embedding)),
                 i -> abs(CAST(embedding[i+1] AS DOUBLE) - CAST(embedding[i] AS DOUBLE))))
                 AS DOUBLE), 5) AS total_variation
    FROM embeddings WHERE vec_id < 200
    """,
)
def q_array_adjacent_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 adjacent-element differences over an intra-row array (the
    reference's np.diff over depth, atlas.py:316-324) via zip_with on
    shifted slices — total variation per vector."""
    from .functions.arrays import array_diff

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    # cast each element to double BEFORE differencing — f4 subtraction
    # would round differently from the oracle's double arithmetic
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    tv = F.aggregate(
        array_diff(as_double), F.lit(0.0), lambda acc, x: acc + F.abs(x)
    )
    return e.select("vec_id", F.round(tv, 5).alias("total_variation"))


@query(
    "argmin_argmax",
    """
    SELECT event_type,
           arg_max(user_id, value) AS top_user,
           round(max(value), 3) AS top_value,
           arg_min(event_id, value) AS cheapest_event
    FROM events GROUP BY event_type
    """,
)
def q_argmin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 argmin/argmax (the reference's nearest-value lookup,
    bathy.py:29-30) as min_by/max_by aggregates."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max_by("user_id", "value").alias("top_user"),
        F.round(F.max("value"), 3).alias("top_value"),
        F.min_by("event_id", "value").alias("cheapest_event"),
    )


@query(
    "grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY §2.4 'absent' list)."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
           FROM lineitem_gs
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                   (l_returnflag, l_linestatus))"""
    )


@query(
    "ocean_mask_gate",
    """
    WITH grid AS (
      SELECT CAST(i * 5 - 177.5 AS DOUBLE) AS glon,
             CAST(j * 5 - 87.5 AS DOUBLE) AS glat
      FROM range(0, 72) t(i) CROSS JOIN range(0, 36) s(j)
    ),
    g AS (
      SELECT glon, glat,
             CAST(floor((glat + 90) / 0.5) AS BIGINT) AS lat_idx,
             CAST(floor((glon + 180) / 0.5) AS BIGINT) AS lon_idx
      FROM grid
    ),
    mask AS (
      SELECT j AS lat_idx, i AS lon_idx
      FROM range(0, 720) t(i) CROSS JOIN range(0, 360) s(j)
      WHERE (j * 31 + i * 17) % 7 < 5
    )
    SELECT glon, glat FROM g JOIN mask USING (lat_idx, lon_idx)
    """,
)
def q_ocean_mask_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/P10/J3: land-mask gate as an arithmetic-index broadcast
    equi-join (operators/atlas.apply_ocean_mask) against a synthetic
    1/2° global mask (sources/bathy.synthetic_ocean_mask). The oracle
    regenerates the identical mask from the integer-index rule and
    brute-joins; equality proves the floor-index semantics
    (reference bathy/bathy.py:38-50, 77-78). Plan shape (BHJ, no BNLJ)
    is pinned by tests/test_plans.py."""
    from .operators.atlas import apply_ocean_mask, make_grid
    from .sources.bathy import synthetic_ocean_mask

    grid = make_grid(spark, (-180.0, 180.0, -90.0, 90.0), reso_deg=5.0)
    mask = synthetic_ocean_mask(spark, reso_deg=0.5)
    return apply_ocean_mask(grid, mask, mask_reso_deg=0.5).select("glon", "glat")


# =========================================================================
# Rows-only entries (no SQL-expressible oracle; the driver records a
# weaker rows-only check): approximate/stateful/pipeline operators.
# =========================================================================

@query(
    "approx_aggregates",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS hll_within_5pct,
           TRUE AS median_within_p40_p60
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL distinct, quantile sketch). Sketch
    *values* differ per engine, so the derived deterministic oracle
    hashes exact anchors plus bound CHECKS instead: the HLL estimate
    (rsd=1%) must sit within 5% of the exact distinct count (a ≥5σ
    margin), and the sketch median must land between the exact p40/p60
    (group size ~20k at accuracy 10k → rank error ≤2, the p40-p60 band
    spans thousands of ranks). The oracle emits TRUE literals — a sketch
    drifting out of bounds flips a boolean and fails the hash."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("approx_median_qty"),
        F.expr("percentile(l_quantity, 0.4)").alias("p40"),
        F.expr("percentile(l_quantity, 0.6)").alias("p60"),
    )
    return agg.select(
        "l_returnflag",
        F.col("exact_orders").cast("long").alias("exact_orders"),
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.05
        ).alias("hll_within_5pct"),
        F.col("approx_median_qty").between(F.col("p40"), F.col("p60")).alias(
            "median_within_p40_p60"
        ),
    )


_SIMHASH_BITS = 60
_SIMHASH_MAXH = 4

_SIMHASH_SQL = f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                t -> t <> '')) AS t
      FROM documents
    ),
    h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
    votes AS (
      SELECT doc_id,
        {", ".join(f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
                   for i in range(_SIMHASH_BITS))}
      FROM h GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id,
             {" | ".join(f"(CASE WHEN v{i} > 0 THEN 1::BIGINT ELSE 0::BIGINT END << {i})"
                         for i in range(_SIMHASH_BITS))} AS s
      FROM votes
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= {_SIMHASH_MAXH}
"""


@query("dedup_simhash", _SIMHASH_SQL)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (dedup operator #3): 60-bit bitwise-majority
    signature over md5-prefix token hashes + pigeonhole-block candidate
    join (operators/dedup.py). The md5 hash family is shared with DuckDB,
    so the oracle brute-forces all pairs while Spark goes through the
    6-block pigeonhole buckets — equality IS the completeness proof for
    the bucketing (max_hamming=4 < blocks=6). The engine's 64-bit
    xxhash64 variant stays the default path where no oracle is needed."""
    from .operators.dedup import simhash_near_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_near_pairs(
        d.select("doc_id", "text"),
        max_hamming=_SIMHASH_MAXH,
        blocks=6,
        bits=_SIMHASH_BITS,
        hasher="md5",
    )


@query(
    "ann_ivf_topk",
    """
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
    pairs AS (
      SELECT qid, vec_id,
             round(
               list_sum(list_transform(range(1, len(qv) + 1),
                        i -> CAST(qv[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                          i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))),
             5) AS sim
      FROM q JOIN embeddings ON vec_id <> qid
    )
    SELECT qid, vec_id, sim FROM (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
      FROM pairs
    ) WHERE rn <= 5
    """,
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nearest neighbors, the zero-driver-round-trip variant
    (ivf_topk_scalable): k-means coarse quantizer, probe-cell explode →
    cell equi-join → ranking window. Probing ALL cells makes the IVF
    result EXACTLY brute force (every corpus vector lives in exactly one
    cell), so the driver can hash it against the DuckDB exhaustive scan
    — the derived deterministic oracle for an approximate-by-design
    operator. Recall at nprobe<ncells is pinned separately in tests."""
    from .operators.similarity import ivf_assign, ivf_topk_scalable, train_centroids

    e = _t(spark, sf_dir, "embeddings")
    cents = train_centroids(e, n_centroids=8, sample_rows=1000)
    assigned = ivf_assign(e, cents)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    out = ivf_topk_scalable(
        assigned, q, cents, k=5, nprobe=len(cents), round_digits=5
    )
    return out.select("qid", "vec_id", F.col("cosine").alias("sim"))


@query(
    "multimodal_features",
    """
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(8 + doc_id % 32 AS INT) AS width,
           CAST(8 + n_chars % 32 AS INT) AS height,
           TRUE AS decoded
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode end-to-end with a derived deterministic oracle:
    each document becomes a REAL binary PGM (P5) payload — header with
    content-derived dimensions, md5-hex body bytes — so the pure-NumPy
    image decoder (operators/multimodal.py:_decode_ppm) actually parses
    it inside mapInPandas. The oracle re-derives width/height from the
    same doc fields and pins decoded=TRUE: a hash match proves the real
    decode path ran for every row (a fallback to fake_decode_meta would
    flip `decoded` and change the dims)."""
    from .operators.multimodal import extract_features, to_media_table

    d = _t(spark, sf_dir, "documents")
    w = (F.lit(8) + F.col("doc_id") % 32).cast("int")
    h = (F.lit(8) + F.col("n_chars") % 32).cast("int")
    # body: w*h ≤ 39*39 = 1521 bytes of ASCII hex (md5 repeated 48× =
    # 1536) — byte length == char length by construction, so substr by
    # chars is substr by bytes
    payload = F.concat(
        F.concat_ws("", F.lit("P5\n"), w.cast("string"), F.lit(" "),
                    h.cast("string"), F.lit(" 255\n")),
        F.substring(F.repeat(F.md5(F.col("text").cast("binary")), 48), 1, w * h),
    ).cast("binary")
    media = to_media_table(
        d.withColumn("payload", payload), "doc_id", "payload", "image"
    )
    return extract_features(media, feat_dim=16).select(
        "media_id", "kind", "width", "height", "decoded"
    )


# -------------------------------------------------------------------------
# argo_atlas_pipeline oracle: the full interpolate→θ-join→weighted-mean→
# EAPE pipeline, brute-forced in DuckDB over a MATERIALIZED intermediate.
#
# The Spark query writes its interpolated profiles to a parquet temp-path
# and reads them back; the oracle reads the SAME parquet and recomputes
# everything downstream independently in pure SQL: grid generation,
# brute-force haversine θ-join, per-level kernel-weighted CT/SR means,
# the TEOS-10 75-term specific-volume polynomial (ρ and sound speed are
# GENERATED as SQL from the same published coefficient table the NumPy
# kernel uses — functions/teos10.py), the compressibility factor
# (running-sum window), the monotone reference curve (running max), the
# isopycnal-displacement linear interpolation (np.interp semantics:
# in-range segment lookup incl. duplicate-knot ties, clamped ends), and
# the R14 EAPE weighted mean. Only the interpolation itself (cubic
# spline, allclose-tested in tests/test_argo_pipeline.py per BASELINE.md
# tolerance policy) rides in as data. Reference precedent for
# differential testing: src/argostats/lorenz/lorenz_state.py:5-29.
# -------------------------------------------------------------------------

# Read at import so the Spark writer and the oracle SQL (which embeds
# the path as a literal) always agree. On a cluster, point this at a
# shared filesystem — local /tmp is only valid where driver and
# executors share a machine.
_ATLAS_ORACLE_PARQUET = os.environ.get(
    "ARGOSTATS_ATLAS_TMP",
    os.path.join(
        __import__("tempfile").gettempdir(), "argostats_spark_atlas_profiles.parquet"
    ),
)
_ATLAS_THETA = math.sin(math.radians(4.0 * 2.0) / 2.0) ** 2  # sf=4, reso=2°


def _specvol_poly_sql(xs: str, ys: str, zz: str) -> tuple[str, str]:
    """The Roquet et al. (2015) 75-term specific-volume polynomial and
    its analytic z-derivative as SQL expressions over pre-computed
    normalized columns — the same coefficient table functions/teos10.py
    evaluates with NumPy, so the oracle's ρ and sound speed are fully
    independent recomputations (summation order differs; the query's
    4-decimal rounding absorbs the ~1e-12 relative float divergence)."""
    from .functions.teos10 import _SPECVOL_COEFS

    def term(coef: float, a: int, b: int, c: int) -> str:
        fs = [f"({coef!r})"]
        for v, e in ((xs, a), (ys, b), (zz, c)):
            if e == 1:
                fs.append(v)
            elif e > 1:
                fs.append(f"pow({v},{e})")
        return "*".join(fs)

    v = " + ".join(term(val, a, b, c) for (a, b, c), val in sorted(_SPECVOL_COEFS.items()))
    dvdz = " + ".join(
        term(val * c, a, b, c - 1)
        for (a, b, c), val in sorted(_SPECVOL_COEFS.items())
        if c >= 1
    )
    return f"({v})", f"({dvdz})"


def _np_interp_sql(x: str) -> str:
    """``np.interp(x, curve, p)`` as a SQL expression, evaluated against
    a per-cell segment table aliased ``seg`` (columns glon, glat, ck,
    ck1, yk, yk1 — consecutive curve knots via lead()) and a bounds row
    aliased ``b`` (c_first/p_first, c_last/p_last), correlated on an
    outer row aliased ``pi`` carrying glon/glat. Semantics pinned
    against np.interp by a hypothesis property test
    (tests/test_oracle_parity.py), including the corners:

    - in-range x: exactly one non-empty segment satisfies
      ck <= x < ck1 (zero-width segments from duplicate knots can never
      match) — at a duplicated knot the surviving segment starts at the
      LAST duplicate, which is what np.interp returns;
    - x past either end (or equal to the last knot, where no segment
      matches): clamp to the end value, like np.interp.
    """
    return f"""coalesce(
               (SELECT s.yk + ({x} - s.ck)*(s.yk1 - s.yk)/(s.ck1 - s.ck)
                FROM seg s
                WHERE s.glon = pi.glon AND s.glat = pi.glat
                  AND s.ck <= {x} AND {x} < s.ck1),
               CASE WHEN {x} >= b.c_last THEN b.p_last ELSE b.p_first END
             )"""


def _atlas_pipeline_oracle_sql() -> str:
    from .functions.teos10 import _OFFSET, _SFAC
    from .schemas import pref64

    th = repr(_ATLAS_THETA)
    pref_rows = ", ".join(
        f"({k + 1}, {float(p)!r})" for k, p in enumerate(pref64())
    )
    # density at level 10 (1-based; element_at(CT, 10) ↔ pref index 9)
    p10 = repr(float(pref64()[9]))
    hav = (
        "pow(sin(radians(p.lat - g.glat)/2),2)"
        " + cos(radians(g.glat))*cos(radians(p.lat))"
        "*pow(sin(radians(p.lon - g.glon)/2),2)"
    )
    norm = (
        f"sqrt(greatest({_SFAC!r}*CAST({{sa}} AS DOUBLE) + {_OFFSET!r}, 0.0))",
        "CAST({ct} AS DOUBLE)*0.025",
        "{p}*1e-4",
    )
    v_cell, dvdz_cell = _specvol_poly_sql("xs", "ys", "zz")
    v_pair, _ = _specvol_poly_sql("xsi", "ysi", f"({p10}*1e-4)")
    return f"""
    WITH prof AS (
      SELECT CAST(LONGITUDE AS DOUBLE) AS lon, CAST(LATITUDE AS DOUBLE) AS lat,
             CT, SR, IDX
      FROM read_parquet('{_ATLAS_ORACLE_PARQUET}/*.parquet')
      WHERE FLAG = 1 AND DATA_MODE = 1
    ),
    bounds AS (
      SELECT CAST(floor(min(lon)) AS DOUBLE) AS lo_w,
             CAST(ceil(max(lon)) AS DOUBLE) AS lo_e,
             CAST(floor(min(lat)) AS DOUBLE) AS la_s,
             CAST(ceil(max(lat)) AS DOUBLE) AS la_n
      FROM prof
    ),
    grid AS (
      SELECT CAST(b.lo_w + i.i*2 + 1 AS DOUBLE) AS glon,
             CAST(b.la_s + j.j*2 + 1 AS DOUBLE) AS glat
      FROM bounds b, range(0, 200) i(i), range(0, 100) j(j)
      WHERE i.i < CAST(ceil((b.lo_e + 2 - b.lo_w)/2.0) AS BIGINT)
        AND j.j < CAST(ceil((b.la_n + 2 - b.la_s)/2.0) AS BIGINT)
    ),
    pairs AS (
      SELECT g.glon, g.glat, p.CT, p.SR, p.IDX, {hav} AS hav
      FROM grid g JOIN prof p ON {hav} <= {th}
    ),
    plev AS (
      SELECT glon, glat, exp(-hav/{th}) AS w,
             unnest(CT) AS ct, unnest(SR) AS sr, unnest(IDX) AS idx,
             unnest(generate_series(1, 64)) AS lev
      FROM pairs
    ),
    cellmean AS (
      SELECT glon, glat, lev,
             sum(w*idx) AS n_lev,
             CASE WHEN sum(w*idx) > 0
                  THEN CAST(sum(w*idx*ct)/sum(w*idx) AS REAL)
                  ELSE CAST(0.0 AS REAL) END AS ct_bar,
             CASE WHEN sum(w*idx) > 0
                  THEN CAST(sum(w*idx*sr)/sum(w*idx) AS REAL)
                  ELSE CAST(0.0 AS REAL) END AS sr_bar
      FROM plev GROUP BY glon, glat, lev
    ),
    pref(lev, p) AS (VALUES {pref_rows}),
    celltherm AS (
      SELECT m.glon, m.glat, m.lev, r.p, m.ct_bar, m.sr_bar,
             {norm[0].format(sa="m.sr_bar")} AS xs,
             {norm[1].format(ct="m.ct_bar")} AS ys,
             {norm[2].format(p="r.p")} AS zz
      FROM cellmean m JOIN pref r ON m.lev = r.lev
    ),
    cellv AS (
      SELECT *, {v_cell} AS v, {dvdz_cell} AS dvdz FROM celltherm
    ),
    cellc AS (
      SELECT glon, glat, lev, p, 1.0/v AS rho_bar,
             1e4*sqrt(-v*v/dvdz) AS c,
             p - coalesce(lag(p) OVER (PARTITION BY glon, glat ORDER BY lev), p) AS dp
      FROM cellv
    ),
    cellcf AS (
      SELECT *, exp(-sum(1e4*dp/(rho_bar*c*c))
                    OVER (PARTITION BY glon, glat ORDER BY lev)) AS cf
      FROM cellc
    ),
    cellcurve AS (
      SELECT *, max(rho_bar*cf) OVER (PARTITION BY glon, glat ORDER BY lev) AS curve
      FROM cellcf
    ),
    seg AS (
      SELECT glon, glat, curve AS ck, p AS yk,
             lead(curve) OVER (PARTITION BY glon, glat ORDER BY lev) AS ck1,
             lead(p) OVER (PARTITION BY glon, glat ORDER BY lev) AS yk1
      FROM cellcurve
    ),
    cbound AS (
      SELECT glon, glat, arg_min(curve, lev) AS c_first, arg_min(p, lev) AS p_first,
             arg_max(curve, lev) AS c_last, arg_max(p, lev) AS p_last
      FROM cellcurve GROUP BY glon, glat
    ),
    p10 AS (
      SELECT glon, glat, exp(-hav/{th}) AS w,
             CAST(IDX[10] AS DOUBLE) AS idx10,
             {norm[0].format(sa="SR[10]")} AS xsi,
             {norm[1].format(ct="CT[10]")} AS ysi
      FROM pairs
    ),
    pi10 AS (
      SELECT glon, glat, w, idx10, 1.0/({v_pair}) AS rho_i FROM p10
    ),
    d10 AS (
      SELECT pi.glon, pi.glat, pi.w, pi.idx10, pi.rho_i,
             cc.rho_bar AS rho_bar10,
             {_np_interp_sql("pi.rho_i*cc.cf")} AS disp
      FROM pi10 pi
      JOIN cellcurve cc ON cc.glon = pi.glon AND cc.glat = pi.glat AND cc.lev = 10
      JOIN cbound b ON b.glon = pi.glon AND b.glat = pi.glat
    ),
    eape10 AS (
      SELECT glon, glat,
             CASE WHEN sum(w*idx10) > 0
                  THEN sum(w*idx10 * 0.5*100.0*(rho_i - rho_bar10)*(disp - {p10}))
                       / sum(w*idx10)
                  ELSE 0.0 END AS eape_m
      FROM d10 GROUP BY glon, glat
    ),
    npts AS (
      SELECT glon, glat, count(*) AS n_points FROM pairs GROUP BY glon, glat
    )
    SELECT n.glon, n.glat, n.n_points,
           round(CAST(m.ct_bar AS DOUBLE), 4) AS ct_l10,
           round(CAST(m.sr_bar AS DOUBLE), 4) AS sr_l10,
           round(CAST(CAST(e.eape_m AS REAL) AS DOUBLE), 4) AS eape_l10
    FROM npts n
    JOIN cellmean m ON m.glon = n.glon AND m.glat = n.glat AND m.lev = 10
    JOIN eape10 e ON e.glon = n.glon AND e.glat = n.glat
    """


def ensure_atlas_oracle_parquet() -> None:
    """Driver-ordering guard: if the correctness driver evaluates the
    oracle SQL BEFORE running the Spark query on a clean machine, the
    materialized intermediate would not exist yet. The pipeline upstream
    of the materialization is deterministic (seed 42) and driver-sized
    (48 profiles), so generate it here WITHOUT Spark via the pandas
    twins — make_raw_pandas (row-identical to the distributed make_raw,
    pinned by test) and the same _interp_one_wmo kernel the Spark query
    maps — writing only the columns the oracle reads. The Spark query
    overwrites the path with identical values whenever it runs
    (tests/test_argo_pipeline.py::test_atlas_oracle_parquet_driver_twin
    pins the equality).

    Regenerates UNCONDITIONALLY into a fresh directory swapped into
    place (round-5 review): an exists-check would trust forever a
    half-written directory from a killed process, or rows produced by
    an older kernel version — both self-heal here, and the swap keeps a
    concurrent reader from observing an empty directory."""
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .operators.interpolation import _interp_one_wmo
    from .sources.synthetic import make_raw_pandas

    raw = make_raw_pandas(n_wmos=6, profiles_per_wmo=8, seed=42)
    # FLAG gate exactly as interpolate_profiles: product-combine, keep 1
    raw = raw.assign(FLAG=raw.POSITION_QC * raw.JULD_QC)
    raw = raw[raw.FLAG == 1]
    out = pd.concat(
        [_interp_one_wmo(g) for _, g in raw.groupby("WMO")], ignore_index=True
    )
    cols = ["LONGITUDE", "LATITUDE", "FLAG", "DATA_MODE", "CT", "SR", "IDX"]
    table = pa.table(
        {
            "LONGITUDE": pa.array(out.LONGITUDE, pa.float32()),
            "LATITUDE": pa.array(out.LATITUDE, pa.float32()),
            "FLAG": pa.array(out.FLAG, pa.int8()),
            "DATA_MODE": pa.array(out.DATA_MODE, pa.int8()),
            "CT": pa.array(out.CT, pa.list_(pa.float32())),
            "SR": pa.array(out.SR, pa.list_(pa.float32())),
            "IDX": pa.array(out.IDX, pa.list_(pa.int8())),
        }
    ).select(cols)
    tmp = _ATLAS_ORACLE_PARQUET + ".twin-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(table, os.path.join(tmp, "part-driver.parquet"))
    shutil.rmtree(_ATLAS_ORACLE_PARQUET, ignore_errors=True)
    os.replace(tmp, _ATLAS_ORACLE_PARQUET)


@query("argo_atlas_pipeline", _atlas_pipeline_oracle_sql())
def q_argo_atlas_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity pipeline end-to-end (SURVEY §3.1-3.3): synthetic
    raw profiles → summary gates → applyInPandas interpolation onto 64
    levels → materialized parquet intermediate → binned neighborhood
    join → kernel-weighted TS climatology (A1-A3) → two-pass R14 EAPE
    (A4: cell-mean → broadcast-back → isopycnal displacement → weighted
    mean; reference atlas.py:152-191, 281-298).

    The interpolated profiles are written to a parquet temp-path and
    read back, so the DuckDB oracle (above) brute-forces the ENTIRE
    downstream pipeline over literally the same bytes — the spline
    kernel upstream of the materialization stays pinned by the golden/
    property tests in tests/test_argo_pipeline.py."""
    from .operators.atlas import clim_eape, clim_ts, make_grid, match_pairs
    from .operators.interpolation import interpolate_profiles
    from .sources.synthetic import make_raw

    ensure_workers_can_import(spark)
    raw = make_raw(spark, n_wmos=6, profiles_per_wmo=8, seed=42)
    interpolate_profiles(raw).write.mode("overwrite").parquet(_ATLAS_ORACLE_PARQUET)
    profiles = spark.read.parquet(_ATLAS_ORACLE_PARQUET)
    # grid over the FULL bounding box of eligible profiles: WMOs scatter
    # globally, so a fixed-size box at (min lon, min lat) — one corner
    # from one WMO, the other from another — can contain zero profiles.
    # Cell count via ceil (not round) so the SQL twin is exact: Python's
    # round() is banker's at .5 and DuckDB's is half-away-from-zero.
    bounds = profiles.filter((F.col("FLAG") == 1) & (F.col("DATA_MODE") == 1)).agg(
        F.floor(F.min("LONGITUDE")).alias("lo_w"),
        F.ceil(F.max("LONGITUDE")).alias("lo_e"),
        F.floor(F.min("LATITUDE")).alias("la_s"),
        F.ceil(F.max("LATITUDE")).alias("la_n"),
    ).first()
    nlon = int(math.ceil((bounds.lo_e + 2 - bounds.lo_w) / 2.0))
    nlat = int(math.ceil((bounds.la_n + 2 - bounds.la_s) / 2.0))
    grid = make_grid(
        spark,
        (float(bounds.lo_w), float(bounds.lo_w) + 2.0 * nlon,
         float(bounds.la_s), float(bounds.la_s) + 2.0 * nlat),
        reso_deg=2.0,
    )
    # the pair set feeds both the TS and EAPE passes (SURVEY §7.4.2) —
    # materialize it and the pass-1 means so pass 2 reuses, not
    # recomputes. localCheckpoint (not persist): a query builder cannot
    # unpersist after its caller collects, and CacheManager pins
    # persisted relations for the session — checkpointed RDDs are freed
    # by the ContextCleaner once unreferenced (round-5 review).
    pairs = match_pairs(grid, profiles, reso_deg=2.0, smoothing_factor=4.0
                        ).localCheckpoint(eager=True)
    ts = clim_ts(grid, profiles, reso_deg=2.0, smoothing_factor=4.0, pairs=pairs
                 ).localCheckpoint(eager=True)
    eape = clim_eape(
        grid, profiles, reso_deg=2.0, smoothing_factor=4.0, pairs=pairs, ts=ts
    )
    out = ts.join(eape.select("glon", "glat", "EAPE"), on=["glon", "glat"])
    return out.select(
        "glon", "glat",
        F.col("n_points").cast("long").alias("n_points"),
        F.round(F.element_at("CT", 10).cast("double"), 4).alias("ct_l10"),
        F.round(F.element_at("SR", 10).cast("double"), 4).alias("sr_l10"),
        F.round(F.element_at("EAPE", 10).cast("double"), 4).alias("eape_l10"),
    )


@query(
    "dedup_components",
    f"""
    WITH RECURSIVE
    d AS ({_SHINGLES_SQL}),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.04
    ),
    ud AS (SELECT id_a AS u, id_b AS v FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
    reach(node, comp) AS (
      SELECT u, u FROM ud
      UNION
      SELECT ud.v, reach.comp FROM reach JOIN ud ON ud.u = reach.node
    ),
    lab AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
    full_lab AS (
      SELECT doc_id, coalesce(lab.comp, doc_id) AS comp_id
      FROM documents LEFT JOIN lab ON documents.doc_id = lab.node
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(comp_id AS BIGINT) AS comp_id,
           CAST(count(*) OVER (PARTITION BY comp_id) AS BIGINT) AS comp_size,
           CAST(doc_id = comp_id AS INT) AS keep
    FROM full_lab
    """,
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group clustering (the step after pair generation):
    n-gram-Jaccard near-dup pairs -> undirected connected components via
    distributed min-label propagation with pointer jumping
    (operators/graph.py) -> full-corpus labeling with canonical keep
    flags. The DuckDB twin computes the same components by recursive
    transitive closure - two entirely different algorithms, one answer.
    Green-field (no reference counterpart; dedup family #6)."""
    from .operators.graph import duplicate_groups

    d = _t(spark, sf_dir, "documents")
    edges = q_dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    return duplicate_groups(d, edges, id_col="doc_id")


@query(
    "dedup_groups_lsh",
    f"""
    WITH RECURSIVE
    d AS ({_MINHASH_SQL}),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM d a JOIN d b ON a.mh1 = b.mh1 AND a.mh2 = b.mh2 AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.6
    ),
    ud AS (SELECT id_a AS u, id_b AS v FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
    reach(node, comp) AS (
      SELECT u, u FROM ud
      UNION
      SELECT ud.v, reach.comp FROM reach JOIN ud ON ud.u = reach.node
    ),
    lab AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
    full_lab AS (
      SELECT doc_id, coalesce(lab.comp, doc_id) AS comp_id
      FROM documents LEFT JOIN lab ON documents.doc_id = lab.node
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(comp_id AS BIGINT) AS comp_id,
           CAST(count(*) OVER (PARTITION BY comp_id) AS BIGINT) AS comp_size,
           CAST(doc_id = comp_id AS INT) AS keep
    FROM full_lab
    """,
)
def q_dedup_groups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end scale-shaped dedup pipeline: shingles → minhash
    signatures → LSH bucket join → exact-Jaccard verification (all the
    dedup_minhash_lsh plan, one full-table shuffle) → connected
    components (pointer-jumping min-label, operators/graph.py) → full
    corpus keep flags. This is the query a 100 TB curation run executes;
    dedup_components keeps the quadratic-edge variant as the exactness
    oracle. DuckDB twin chains the banded pair SQL into a recursive
    transitive closure — different algorithms at every stage, one
    answer. Green-field (dedup family capstone)."""
    from .operators.graph import duplicate_groups

    d = _t(spark, sf_dir, "documents")
    edges = q_dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    return duplicate_groups(d, edges, id_col="doc_id")


@query(
    "decontaminate",
    f"""
    WITH sh AS (SELECT doc_id, {_SH_EXPR} AS sh FROM documents),
    b AS (SELECT DISTINCT g
          FROM (SELECT unnest(sh) AS g FROM sh WHERE doc_id % 50 = 0)),
    c AS (SELECT doc_id, sh FROM sh WHERE doc_id % 50 <> 0),
    hits AS (
      SELECT doc_id, count(*) AS n_hits
      FROM (SELECT doc_id, unnest(sh) AS g FROM c) t JOIN b USING (g)
      GROUP BY doc_id
    )
    SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
           CAST(len(c.sh) AS INT) AS n_grams,
           CAST(coalesce(hits.n_hits, 0) AS INT) AS n_hits,
           round(CAST(coalesce(hits.n_hits, 0) AS DOUBLE)
                 / greatest(len(c.sh), 1), 6) AS hit_ratio,
           CAST(coalesce(hits.n_hits, 0) >= 1 AS INT) AS contaminated
    FROM c LEFT JOIN hits ON c.doc_id = hits.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (training-pipeline family): every 50th
    document plays the held-out eval set; the rest are the corpus. A
    corpus doc is contaminated when any of its distinct word-3-grams
    appears in the benchmark n-gram set (the published exact-overlap
    practice — GPT-3 appendix C / The Pile use 13-grams on full-length
    text). Scale shape: benchmark n-grams broadcast (eval sets are tiny
    vs the corpus), corpus never fully shuffles (operators/decontam.py)."""
    from .operators.decontam import ngram_contamination

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    return ngram_contamination(corpus, bench, n=3)


# =========================================================================
# Training-data pipeline: deterministic split / stratified sample /
# normalization (operators/sampling.py, functions/text.py)
# =========================================================================

@query(
    "split_assign",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CASE WHEN b < 8000 THEN 'train'
                WHEN b < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 ('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 10000 AS b
          FROM documents)
    """,
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed train/val/test split: md5 hash
    bucket of the key, salt-versioned — identical assignment on every
    run/engine/cluster (operators/sampling.py). Zero shuffles."""
    from .operators.sampling import train_test_split

    d = _t(spark, sf_dir, "documents")
    return train_test_split(d, "doc_id").select(
        F.col("doc_id").cast("long").alias("doc_id"), "split"
    )


@query(
    "stratified_sample",
    """
    WITH s AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('sample' || CAST(doc_id AS VARCHAR))) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
    FROM s WHERE rn <= CEIL(n * 0.2)
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 20% per-language sample, chosen by md5-hash order —
    deterministic and engine-independent (operators/sampling.py). One
    window shuffle; the approximate no-shuffle twin is sampleBy."""
    from .operators.sampling import stratified_sample_exact

    d = _t(spark, sf_dir, "documents")
    return stratified_sample_exact(d, "lang", 0.2, "doc_id").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )


@query(
    "quality_filter",
    r"""
    WITH t AS (
      SELECT doc_id,
             round(
               least(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 20.0,
                     1.0) * 0.4
               + (CASE WHEN len(string_split_regex(trim(text), '\s+')) > 0
                        AND CAST(length(text) AS DOUBLE)
                            / len(string_split_regex(trim(text), '\s+')) >= 3.0
                        AND CAST(length(text) AS DOUBLE)
                            / len(string_split_regex(trim(text), '\s+')) <= 12.0
                       THEN 1.0 ELSE 0.5 END) * 0.3
               + (1.0 - least(
                    (CASE WHEN length(text) > 0
                          THEN CAST(length(text)
                                    - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                                    AS DOUBLE) / length(text)
                          ELSE 0.0 END) * 4.0, 1.0)) * 0.3,
             6) AS quality
      FROM documents
    ),
    thr AS (SELECT round(quantile_cont(quality, 0.1), 6) AS thr FROM t)
    SELECT doc_id, quality FROM t, thr WHERE quality >= thr
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality gate: keep documents at or above the exact global
    10th percentile of the quality score. Exact percentile via one agg,
    threshold broadcast as a 1-row cross join — no second scan, no
    driver round-trip. Score and threshold are both rounded to 6
    decimals BEFORE comparison so the boundary set is bit-identical
    across engines (raw doubles can differ in the last ulp)."""
    from .functions.text import quality_score

    d = _t(spark, sf_dir, "documents")
    q = d.select("doc_id", F.round(quality_score("text"), 6).alias("quality"))
    thr = q.agg(F.round(F.percentile("quality", F.lit(0.1)), 6).alias("thr"))
    return (
        q.crossJoin(F.broadcast(thr))
        .filter(F.col("quality") >= F.col("thr"))
        .select("doc_id", "quality")
    )


@query(
    "pack_sequences",
    r"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT doc_id, lang, n_tok,
           CAST(floor(
             coalesce(sum(n_tok) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / 512.0) AS BIGINT) AS chunk_id
    FROM t
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing assignment: chunk_id = floor(per-language
    exclusive running token total / 512) in doc_id order
    (operators/sampling.py::pack_chunks). The window partitions by
    language — never a global single-partition running sum."""
    from .functions.text import token_count
    from .operators.sampling import pack_chunks

    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", token_count("text").alias("n_tok"))
    return pack_chunks(t, "n_tok", 512, "lang", "doc_id").select(
        "doc_id", "lang", "n_tok", "chunk_id"
    )
