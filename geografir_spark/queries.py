"""Query registry: every engine operator exposed as a (spark_fn, oracle_sql)
pair for the driver's correctness gate.

Each entry's Spark callable takes ``(spark, sf_dir)`` and returns a
DataFrame; the oracle entry is ANSI SQL DuckDB runs against the same parquet
tables (pre-registered views). Column names are aliased identically on both
sides — the driver sorts columns by name before hashing values.

Determinism contract: every floating-point value that reaches an output (or
an ORDER BY) is produced by the *same literal arithmetic expression* on both
engines (IEEE-754 doubles, identical op order), so value hashes match
exactly. Join/group keys are integer cell ids — never raw doubles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geografir_spark.geo import cells, geocode
from geografir_spark.sources.pages import load_pages, load_table, pages_select_sql

RES = 9          # default tiling resolution (512×512 world grid — mirrors the
                 # reference's 512-px block constant, profiles.py:81)
ROLLUP_RES = 4   # coarse resolution for hierarchy rollups


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, or None → rows-only check


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: Optional[str]):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # ship the package to executor Python workers (no-op when
            # already shipped or when running under spark-submit --py-files)
            from geografir_spark.shipping import ensure_shipped

            ensure_shipped(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = QueryDef(wrapped, oracle)
        return fn

    return deco


def _geocoded_pages(spark: SparkSession, sf_dir: str, res: int = RES) -> DataFrame:
    """pages → (lon, lat) → cell. Shared head of most geo queries."""
    p = load_pages(spark, sf_dir)
    p = geocode.with_geocode(p, "text", "page_id")
    return cells.with_cell(p, "lon", "lat", res)


def _geocoded_pages_oracle_base(res: int = RES) -> str:
    """DuckDB SQL producing the identical geocoded+celled pages relation."""
    base = pages_select_sql("documents")
    q = cells.nested_sql(base, geocode.geocode_steps("text", "page_id", "duckdb"))
    return cells.nested_sql(q, cells.encode_steps("lon", "lat", res))


# ---------------------------------------------------------------------------
# Flagship: spatial tiling of the pages table
# ---------------------------------------------------------------------------

@register(
    "pages_per_cell",
    f"""
    SELECT cell, count(*) AS n_pages, count(DISTINCT url) AS n_urls,
           sum(n_chars) AS total_chars
    FROM ({_geocoded_pages_oracle_base()})
    GROUP BY cell
    """,
)
def q_pages_per_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile the pages table: geocode → cell_encode(res 9) → per-cell stats.

    The engine half of the north rule's "spatial-join + H3 tiling
    throughput" metric. Whole pipeline is native Catalyst (regexp + bit
    math + hash agg with partial aggregation map-side).
    """
    p = _geocoded_pages(spark, sf_dir)
    return p.groupBy("cell").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("url").alias("n_urls"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "cell_rollup",
    f"""
    SELECT {cells.parent_sql('cell', ROLLUP_RES)} AS parent_cell,
           count(*) AS n_pages
    FROM ({_geocoded_pages_oracle_base()})
    GROUP BY parent_cell
    """,
)
def q_cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy rollup: fine cells → res-4 ancestors via pure bit math."""
    p = _geocoded_pages(spark, sf_dir)
    p = cells.with_parent(p, "cell", ROLLUP_RES)
    return p.groupBy("parent_cell").agg(F.count("*").alias("n_pages"))


@register(
    "hot_cells_topk",
    f"""
    SELECT cell, count(*) AS n_pages
    FROM ({_geocoded_pages_oracle_base()})
    GROUP BY cell
    ORDER BY n_pages DESC, cell ASC
    LIMIT 20
    """,
)
def q_hot_cells_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k hot cells (skew histogram head). TakeOrderedAndProject —
    no full sort. Ties broken by cell id for determinism."""
    p = _geocoded_pages(spark, sf_dir)
    return (
        p.groupBy("cell")
        .agg(F.count("*").alias("n_pages"))
        .orderBy(F.desc("n_pages"), F.asc("cell"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Envelope aggregation (lifted BoundingBox.from_geometry, reference
# geometry/src/geometry/bounding_box.py:138-169: bbox == per-axis min/max)
# ---------------------------------------------------------------------------

_CUST_LON = geocode.fallback_lon_sql("c_custkey")
_CUST_LAT = geocode.fallback_lat_sql("c_custkey")


@register(
    "nation_envelope",
    f"""
    SELECT n.n_nationkey AS nation_key, n.n_name AS nation_name,
           min({_CUST_LON}) AS minx, min({_CUST_LAT}) AS miny,
           max({_CUST_LON}) AS maxx, max({_CUST_LAT}) AS maxy,
           count(*) AS n_points
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name
    """,
)
def q_nation_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation bounding box of customer points — st_envelope semantics
    (per-axis coordinate min/max) lifted to a grouped aggregate, with a
    broadcast dimension join."""
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey",
        "c_nationkey",
        f"{_CUST_LON} AS lon",
        f"{_CUST_LAT} AS lat",
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_nationkey").alias("nation_key"), F.col("n_name").alias("nation_name"))
        .agg(
            F.min("lon").alias("minx"),
            F.min("lat").alias("miny"),
            F.max("lon").alias("maxx"),
            F.max("lat").alias("maxy"),
            F.count("*").alias("n_points"),
        )
    )


# ---------------------------------------------------------------------------
# Spatial joins: zones (axis-aligned rectangles derived from nation, so the
# oracle can verify the join with plain comparisons — FIXTURES.md §3)
# ---------------------------------------------------------------------------

PIP_RES = 6    # coarser grid for polygon cover (cells ≈ 5.6° × 2.8°)
BBOX_RES = 4

# zone edges end in .0005 so fallback points (3-decimal grid) can never sit
# exactly on a boundary — inclusive-vs-exclusive edge semantics can't differ
ZONE_MINX = "(CAST(n_nationkey % 7 AS DOUBLE) * 48.0 - 175.5005)"
ZONE_MAXX = f"({ZONE_MINX} + 20.0 + CAST(n_nationkey % 3 AS DOUBLE) * 14.0)"
ZONE_MINY = "(CAST(n_nationkey % 5 AS DOUBLE) * 33.0 - 82.5005)"
ZONE_MAXY = f"({ZONE_MINY} + 15.0 + CAST(n_nationkey % 4 AS DOUBLE) * 9.0)"

_ZONES_SQL = (
    f"SELECT n_nationkey AS zone_id, {ZONE_MINX} AS minx, {ZONE_MINY} AS miny,"
    f" {ZONE_MAXX} AS maxx, {ZONE_MAXY} AS maxy FROM nation"
)
_POINTS_SQL = (
    f"SELECT c_custkey AS point_id, {_CUST_LON} AS lon, {_CUST_LAT} AS lat FROM customer"
)


def _zones_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zones with both bbox columns and a POLYGON wkt (the engine join runs
    the real WKT→cover→refine path; the oracle uses the bbox columns)."""
    z = load_table(spark, sf_dir, "nation").selectExpr(
        f"n_nationkey AS zone_id",
        f"{ZONE_MINX} AS minx",
        f"{ZONE_MINY} AS miny",
        f"{ZONE_MAXX} AS maxx",
        f"{ZONE_MAXY} AS maxy",
    )
    return z.selectExpr(
        "*",
        "concat('POLYGON ((', minx, ' ', miny, ', ', maxx, ' ', miny, ', ',"
        " maxx, ' ', maxy, ', ', minx, ' ', maxy, ', ', minx, ' ', miny, '))')"
        " AS geom_wkt",
    )


def _points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS point_id", f"{_CUST_LON} AS lon", f"{_CUST_LAT} AS lat"
    )


@register(
    "pip_zone_counts",
    f"""
    WITH zones AS ({_ZONES_SQL}), pts AS ({_POINTS_SQL})
    SELECT z.zone_id AS zone_id, count(*) AS n_points, sum(p.point_id) AS sum_ids
    FROM pts p JOIN zones z
      ON p.lon >= z.minx AND p.lon <= z.maxx
     AND p.lat >= z.miny AND p.lat <= z.maxy
    GROUP BY z.zone_id
    """,
)
def q_pip_zone_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon spatial join (cover cells → equi-join → full-cell
    skip + exact even-odd refine), aggregated per zone."""
    from geografir_spark.operators.pip_join import spatial_join_pip

    pts = cells.with_cell(_points_df(spark, sf_dir), "lon", "lat", PIP_RES)
    zones = _zones_df(spark, sf_dir).drop("minx", "miny", "maxx", "maxy")
    joined = spatial_join_pip(pts, zones, res=PIP_RES)
    return joined.groupBy("zone_id").agg(
        F.count("*").alias("n_points"), F.sum("point_id").alias("sum_ids")
    )


@register(
    "bbox_zone_pairs",
    f"""
    WITH z AS ({_ZONES_SQL})
    SELECT a.zone_id AS zone_a, b.zone_id AS zone_b
    FROM z a JOIN z b
      ON a.zone_id < b.zone_id
     AND a.minx <= b.maxx AND b.minx <= a.maxx
     AND a.miny <= b.maxy AND b.miny <= a.maxy
    """,
)
def q_bbox_zone_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BBox overlap self-join with reference-point dedup (no distinct)."""
    from geografir_spark.operators.bbox_join import bbox_overlap_join

    z = _zones_df(spark, sf_dir).drop("geom_wkt")
    pairs = bbox_overlap_join(
        z, z, res=BBOX_RES, extra_pred=F.col("zone_id_a") < F.col("zone_id_b")
    )
    return pairs.select(
        F.col("zone_id_a").alias("zone_a"), F.col("zone_id_b").alias("zone_b")
    )


# ---------------------------------------------------------------------------
# kNN join (cell-ring expansion)
# ---------------------------------------------------------------------------

KNN_RES = 7
KNN_K = 3
_Q_LON = geocode.fallback_lon_sql("(n_nationkey * 131 + 7)")
_Q_LAT = geocode.fallback_lat_sql("(n_nationkey * 181 + 11)")


@register(
    "knn_customers",
    f"""
    WITH qs AS (SELECT n_nationkey AS qid, {_Q_LON} AS qx, {_Q_LAT} AS qy FROM nation),
         ts AS (SELECT c_custkey AS tid, {_CUST_LON} AS tx, {_CUST_LAT} AS ty FROM customer),
         d AS (SELECT qid, tid,
                      (((qx) - (tx)) * ((qx) - (tx))) + (((qy) - (ty)) * ((qy) - (ty))) AS dist
               FROM qs CROSS JOIN ts),
         r AS (SELECT qid, tid,
                      row_number() OVER (PARTITION BY qid ORDER BY dist ASC, tid ASC) AS knn_rank
               FROM d)
    SELECT qid, tid, knn_rank FROM r WHERE knn_rank <= {KNN_K}
    """,
)
def q_knn_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=3 nearest customers per nation center via cell-ring expansion;
    verified against the oracle's exact brute-force kNN."""
    from geografir_spark.operators.knn import knn_join

    qs = load_table(spark, sf_dir, "nation").selectExpr(
        "n_nationkey AS qid", f"{_Q_LON} AS qx", f"{_Q_LAT} AS qy"
    )
    ts = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS tid", f"{_CUST_LON} AS tx", f"{_CUST_LAT} AS ty"
    )
    out = knn_join(qs, ts, k=KNN_K, res=KNN_RES)
    return out.select("qid", "tid", F.col("rank").alias("knn_rank"))


# ---------------------------------------------------------------------------
# As-of-latest (windowed dedup — the url/warc_ts snapshot pattern)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Dedup / text-analysis / similarity (training-data-pipeline operators)
# ---------------------------------------------------------------------------

def _sql_query(spark: SparkSession, sf_dir: str, spark_sql: str, views: tuple = ("documents",)) -> DataFrame:
    """Run generated Spark-dialect SQL against temp views of the sf tables."""
    for v in views:
        load_table(spark, sf_dir, v).createOrReplaceTempView(v)
    return spark.sql(spark_sql)


def _dedup_mod():
    from geografir_spark.operators import dedup

    return dedup


@register(
    "dedup_exact",
    _dedup_mod().exact_dedup_sql("documents", "doc_id", "text", "duckdb"),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup map: content hash → multiplicity + keeper id."""
    from geografir_spark.operators import dedup

    return _sql_query(
        spark, sf_dir, dedup.exact_dedup_sql("documents", "doc_id", "text", "spark")
    )


@register(
    "dedup_minhash_pairs",
    _dedup_mod().minhash_pairs_sql("documents", "doc_id", "text", "duckdb"),
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate candidate pairs (16 hashes, 4 bands,
    3-word shingles) — the full shingle→minhash→band→bucket-join pipeline.

    The signature stage is persisted before banding: each doc's signature
    feeds 4 band rows on both join sides, and without materialization the
    optimizer re-inlines the (md5-per-shingle × 16 hash) computation into
    every consumer (measured 65 s → ~3 s at sf0.1)."""
    from geografir_spark.geo import cells
    from geografir_spark.operators import dedup

    # test parquets are single-row-group files (scan parallelism 1) — spread
    # the signature compute across cores; production multi-file tables skip
    # this (the scan is already split).
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    sig_steps = dedup.minhash_signature_exprs("text", "spark")
    # band outputs keep non-"__" names so apply_steps retains them
    sig_steps.append(
        {n.lstrip("_"): e for n, e in dedup.band_sig_exprs().items()}
    )
    sigs = cells.apply_steps(docs, sig_steps).select(
        "doc_id", *[f"band{b}" for b in range(4)]
    ).persist()
    band_rows = None
    for b in range(4):
        part = sigs.selectExpr(
            "doc_id AS doc", f"{b} AS band_idx", f"band{b} AS sig"
        )
        band_rows = part if band_rows is None else band_rows.unionByName(part)
    a = band_rows.selectExpr("doc AS doc_a", "band_idx", "sig")
    b_ = band_rows.selectExpr("doc AS doc_b", "band_idx AS band_idx_b", "sig AS sig_b")
    pairs = a.join(
        b_,
        (F.col("band_idx") == F.col("band_idx_b"))
        & (F.col("sig") == F.col("sig_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    )
    return pairs.select("doc_a", "doc_b").distinct()


@register(
    "dedup_simhash",
    _dedup_mod().simhash_sql("documents", "doc_id", "text", "duckdb"),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document (bit-majority over token hashes)."""
    from geografir_spark.operators import dedup

    return _sql_query(
        spark, sf_dir, dedup.simhash_sql("documents", "doc_id", "text", "spark")
    )


def _text_quality_sql(dialect: str) -> str:
    from geografir_spark.operators import text as textops

    cols = ", ".join(
        f"{expr} AS {name}" for name, expr in textops.quality_exprs("text", dialect).items()
    )
    return f"SELECT doc_id, {cols} FROM documents"


@register("text_quality", _text_quality_sql("duckdb"))
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, avg token length, punct
    ratio, stopword ratio, fingerprint."""
    return _sql_query(spark, sf_dir, _text_quality_sql("spark"))


def _lang_id_sql(dialect: str) -> str:
    from geografir_spark.operators import text as textops

    return (
        f"SELECT {textops.lang_id_expr('text', dialect)} AS lang_pred,"
        f" count(*) AS n FROM documents GROUP BY lang_pred"
    )


@register("lang_id", _lang_id_sql("duckdb"))
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID distribution over the corpus."""
    return _sql_query(spark, sf_dir, _lang_id_sql("spark"))


_ANN_K = 5
_ANN_PROBES = 8


@register(
    "ann_cosine_topk",
    f"""
    WITH p AS (SELECT vec_id AS probe_id, embedding AS pvec FROM embeddings
               WHERE vec_id < {_ANN_PROBES}),
         t AS (SELECT vec_id AS neighbor_id, embedding AS tvec FROM embeddings),
         d AS (SELECT probe_id, neighbor_id,
                      list_cosine_similarity(pvec, tvec) AS c
               FROM p CROSS JOIN t WHERE probe_id != neighbor_id),
         r AS (SELECT probe_id, neighbor_id,
                      row_number() OVER (PARTITION BY probe_id
                                         ORDER BY c DESC, neighbor_id ASC) AS rank
               FROM d)
    SELECT probe_id, neighbor_id, rank FROM r WHERE rank <= {_ANN_K}
    """,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over the embeddings table (exact ANN
    baseline; JVM-native fold, no Python)."""
    from geografir_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _ANN_PROBES).selectExpr(
        "vec_id AS probe_id", "embedding AS pvec"
    )
    targets = emb.selectExpr("vec_id AS neighbor_id", "embedding AS tvec")
    return cosine_topk(probes, targets, k=_ANN_K)


@register("ann_lsh_topk", None)  # approximate — no SQL oracle (rows-only)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate cosine top-k (random hyperplanes, bucket
    equi-join + exact refine) — the 100 TB-scale ANN path."""
    from geografir_spark.operators.similarity import lsh_bucketed_topk

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _ANN_PROBES).selectExpr(
        "vec_id AS probe_id", "embedding AS pvec"
    )
    targets = emb.selectExpr("vec_id AS neighbor_id", "embedding AS tvec")
    return lsh_bucketed_topk(probes, targets, k=_ANN_K, dim=64, n_planes=4, n_tables=8)


# ---------------------------------------------------------------------------
# As-of-latest (windowed dedup — the url/warc_ts snapshot pattern)
# ---------------------------------------------------------------------------

@register(
    "asof_latest_event",
    """
    SELECT user_id, event_id, ts, value
    FROM (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_asof_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the as-of/url-snapshot-dedup pattern
    (Window.partitionBy(key).orderBy(ts desc) + row_number = 1)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "value")
    )
