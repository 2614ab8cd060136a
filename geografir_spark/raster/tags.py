"""BandTags lifted to Spark map columns (reference
raster_array/src/raster_array/band_tags.py:60-377).

Column shape: ``tags: map<int, map<string,string>>`` (band index, 1-based,
→ tag dict — §1.5 of SURVEY.md). Ops:

- ``band_indices``      map_keys (R24)
- ``tag_names``         explode + collect_set union (R26)
- ``tags_by_band``      the inverted index tag_name → {tag_value → band}
                        with later-band-wins on value collision
                        (band_tags.py:129-172, docstring example :151-157)
                        — a genuine distributed aggregation: explode both
                        map levels, groupBy(tag_name, tag_value).max(band).
- ``get_band_tags``     element_at with empty-map default (R27)
- ``update_band_tags``  immutable merge, new keys win (R28: map_concat)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_indices(df: DataFrame, tags_col: str = "tags", out: str = "band_indices") -> DataFrame:
    return df.withColumn(out, F.map_keys(F.col(tags_col)))


def tag_names(df: DataFrame, tags_col: str = "tags", key_cols: list[str] | None = None) -> DataFrame:
    """Distinct tag names across all bands, per key row."""
    keys = key_cols or ["tile_id"]
    e = df.select(*keys, F.explode(F.col(tags_col)).alias("band", "band_tags"))
    e = e.select(*keys, F.explode("band_tags").alias("tag_name", "tag_value"))
    return e.groupBy(*keys).agg(F.collect_set("tag_name").alias("tag_names"))


def explode_tags(df: DataFrame, tags_col: str = "tags", key_cols: list[str] | None = None) -> DataFrame:
    """(keys..., band_index, tag_name, tag_value) — the relational view."""
    keys = key_cols or ["tile_id"]
    e = df.select(*keys, F.explode(F.col(tags_col)).alias("band_index", "__bt"))
    return e.select(*keys, "band_index", F.explode("__bt").alias("tag_name", "tag_value"))


def tags_by_band(df: DataFrame, tags_col: str = "tags", key_cols: list[str] | None = None) -> DataFrame:
    """Inverted index rows (keys..., tag_name, tag_value, band_index) where
    band_index is the HIGHEST band carrying that (name, value) — the
    reference's later-bands-overwrite rule (band_tags.py:165-171)."""
    keys = key_cols or ["tile_id"]
    e = explode_tags(df, tags_col, keys)
    return e.groupBy(*keys, "tag_name", "tag_value").agg(
        F.max("band_index").alias("band_index")
    )


def get_band_tags_expr(tags_col: str, band_index: int) -> str:
    """SQL expr: tags for one band, {} when absent (band_tags.py:212-236)."""
    return f"coalesce(element_at({tags_col}, {band_index}), map())"


def update_band_tags_expr(tags_col: str, band_index: int, new_tags_expr: str) -> str:
    """SQL expr: immutable merge where new keys win (band_tags.py:238-284;
    map_concat in Spark keeps the LAST occurrence under
    spark.sql.mapKeyDedupPolicy=LAST_WIN — set by the caller's session)."""
    merged = (
        f"map_concat(coalesce(element_at({tags_col}, {band_index}), map()),"
        f" {new_tags_expr})"
    )
    return f"map_concat({tags_col}, map({band_index}, {merged}))"
