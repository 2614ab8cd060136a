"""Sequence packing: the concatenate-and-chunk stage of an LLM training
pipeline (GPT-style dataset packing — docs are concatenated in a stable
order and cut into fixed ``seq_tokens``-token training sequences; a doc
may straddle a cut).

Expressed as pure dual-dialect SQL over integer token counts:

- per-shard running token offset via a window cumulative sum
  (PARTITION BY the shard column ORDER BY doc id — packing is per shard,
  which is both what production does (pack within a language/source
  shard so sequences are homogeneous) and what scales: an unpartitioned
  prefix sum would be a single reducer, a per-shard window parallelizes
  across shards);
- each doc's sequence span [s0, s1] by floor division of its start/end
  offsets; straddling docs explode into one row per overlapped sequence
  (fan-out = doc_tokens / seq_tokens, bounded);
- one groupBy (shard, seq) for the per-sequence manifest: doc count,
  straddle count, filled token count (= seq_tokens except each shard's
  last sequence), first/last doc.

Everything is BIGINT arithmetic (counts, cumsums, floor divisions, clamped
interval overlaps), so Spark and DuckDB agree bit-for-bit and the driver's
value-hash gate verifies the full packing manifest.
"""

from __future__ import annotations

from geografir_spark.operators.text import n_tokens_expr


def pack_sequences_sql(
    rel: str,
    id_col: str,
    text_col: str,
    shard_col: str,
    dialect: str,
    seq_tokens: int = 512,
) -> str:
    """Per-(shard, sequence) packing manifest for fixed-size training
    sequences of ``seq_tokens`` tokens. Output columns: ``shard, seq,
    n_docs, n_straddle, n_tokens_filled, first_doc, last_doc``.
    """
    C = seq_tokens
    ntok = n_tokens_expr(text_col, dialect)
    if dialect == "spark":
        idiv = "DIV"
        ex = "SELECT shard, doc_id, n, cum, s0, s1, explode(sequence(s0, s1)) AS seq FROM spans"
    else:
        idiv = "//"
        ex = (
            "SELECT shard, doc_id, n, cum, s0, s1,"
            " unnest(range(CAST(s0 AS BIGINT), CAST(s1 + 1 AS BIGINT))) AS seq"
            " FROM spans"
        )
    return f"""
    WITH t AS (SELECT {shard_col} AS shard, {id_col} AS doc_id,
                      CAST({ntok} AS BIGINT) AS n
               FROM {rel}),
         c AS (SELECT shard, doc_id, n,
                      CAST(sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT) AS cum
               FROM t),
         spans AS (SELECT shard, doc_id, n, cum,
                          (cum - n) {idiv} {C} AS s0,
                          (cum - 1) {idiv} {C} AS s1
                   FROM c),
         ex AS ({ex})
    SELECT shard, CAST(seq AS BIGINT) AS seq,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN s1 > seq THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddle,
           CAST(sum(least(cum, (seq + 1) * {C})
                    - greatest(cum - n, seq * {C})) AS BIGINT)
             AS n_tokens_filled,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM ex GROUP BY shard, seq
    """
