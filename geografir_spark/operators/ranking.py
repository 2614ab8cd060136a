"""BM25 ranked retrieval over a document table — the lexical-search
complement of the ANN operators in ``operators/similarity.py`` (hybrid
retrieval = BM25 candidates ∪ embedding candidates).

The whole scoring pipeline is expressed as dual-dialect SQL with the
repo's cross-engine exactness discipline:

- **log-free idf.** Textbook BM25 weighs each term by
  ``ln((N - df + 0.5) / (df + 0.5) + 1)``; ``ln`` is the one libm call
  whose rounding differs between engines, and because BM25 SUMS weights
  across terms the monotone-rank trick used by ``pmi_collocations``
  (drop the log, rank by the raw ratio) does not apply. We instead score
  with the *rational* idf ``(N - df + 0.5) / (df + 0.5)`` directly — a
  documented, deterministic variant: same term-frequency saturation and
  length normalization as BM25, steeper rarity weighting. Every input to
  the formula (tf, df, N, doc length, Σlen) is an exact integer, and the
  per-(doc, term) score is one fixed left-to-right chain of IEEE double
  ops, hence bit-identical across engines.
- **micro-integer accumulation.** Per-(doc, term) contributions are
  floored to 1e-6 units (``floor`` is exact on doubles) and summed as
  BIGINT, so the per-doc total is independent of aggregation order —
  Spark's partial aggregates and DuckDB's sums agree bit-for-bit.

Scale shape (the plan a 1000-executor run wants): the token explode is
filtered to the |Q| query terms *inside the generator projection*, so the
shuffled tf relation is ≤ |docs|·|Q| rows, not |tokens|; df is |Q| rows
(broadcast); corpus stats are one scalar row (broadcast); the final
ranking is a global top-k (TakeOrdered, no full sort). No per-row Python
anywhere.

Reference parity note: the reference has no search/ranking code (absent:
no matching code under /root/reference/) — this is an ENGINE operator
required by the training-data-pipeline mandate.
"""

from __future__ import annotations

from geografir_spark.operators.text import n_tokens_expr, tokens_expr

__all__ = ["bm25_sql"]


def bm25_sql(
    rel: str,
    id_col: str,
    text_col: str,
    terms: tuple,
    dialect: str,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 15,
) -> str:
    """Top-``k`` docs in ``rel`` for the bag-of-words query ``terms`` by
    rational-idf BM25. Output columns: ``doc_id, score_micro (BIGINT,
    1e-6 score units), n_terms (matched query terms)``.

    Ties on ``score_micro`` break by ``doc_id`` ascending.
    """
    if not terms:
        raise ValueError("bm25_sql: terms must be non-empty")
    toks = tokens_expr(text_col, dialect)
    ntok = n_tokens_expr(text_col, dialect)
    inlist = ", ".join(f"'{t}'" for t in terms)
    if dialect == "spark":
        tok_rows = (
            f"SELECT {id_col} AS doc_id, tok FROM {rel} "
            f"LATERAL VIEW explode({toks}) AS tok WHERE tok IN ({inlist})"
        )
    else:
        tok_rows = (
            f"SELECT {id_col} AS doc_id, unnest({toks}) AS tok FROM {rel}"
        )
        tok_rows = f"SELECT doc_id, tok FROM ({tok_rows}) WHERE tok IN ({inlist})"
    # one fixed left-to-right chain; every name below is integer-exact
    score = (
        "((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
        f" * (CAST(tf AS DOUBLE) * {1.0 + k1})"
        f" / (CAST(tf AS DOUBLE) + {k1} * ({1.0 - b} + {b}"
        " * (CAST(dlen AS DOUBLE)"
        " / (CAST(sum_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
    )
    return f"""
    WITH tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
                FROM ({tok_rows}) GROUP BY doc_id, tok),
         dl AS (SELECT {id_col} AS doc_id, CAST({ntok} AS BIGINT) AS dlen
                FROM {rel}),
         stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                          CAST(sum({ntok}) AS BIGINT) AS sum_len
                   FROM {rel}),
         df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY tok),
         contrib AS (SELECT tf.doc_id,
                            CAST(floor(({score}) * 1000000.0) AS BIGINT)
                              AS c_micro
                     FROM tf
                       JOIN df ON df.tok = tf.tok
                       JOIN dl ON dl.doc_id = tf.doc_id, stats)
    SELECT doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM contrib GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id LIMIT {k}
    """
