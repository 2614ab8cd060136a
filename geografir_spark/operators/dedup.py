"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline primitives over the documents/pages corpus. Every
algorithm is expressed twice from one generator — Spark SQL and DuckDB —
using only constructs with identical semantics (md5, integer modular
arithmetic, list lambdas), so the driver's oracle gate verifies the full
pipeline, not just row counts. The shared hash primitive is
``text.hash60_expr`` (md5-derived 60-bit BIGINT).

Scale shapes:
- exact:     one hash-groupBy (map-side partial agg) — embarrassingly scalable.
- minhash:   per-doc signature (narrow), explode to (band, sig) keys,
             self-join per band bucket — shuffle is O(docs × bands), and the
             band-bucket join only materializes same-bucket pairs.
- simhash:   per-doc 64-bit signature via bit-majority over token hashes —
             narrow agg; near-dup pairs via banding on 16-bit chunks.
- jaccard:   exact verification on candidate pairs (post-LSH refine).
"""

from __future__ import annotations

from geografir_spark.operators.text import hash60_expr, tokens_expr

# modular-hash family constants (31-bit prime keeps a*h+b inside int64)
_P = 2147483647
_A = [40503, 69069, 331, 9176, 20117, 5915, 50329, 11261,
      28411, 10445, 1093, 18257, 33703, 3919, 62323, 44111]
_B = [17, 8191, 333, 9929, 51787, 23333, 1023, 7577,
      4421, 90001, 55555, 12345, 67891, 31337, 2468, 13579]


def exact_dedup_sql(rel: str, id_col: str, text_col: str, dialect: str) -> str:
    """Content-hash dedup map: one row per distinct text with its multiplicity
    and the keeper (min id). Dedup = semi-join back on keeper_id; the full
    map (not just n_dups>1 groups) keeps the oracle check meaningful on
    corpora without duplicates."""
    return (
        f"SELECT md5({text_col}) AS content_hash, count(*) AS n_dups,"
        f" min({id_col}) AS keeper_id"
        f" FROM {rel} GROUP BY content_hash"
    )


def _shingles_expr(text_col: str, k: int, dialect: str) -> str:
    """k-word shingles as a list of strings (consistent 0/1-index handling
    per dialect; shingle text joined with single spaces).

    The token array is bound ONCE via a single-element-array lambda
    (``transform(array(split(..)), __t -> ..)``): the naive form repeats
    the split expression textually k times per shingle, so every token
    access re-tokenized the document — measured 4.7 s → 0.6 s for one
    8-gram explode over 5k docs at sf0.1."""
    toks = tokens_expr(text_col, dialect)
    joined = " || ' ' || ".join(f"__t[i + {j}]" for j in range(k))
    if dialect == "spark":
        # guard: sequence(0, -1) would generate a DESCENDING [0, -1]
        inner = (
            f"CASE WHEN size(__t) >= {k} THEN"
            f" transform(sequence(0, size(__t) - {k}), i -> {joined})"
            f" ELSE CAST(array() AS array<string>) END"
        )
        return f"flatten(transform(array({toks}), __t -> {inner}))"
    inner = (
        f"list_transform(range(1, greatest(len(__t) - {k - 2}, 1)),"
        f" i -> {joined})"
    )
    return f"flatten(list_transform([{toks}], __t -> {inner}))"


def minhash_signature_exprs(
    text_col: str, dialect: str, n_hashes: int = 16, shingle_k: int = 3
) -> list[dict[str, str]]:
    """Step list computing __mh0..__mh{n-1} minhash components."""
    if dialect == "spark":
        hashes = (
            f"transform({_shingles_expr(text_col, shingle_k, dialect)},"
            f" s -> {hash60_expr('s', dialect)} % {_P})"
        )
        steps = [{"__hs": hashes}]
        mh = {
            f"__mh{i}": (
                f"coalesce(array_min(transform(__hs,"
                f" h -> (h * {_A[i]} + {_B[i]}) % {_P})), {_P})"
            )
            for i in range(n_hashes)
        }
    else:
        hashes = (
            f"list_transform({_shingles_expr(text_col, shingle_k, dialect)},"
            f" s -> {hash60_expr('s', dialect)} % {_P})"
        )
        steps = [{"__hs": hashes}]
        mh = {
            f"__mh{i}": (
                f"coalesce(list_min(list_transform(__hs,"
                f" h -> (h * {_A[i]} + {_B[i]}) % {_P})), {_P})"
            )
            for i in range(n_hashes)
        }
    steps.append(mh)
    return steps


def band_sig_exprs(n_hashes: int = 16, bands: int = 4) -> dict[str, str]:
    """Band signatures: md5 over '_'-joined minhash components (rows per
    band emitted by the caller via explode/unnest or UNION ALL)."""
    rows_per_band = n_hashes // bands
    out = {}
    for b in range(bands):
        cols = [f"__mh{b * rows_per_band + j}" for j in range(rows_per_band)]
        concat = " || '_' || ".join(f"CAST({c} AS STRING)" for c in cols)
        out[f"__band{b}"] = f"md5({concat})"
    return out


def _bandrows_cte_sql(
    rel: str, id_col: str, text_col: str, dialect: str,
    n_hashes: int, bands: int, shingle_k: int,
) -> str:
    """``WITH sigs AS (...), bandrows AS (...)`` prefix shared by the pair
    generators. The Spark dialect emits band rows with ONE ``inline``
    generator so the signature pipeline is computed exactly once per doc
    (a ``UNION ALL`` of per-band selects re-inlines the CTE — Spark does
    not materialize CTEs — multiplying the shingle+md5 work by ``bands``);
    DuckDB materializes CTEs, so the flat UNION ALL form stays."""
    from geografir_spark.geo.cells import nested_sql

    sig_steps = minhash_signature_exprs(text_col, dialect, n_hashes, shingle_k)
    sig_steps.append(band_sig_exprs(n_hashes, bands))
    base = nested_sql(f"SELECT {id_col}, {text_col} FROM {rel}", sig_steps)
    if dialect == "spark":
        structs = ", ".join(
            f"named_struct('band_idx', {b}, 'sig', __band{b})" for b in range(bands)
        )
        band_rows = (
            f"SELECT {id_col} AS doc, inline(array({structs})) FROM sigs"
        )
    else:
        band_rows = " UNION ALL ".join(
            f"SELECT {id_col} AS doc, {b} AS band_idx, __band{b} AS sig FROM sigs"
            for b in range(bands)
        )
    return f"WITH sigs AS ({base}),\n         bandrows AS ({band_rows})"


def minhash_pairs_sql(
    rel: str,
    id_col: str,
    text_col: str,
    dialect: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 256,
) -> str:
    """Candidate near-duplicate pairs (doc_a < doc_b) sharing ≥1 LSH band.

    Spark dialect: bucket-grouped pair expansion — group band rows by
    (band_idx, sig), collect the sorted doc list per bucket, and generate
    in-bucket pairs with array lambdas. One signature pass + ONE shuffle
    on the bucket key; a band-bucket self-join would compute signatures on
    both sides (Spark inlines CTEs) and shuffle both. DuckDB keeps the
    self-join form (it materializes CTEs; the oracle optimizes for
    clarity) with a row_number rank replaying the cap below exactly.

    Degenerate-bucket cap (r3 verdict): a bucket of n identical docs used
    to expand to n²/2 pairs in ONE task's array — a boilerplate page
    repeated 10⁷ times is a 5·10¹³-row single-task blowup. Each bucket now
    pairs only its ``max_bucket`` smallest docs against everything after
    them: ≤ n·max_bucket pairs per bucket, pair array ≤ max_bucket·n
    structs, and transitive-dedup connectivity is preserved exactly
    (every doc still pairs with the bucket's minimum, so connected
    components are unchanged). Buckets with n ≤ max_bucket — all real
    near-dup buckets — emit every pair, identical to the uncapped form.
    The cap is part of the operator's contract and both dialects replay
    it, so capped outputs still oracle-match."""
    prefix = _bandrows_cte_sql(
        rel, id_col, text_col, dialect, n_hashes, bands, shingle_k
    )
    if dialect == "spark":
        return f"""
    {prefix},
         buckets AS (SELECT sort_array(collect_list(doc)) AS docs
                     FROM bandrows GROUP BY band_idx, sig HAVING count(*) > 1)
    SELECT DISTINCT doc_a, doc_b FROM (
      SELECT inline(flatten(transform(
               sequence(0, least(size(docs) - 2, {max_bucket - 1})),
               i -> transform(slice(docs, i + 2, size(docs) - i - 1),
                              d -> named_struct('doc_a', docs[i], 'doc_b', d)))))
      FROM buckets)
    """
    return f"""
    {prefix},
         ranked AS (SELECT doc, band_idx, sig,
                           row_number() OVER (PARTITION BY band_idx, sig
                                              ORDER BY doc) AS rk
                    FROM bandrows)
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM ranked a JOIN ranked b
      ON a.band_idx = b.band_idx AND a.sig = b.sig AND a.doc < b.doc
    WHERE a.rk <= {max_bucket}
    """


def incremental_minhash_sql(
    rel: str,
    id_col: str,
    text_col: str,
    dialect: str,
    *,
    new_pred: str,
    seen_pred: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> str:
    """Cross-batch near-dup gate: NEW docs (rows matching ``new_pred`` over
    the alias-free column name) that share an LSH band bucket with any
    SEEN doc (``seen_pred``) — the incremental form a production ingest
    runs instead of re-pairing the whole corpus. At scale the seen side is
    a stored (band_idx, sig, doc) bucket table maintained incrementally;
    the join shuffles O(|new| × bands) rows plus the matched buckets only.
    Returns one row per flagged new doc with its match count and the
    earliest seen match.

    Spark dialect: same bucket-grouped shape as ``minhash_pairs_sql`` —
    one signature pass, one shuffle; within each bucket the new×seen cross
    product comes from nested array lambdas over the predicate-filtered
    doc lists (both lists are tiny: a bucket is one LSH collision set)."""
    prefix = _bandrows_cte_sql(
        rel, id_col, text_col, dialect, n_hashes, bands, shingle_k
    )
    if dialect == "spark":
        np_, sp_ = new_pred.replace("__doc", "d"), seen_pred.replace("__doc", "d")
        return f"""
    {prefix},
         buckets AS (SELECT collect_list(doc) AS docs
                     FROM bandrows GROUP BY band_idx, sig HAVING count(*) > 1),
         cand AS (SELECT DISTINCT new_doc, seen_doc FROM (
           SELECT inline(flatten(transform(filter(docs, d -> ({np_})),
                    nd -> transform(filter(docs, d -> ({sp_})),
                          sd -> named_struct('new_doc', nd, 'seen_doc', sd)))))
           FROM buckets))
    SELECT new_doc, count(*) AS n_seen_matches, min(seen_doc) AS first_seen
    FROM cand GROUP BY new_doc
    """
    return f"""
    {prefix},
         cand AS (SELECT DISTINCT a.doc AS new_doc, b.doc AS seen_doc
                  FROM bandrows a JOIN bandrows b
                    ON a.band_idx = b.band_idx AND a.sig = b.sig
                  WHERE ({new_pred.replace('__doc', 'a.doc')})
                    AND ({seen_pred.replace('__doc', 'b.doc')}))
    SELECT new_doc, count(*) AS n_seen_matches, min(seen_doc) AS first_seen
    FROM cand GROUP BY new_doc
    """


def segment_dedup_sql(
    rel: str, id_col: str, text_col: str, dialect: str, seg_tokens: int = 20
) -> str:
    """Segment-level (line-level) dedup map — the RefinedWeb/CCNet shape:
    split each doc into fixed ``seg_tokens``-token segments, hash-dedup
    segments across the WHOLE corpus (keeper = lowest doc id), and report
    per-doc retained/dropped segment counts. Production pipelines run this
    between exact and near dedup: boilerplate (headers, nav bars, license
    blocks) repeats across docs whose full texts are unique.

    Scale shape: one scan, segments exploded (fan-out ≈ tokens/20 rows per
    doc), keeper via a min window keyed on the segment hash (ONE shuffle —
    a groupBy+self-join would rescan the corpus: Spark inlines CTEs), then
    one per-doc agg. All md5/integer ops; no corrections, no floats."""
    toks = tokens_expr(text_col, dialect)
    if dialect == "spark":
        nseg = f"CAST(ceil(size(t) / {seg_tokens}.0) AS INT)"
        seglist = (
            f"CASE WHEN size(t) >= 1 THEN transform(sequence(0, {nseg} - 1),"
            f" i -> md5(array_join(slice(t, i * {seg_tokens} + 1, {seg_tokens}), ' ')))"
            f" ELSE CAST(array() AS array<string>) END"
        )
        seg_rows = "SELECT doc_id, explode(segs) AS seg_hash FROM lists"
    else:
        nseg = f"CAST(ceil(len(t) / {seg_tokens}.0) AS INT)"
        seglist = (
            f"CASE WHEN len(t) >= 1 THEN list_transform(range(0, {nseg}),"
            f" i -> md5(array_to_string("
            f"list_slice(t, i * {seg_tokens} + 1, i * {seg_tokens} + {seg_tokens}), ' ')))"
            f" ELSE [] END"
        )
        seg_rows = "SELECT doc_id, unnest(segs) AS seg_hash FROM lists"
    return f"""
    WITH toks AS (SELECT {id_col} AS doc_id, {toks} AS t FROM {rel}),
         lists AS (SELECT doc_id, {seglist} AS segs FROM toks),
         segrows AS ({seg_rows}),
         k AS (SELECT doc_id,
                      min(doc_id) OVER (PARTITION BY seg_hash) AS keeper_doc
               FROM segrows)
    SELECT doc_id, count(*) AS n_segs,
           CAST(sum(CASE WHEN keeper_doc < doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_segs,
           min(keeper_doc) AS earliest_keeper
    FROM k GROUP BY doc_id
    """


def simhash_sql(rel: str, id_col: str, text_col: str, dialect: str) -> str:
    """64-bit SimHash per document: bit b set iff the majority of token
    hashes have bit b set. Token hash = shared md5-60-bit primitive; we use
    bits 0..63 of (h * A1 + B1) % 2^61-ish — here simply h's low bits plus a
    second mixed word to reach 64 bits of signal (60 from md5, 4 mixed)."""
    toks = tokens_expr(text_col, dialect)
    h = hash60_expr("t", dialect)
    if dialect == "spark":
        hashes = f"transform({toks}, t -> {h})"
        agg = "aggregate"  # Spark's fold
        sz = "size"
    else:
        hashes = f"list_transform({toks}, t -> {h})"
        agg = None
        sz = "len"
    # per-bit majority as 60 conditional sums over the exploded hash list;
    # emitted as explode + SUM(CASE) — identical shape in both dialects.
    unnest = "explode" if dialect == "spark" else "unnest"
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(60)
    )
    bits_or = " | ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST(1 AS BIGINT) << {b} ELSE 0 END)"
        for b in range(60)
    )
    if dialect == "spark":
        exploded = (
            f"SELECT {id_col}, explode({hashes}) AS h FROM {rel}"
        )
    else:
        exploded = (
            f"SELECT {id_col}, unnest({hashes}) AS h FROM {rel}"
        )
    return f"""
    WITH hx AS ({exploded}),
         bits AS (SELECT {id_col}, {bit_sums} FROM hx GROUP BY {id_col})
    SELECT {id_col}, ({bits_or}) AS simhash FROM bits
    """


def connected_components(
    edges,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    check_every: int = 2,
    shortcut: bool = True,
):
    """Connected components by hash-min label propagation WITH pointer
    doubling: every node's label converges to the MINIMUM node id
    reachable from it. The operator that turns near-duplicate PAIRS into
    duplicate GROUPS (one keeper per component) — the last stage of a
    dedup pipeline — and, composed with lattice adjacency, the cluster
    stage of cell-DBSCAN.

    Each round: label(v) ← min(label(v), min over neighbors' labels) (one
    join + groupBy(min)), then — ``shortcut=True`` — the pointer-doubling
    step label(v) ← min(label(v), label(label(v))) (labels ARE node ids,
    so one self-join): propagation distance doubles per round, so
    convergence is O(log diameter) instead of O(diameter). Near-dup
    clusters are shallow stars where this is moot, but LATTICE adjacency
    graphs snake — a 251-cell single component measured ~100 hash-min
    rounds (≈10 s of driver syncs) vs 8 doubled rounds (~1.5 s).
    ``localCheckpoint(eager=True)`` truncates the lineage so the plan
    stays O(1) per round (the knn ring-expansion pattern). The per-round
    driver sync (one scalar collect) is the dominant fixed cost at bench
    scale, so the fixpoint is only CHECKED every ``check_every`` rounds:
    labels are monotone non-increasing, so an unchanged sum across ANY
    span of rounds is still exactly the fixpoint. Shuffle per round is
    O(|E| + |V|), hash-partitioned on node id.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without reaching
    the fixpoint (a component deeper than the bound would otherwise be
    silently split; with doubling, 25 rounds cover any diameter < 2²⁵).

    Returns (id, label) for every node appearing in ``edges``.
    """
    from pyspark.sql import functions as F

    # checkpoint the symmetrized edge list ONCE: edges may be the head of an
    # expensive pipeline (the minhash candidate generator here) and every
    # round joins it — without the barrier that whole upstream DAG re-runs
    # per round (measured 54 s → 7 s at sf0.1)
    sym = (
        edges.selectExpr(f"{src} AS s", f"{dst} AS d")
        .unionByName(edges.selectExpr(f"{dst} AS s", f"{src} AS d"))
        .distinct()
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("s").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True)
    prev_sum = None
    converged = False
    for i in range(max_iter):
        neigh = (
            sym.join(labels, sym["d"] == labels["id"])
            .select(F.col("s").alias("id"), "label")
        )
        new = (
            labels.unionByName(neigh)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        if shortcut:
            # pointer doubling: label(v) ← min(label(v), label(label(v))).
            # Every label IS a node id (min over reachable ids), so the
            # self-join matches every row; reachability is transitive, so
            # the shortcut label stays in-component and ≥ the true min —
            # monotonicity and the sum-fixpoint check are unaffected.
            l2 = new.selectExpr("id AS l2id", "label AS l2label")
            new = (
                new.join(l2, new["label"] == l2["l2id"])
                .select("id", F.least("label", "l2label").alias("label"))
            )
        new = new.localCheckpoint(eager=True)
        labels = new
        if (i + 1) % check_every == 0 or i == max_iter - 1:
            # labels only ever decrease, so an unchanged sum IS the fixpoint —
            # one tiny agg instead of a join+count per check
            cur_sum = new.agg(F.sum("label")).collect()[0][0]
            if cur_sum == prev_sum:
                converged = True
                break
            prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter}"
            " rounds (component diameter exceeds the bound); raise max_iter"
        )
    return labels


def decontaminate_sql(
    train_rel: str,
    bench_rel: str,
    id_col: str,
    text_col: str,
    dialect: str,
    n: int = 8,
) -> str:
    """Benchmark decontamination (the GPT-3/Llama pre-training hygiene
    step): flag training documents that share any ``n``-token n-gram with
    a held-out benchmark/eval set, reporting per-doc overlap counts so a
    pipeline can drop or audit them before training.

    Scale shape: both sides tokenize and build n-grams map-side; per-doc
    gram dedup uses array_distinct INSIDE the gram array (no shuffle — the
    per-doc distinct count rides along as ``size()``), so each side is one
    scan + one explode. The benchmark gram set is tiny relative to a
    100 TB corpus (a few eval suites ≈ millions of grams), so Spark
    broadcasts it and the probe join never shuffles the training grams;
    were it ever large, the equi-join on the fixed-width md5 key still
    partitions evenly. Output only contaminated docs (sparse).
    """
    grams = _shingles_expr(text_col, n, dialect)
    if dialect == "spark":
        dg = f"transform(array_distinct({grams}), g -> md5(g))"
        erows = "SELECT doc_id, size(dg) AS n_grams, explode(dg) AS gh FROM __side"
    else:
        dg = f"list_transform(list_distinct({grams}), g -> md5(g))"
        erows = "SELECT doc_id, len(dg) AS n_grams, unnest(dg) AS gh FROM __side"
    return f"""
    WITH bdocs AS (SELECT {id_col} AS doc_id, {dg} AS dg FROM {bench_rel}),
         bgrams AS (SELECT DISTINCT gh
                    FROM ({erows.replace('__side', 'bdocs')})),
         tdocs AS (SELECT {id_col} AS doc_id, {dg} AS dg FROM {train_rel}),
         tgrams AS ({erows.replace('__side', 'tdocs')})
    SELECT {"/*+ BROADCAST(b) */" if dialect == "spark" else ""} t.doc_id,
           min(t.n_grams) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_contam_grams,
           min(t.gh) AS sample_gram
    FROM tgrams t JOIN bgrams b ON t.gh = b.gh
    GROUP BY t.doc_id
    """
