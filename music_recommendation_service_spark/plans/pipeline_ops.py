"""Training-data pipeline operators (q68-q72): the corpus-management ops a
large-scale LLM-data pipeline runs downstream of dedup/quality — dataset
splitting, stratified sampling, TF-IDF term weighting, denylist redaction,
and leakage-safe (dedup-aware) split assignment.

All randomness is DETERMINISTIC ARITHMETIC (multiplicative hashing on ids),
never engine RNG: the same document lands in the same split/sample in Spark,
in the DuckDB oracle, and on any re-run — reproducibility is a correctness
property for training data, and it is what makes these oracle-checkable.

Scale notes (100 TB):
- Split/sample assignment is a stateless per-row projection (no shuffle at
  all for q68's assignment; one group-shuffle only where per-group ranks are
  required). A modulo over a multiplicative hash gives uniform buckets
  without sorting or sampling passes over the corpus.
- TF-IDF shuffles (term) and (doc,term) keys — both bounded by token counts,
  with document frequency computed from the POST-aggregation per-doc term
  list, not the raw token stream.
- Redaction is one regexp projection inside whole-stage codegen; no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_recommendation_service_spark.functions import rnd, rnd_sql
from music_recommendation_service_spark.functions.dialect import register_sql
from music_recommendation_service_spark.plans import register
from music_recommendation_service_spark.sources.catalog import load_table as _t

# Knuth-style multiplicative hash constants; products stay far below 2^63
# for any realistic doc_id, so the arithmetic is exact (and identical) in
# both engines' BIGINT.
_MULT = 2654435761
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2147483648


def _bucket_sql(key: str) -> str:
    return f"(({key}) * {_MULT}) % 100"


def _bucket_col(key) -> F.Column:
    return (key * F.lit(_MULT)) % 100


_SPLIT_CASE = "CASE WHEN {b} < 80 THEN 'train' WHEN {b} < 90 THEN 'val' ELSE 'test' END"


def _split_col(bucket) -> F.Column:
    return (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )


# ---------------------------------------------------------------------------
# q68 — deterministic train/val/test split (80/10/10) by multiplicative hash
# of doc_id, reported per split x language. The assignment itself is a pure
# projection — at 100 TB it pushes into the scan with zero shuffles; only
# the small report aggregation shuffles (split, lang) keys.
# ---------------------------------------------------------------------------
@register(
    "q68_dataset_split",
    oracle=f"""
    SELECT {_SPLIT_CASE.format(b=_bucket_sql("doc_id"))} AS split,
           lang,
           CAST(count(*) AS BIGINT)   AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    tags=("pipeline", "split", "deterministic"),
)
def q68_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    split = _split_col(_bucket_col(F.col("doc_id")))
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# q69 — stratified sample: 20 documents per language, chosen by rank over an
# LCG hash of doc_id (deterministic "random" order, fully tie-broken). One
# shuffle on the stratum key; the window never materializes more than each
# partition's rows.
# ---------------------------------------------------------------------------
@register(
    "q69_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, CAST(rk AS INT) AS sample_rank
    FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M}, doc_id
               ) AS rk
        FROM documents
    ) WHERE rk <= 20
    """,
    tags=("pipeline", "sampling", "window"),
)
def q69_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    h = (F.col("doc_id") * _LCG_A + _LCG_C) % _LCG_M
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 20)
    )


# ---------------------------------------------------------------------------
# q70 — TF-IDF top terms: tf from the exploded token stream, df from
# distinct (doc, term) pairs, idf = ln((N+1)/(df+1)); top-3 terms per doc
# (sampled every 20th doc to bound output), ties broken by term. N is a
# 1-row broadcast. Both shuffles move (doc,term)/(term) aggregates, not raw
# tokens.
# ---------------------------------------------------------------------------
@register(
    "q70_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * ln((n.n + 1.0) / (df.df + 1.0)) AS tfidf
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        WHERE tf.doc_id % 20 = 0
    )
    SELECT doc_id, term, {rnd_sql("tfidf", 6)} AS tfidf, CAST(rk AS INT) AS rank
    FROM (
        SELECT doc_id, term, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
    tags=("pipeline", "tfidf", "text"),
)
def q70_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy(F.col("term").alias("df_term")).agg(
        F.count(F.lit(1)).alias("df")
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.filter(F.col("doc_id") % 20 == 0)
        .join(df, tf.term == F.col("df_term"))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0))
            ).alias("raw_tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("raw_tfidf"), F.asc("term"))
    return (
        scored.select(
            "doc_id",
            "term",
            "raw_tfidf",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", rnd(F.col("raw_tfidf"), 6).alias("tfidf"), "rank")
    )


# ---------------------------------------------------------------------------
# q71 — denylist redaction: scrub a term denylist from every document (the
# dictionary-based PII/compliance scrub shape — same plumbing as regex PII
# patterns, with a corpus-realistic denylist so the operator provably
# fires). One regexp projection in whole-stage codegen; no UDF, no shuffle
# before the report agg.
# ---------------------------------------------------------------------------
_DENY_RE = r"\b(customer|user|key)\b"


@register(
    "q71_denylist_redaction",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_DENY_RE}')) AS INT) AS n_redacted,
           CAST(length(regexp_replace(text, '{_DENY_RE}', '[REDACTED]', 'g'))
                AS INT) AS redacted_len
    FROM documents
    WHERE len(regexp_extract_all(text, '{_DENY_RE}')) > 0
    """,
    tags=("pipeline", "redaction", "regex"),
)
def q71_denylist_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # Spark SQL string literals ESCAPE backslashes (DuckDB's don't), so the
    # pattern embedded in expr() needs them doubled; the Python-API
    # regexp_replace below takes the raw Java regex unescaped.
    sql_re = _DENY_RE.replace("\\", "\\\\")
    n_red = F.size(F.expr(f"regexp_extract_all(text, '{sql_re}', 0)"))
    red_len = F.length(F.regexp_replace("text", _DENY_RE, "[REDACTED]"))
    return (
        d.select(
            "doc_id",
            n_red.cast("int").alias("n_redacted"),
            red_len.cast("int").alias("redacted_len"),
        )
        .filter(F.col("n_redacted") > 0)
    )


# ---------------------------------------------------------------------------
# q72 — leakage-safe split: exact-duplicate groups (md5 of text) must land
# in ONE split, so the split key is the group representative (min doc_id),
# not the document. This is the dedup-aware splitting every training
# pipeline needs to stop near-identical documents straddling train/test.
# One shuffle on content hash; the re-agg moves group-level rows.
# ---------------------------------------------------------------------------
@register(
    "q74_source_mixture",
    oracle=f"""
    WITH rated AS (
        SELECT doc_id, source, n_chars,
               CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN 100 ELSE 25 END AS keep_pct
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE {_bucket_sql("doc_id")} < keep_pct)
                AS BIGINT)          AS n_kept,
           CAST(sum(n_chars) FILTER (WHERE {_bucket_sql("doc_id")} < keep_pct)
                AS BIGINT)          AS kept_chars
    FROM rated
    GROUP BY source
    """,
    doc="Weighted per-source downsampling (training-mixture construction): "
    "even-numbered sources keep 100%, odd keep 25%, membership decided by "
    "the deterministic doc_id hash — a pure projection, zero extra passes.",
    tags=("pipeline", "sampling", "mixture"),
)
def q74_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    keep_pct = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, 100
    ).otherwise(25)
    kept = _bucket_col(F.col("doc_id")) < keep_pct
    return (
        d.select("doc_id", "source", "n_chars", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_chars"))).cast("long").alias(
                "kept_chars"
            ),
        )
    )


@register(
    "q72_leakage_safe_split",
    oracle=f"""
    WITH groups AS (
        SELECT md5(text) AS h,
               CAST(min(doc_id) AS BIGINT) AS rep,
               CAST(count(*) AS BIGINT)    AS group_size
        FROM documents
        GROUP BY md5(text)
    )
    SELECT {_SPLIT_CASE.format(b=_bucket_sql("rep"))} AS split,
           CAST(count(*) AS BIGINT)        AS n_groups,
           CAST(sum(group_size) AS BIGINT) AS n_docs
    FROM groups
    GROUP BY 1
    """,
    tags=("pipeline", "split", "dedup-aware"),
)
def q72_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    groups = d.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.min("doc_id").alias("rep"),
        F.count(F.lit(1)).alias("group_size"),
    )
    split = _split_col(_bucket_col(F.col("rep")))
    return (
        groups.select(split.alias("split"), "group_size")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("group_size").cast("long").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# q84 — benchmark decontamination: flag training documents sharing word
# 5-gram shingles with a held-out "benchmark" slice (doc_id % 50 = 0 stands
# in for an eval set; production pipelines use 8-13-grams over real
# benchmarks). The canonical pretraining-hygiene op the reference has no
# analogue for (its only dedup-style op is P6 distinct,
# process_collaborative_filtering.py:25).
#
# Scale design: the benchmark shingle index is DISTINCT'd and BROADCAST —
# eval suites are O(1e6) shingles regardless of corpus size, so the 100 TB
# train side streams through a broadcast hash join with ZERO train-side
# shuffle; the only shuffle is the per-doc count aggregation (partial+final,
# rows = docs x 1). The /*+ BROADCAST(e) */ hint pins the plan even when
# file-level stats are missing; DuckDB reads it as a plain block comment, so
# ONE SQL text serves both engines.
# ---------------------------------------------------------------------------
def _grams_sql(d: dict, n: int) -> str:
    """Word n-gram list (with duplicates), same construction as dedup.py."""
    toks = d["split"]("text")
    joined = ", ".join(d["elem"](toks, f"i + {j}") for j in range(n))
    upper = f"greatest({d['len']}({toks}) - {n - 1}, 0)"
    return f"{d['lt']}({d['seq'](1, upper)}, i -> concat_ws(' ', {joined}))"


def _q84(d: dict) -> str:
    distinct_grams = f"{d['ldistinct']}({_grams_sql(d, 5)})"
    return f"""
    WITH ev AS (
        SELECT DISTINCT {d["explode"](distinct_grams, "s")}
        FROM documents WHERE doc_id % 50 = 0
    ),
    tr AS (
        SELECT doc_id, {d["explode"](distinct_grams, "s")}
        FROM documents WHERE doc_id % 50 <> 0
    )
    SELECT /*+ BROADCAST(e) */
           t.doc_id,
           CAST(count(*) AS BIGINT)   AS n_shingles,
           CAST(count(e.s) AS BIGINT) AS n_shared,
           {rnd_sql("count(e.s) * 1.0 / count(*)", 6)} AS contamination,
           CAST(count(e.s) * 4 >= count(*) AS INT) AS is_contaminated
    FROM tr t LEFT JOIN ev e ON t.s = e.s
    GROUP BY t.doc_id
    """


register_sql(
    "q84_benchmark_decontamination",
    _q84,
    ("documents",),
    doc="Train-vs-benchmark 5-gram overlap via a broadcast eval shingle "
    "index; contamination = shared/total distinct shingles, flagged at 25%.",
    tags=("pipeline", "decontamination", "dedup", "broadcast"),
)


# ---------------------------------------------------------------------------
# q85 — intra-document repetition signals (the Gopher repetition filters
# q23's length/punct/stopword score does not cover): duplicate-2-gram
# fraction and top-2-gram fraction per document. Entirely row-local array
# lambdas inside whole-stage codegen — an embarrassingly-parallel map with
# NO shuffle at any scale. The top-gram count is O(distinct x total) per row,
# fine for these docs (<=99 words); for book-length documents the scale path
# is array_sort + run-length aggregate (O(n log n) row-local, still no
# shuffle).
# ---------------------------------------------------------------------------
def _q85(d: dict) -> str:
    lmax = (
        (lambda l: f"array_max({l})")
        if d["name"] == "spark"
        else (lambda l: f"list_aggregate({l}, 'max')")
    )
    top = lmax(f"{d['lt']}({d['ldistinct']}(g), x -> {d['len']}({d['lf']}(g, y -> y = x)))")
    n = f"{d['len']}(g)"
    nd = f"{d['len']}({d['ldistinct']}(g))"
    return f"""
    SELECT doc_id,
           CAST({n} AS BIGINT) AS n_grams,
           {rnd_sql(f"({n} - {nd}) * 1.0 / {n}", 6)} AS dup_gram_frac,
           {rnd_sql(f"{top} * 1.0 / {n}", 6)}        AS top_gram_frac
    FROM (SELECT doc_id, {_grams_sql(d, 2)} AS g FROM documents)
    """


register_sql(
    "q85_repetition_signals",
    _q85,
    ("documents",),
    doc="Gopher-style repetition quality signals: duplicate-2-gram and "
    "top-2-gram fractions, computed row-locally with zero shuffles.",
    tags=("text", "quality", "repetition"),
)


# ---------------------------------------------------------------------------
# q91 — sequence packing (concat-and-chunk): documents are laid end-to-end
# per language shard in doc_id order and cut into fixed 512-token training
# sequences; each doc gets its chunk id, its token offset inside the shard
# stream, and a straddle flag (crosses a chunk boundary -> would be split
# across training sequences).
#
# Scale shape: ONE window per shard (partitionBy lang), cumulative-sum only
# — no joins, no explode. Shards bound window-state and parallelize the
# sort; at 100 TB the shard key is (lang, file-group) so every partition
# sorts a bounded slice. The window is the whole operator: packing IS a
# prefix sum.
# ---------------------------------------------------------------------------
_SEQ_LEN = 512


def _q91(d: dict) -> str:
    n_tokens = f"CAST({d['len']}({d['split']('text')}) AS BIGINT)"
    start = "(cum - n_tokens)"
    return f"""
    WITH toks AS (
        SELECT doc_id, lang, {n_tokens} AS n_tokens FROM documents
    ),
    packed AS (
        SELECT doc_id, lang, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM toks
    )
    SELECT doc_id, lang, n_tokens,
           CAST({d['idiv'](start, _SEQ_LEN)} AS INT)    AS bin_id,
           CAST({start} AS BIGINT)                      AS start_offset,
           CAST(CASE WHEN {d['idiv'](start, _SEQ_LEN)}
                      <> {d['idiv']('(cum - 1)', _SEQ_LEN)}
                THEN 1 ELSE 0 END AS INT)               AS straddles
    FROM packed
    """


register_sql(
    "q91_sequence_packing",
    _q91,
    ("documents",),
    doc="Concat-and-chunk sequence packing into 512-token training bins per "
    "language shard: chunk id, stream offset, boundary-straddle flag via "
    "one per-shard prefix-sum window.",
    tags=("pipeline", "packing", "tokens"),
)


# ---------------------------------------------------------------------------
# q99 — the CURATION PIPELINE composed end-to-end: exact dedup (keep-first)
# -> quality filter -> deterministic split -> per-(split, source) corpus
# report. Each stage is an operator the catalog already proves in isolation
# (q26 dedup, q23-style quality signals, q68 split); this query pins that
# they COMPOSE — the shape a real training-data curation run has — with one
# DuckDB oracle over the whole dataflow.
#
# Scale: dedup is the only wide stage (one shuffle keyed by the 32-byte
# content hash); quality + split are stateless projections fused into the
# same stage; the report is a low-cardinality groupBy. Nothing here is
# quadratic and nothing leaves codegen.
# ---------------------------------------------------------------------------
def _q99(d: dict) -> str:
    toks = d["split"]("text")
    n_toks = f"{d['len']}({toks})"
    return f"""
    WITH corpus AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text, source
        FROM documents WHERE doc_id % 5 = 0
    ),
    deduped AS (
        SELECT doc_id, text, source
        FROM (
            SELECT doc_id, text, source,
                   row_number() OVER (
                       PARTITION BY md5(text) ORDER BY doc_id
                   ) AS rn
            FROM corpus
        )
        WHERE rn = 1
    ),
    scored AS (
        SELECT doc_id, source,
               CAST({n_toks} AS BIGINT) AS n_tokens,
               length(text) AS n_chars
        FROM deduped
    ),
    filtered AS (
        SELECT * FROM scored
        WHERE n_tokens >= 20 AND n_chars * 1.0 / n_tokens BETWEEN 3 AND 12
    ),
    assigned AS (
        SELECT source, n_tokens,
               {_SPLIT_CASE.format(b=_bucket_sql("doc_id"))} AS split
        FROM filtered
    )
    SELECT split, source,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM assigned
    GROUP BY split, source
    ORDER BY split, source
    """


register_sql(
    "q99_curation_pipeline",
    _q99,
    ("documents",),
    doc="End-to-end curation: exact dedup (keep-first) -> quality filter "
    "-> deterministic 80/10/10 split -> per-(split, source) token report.",
    tags=("llm-pipeline", "composition", "dedup", "split"),
)


# ---------------------------------------------------------------------------
# q107 — deterministic weighted sampling without replacement (Efraimidis-
# Spirakis A-ES): each document draws a deterministic uniform u from a
# multiplicative hash of its id and competes on the key -ln(u)/w (w =
# n_chars); the k SMALLEST keys are the sample. Long documents win
# proportionally more often — the importance-weighted corpus subsample
# every mixture builder needs.
#
# Scale shape: the key is a stateless projection; selection is a global
# top-k (TakeOrderedAndProject — no full sort). Determinism: u is exact
# integer arithmetic in both engines, and -ln(u)/w applies the same IEEE
# ops to the same doubles, so both engines order identically (doc_id
# tiebreak makes it total).
# ---------------------------------------------------------------------------
_WS_K = 20


def _q107_sql(duck: bool) -> str:
    u = f"((doc_id * {_MULT}) % {_LCG_M} + 0.5) / {_LCG_M}.0"
    key = f"(-ln({u}) / n_chars)"
    # ORDER BY + LIMIT (not a global row_number window) so Spark plans
    # TakeOrderedAndProject — per-partition heaps, never a one-partition
    # sort of the corpus; the ranking window then runs over k rows only.
    return f"""
    WITH top AS (
        SELECT doc_id, n_chars, {key} AS es_key
        FROM documents
        WHERE n_chars > 0
        ORDER BY es_key, doc_id
        LIMIT {_WS_K}
    )
    SELECT doc_id, n_chars,
           round(es_key + 1e-12, 9) AS es_key,
           CAST(row_number() OVER (ORDER BY es_key, doc_id) AS INT)
               AS sample_rank
    FROM top
    """


@register(
    "q107_weighted_sample",
    oracle=_q107_sql(duck=True),
    doc=f"Efraimidis-Spirakis weighted sampling without replacement: "
    f"top-{_WS_K} docs by -ln(hash-uniform)/n_chars (deterministic, "
    "importance-weighted).",
    tags=("pipeline", "sampling", "weighted", "deterministic"),
)
def q107_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_q107_sql(duck=False))
