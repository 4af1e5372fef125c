"""Text-analysis queries over the ``documents`` table — the training-data
pipeline operations beyond the reference's string surface (its only string op
is ``split``, SURVEY.md §2.8): token counting, language ID, quality scoring,
document fingerprinting, corpus token frequencies.

Scale design
------------
Every query is a single scan + narrow projection of JVM-side array/lambda
expressions (``split``/``filter``/``transform``/``aggregate``), fully inside
whole-stage codegen — no Python UDFs, no shuffles except the final group-by,
which is partial+final hash-aggregated. Per-document outputs (q21/q24) keep
the input partitioning: at 100 TB this is an embarrassingly-parallel map.
q25 explodes tokens before aggregating: the explode widens rows ~64×, but the
partial aggregate collapses them back to |vocab| per partition before the one
shuffle, so shuffle volume is O(vocab × partitions), not O(corpus tokens).

Every expression has an exact DuckDB twin (engine-portable md5-derived
hashes, identical lambda semantics), so the oracles pin cross-engine
semantics bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_recommendation_service_spark.functions import rnd, rnd_sql
from music_recommendation_service_spark.operators.text import (
    hash16,
    hash16_sql,
    shingles,
    shingles_sql,
    tokens,
)
from music_recommendation_service_spark.plans import register
from music_recommendation_service_spark.sources.catalog import load_table as _t

# Function-word probe sets per language: the classic n-gram/stopword
# language-ID heuristic (each set is the language's highest-frequency
# function words). Ordered — ties resolve to the earlier entry.
LANG_PROBES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "a", "of", "and")),
    ("es", ("el", "la", "de", "y")),
    ("de", ("der", "die", "und", "das")),
    ("fr", ("le", "la", "et", "les")),
)


def _probe_count_spark(lang_words: tuple[str, ...], col: str = "text") -> str:
    preds = " OR ".join(f"t = '{w}'" for w in lang_words)
    return f"size(filter(split({col}, ' '), t -> {preds}))"


def _probe_count_duck(lang_words: tuple[str, ...], col: str = "text") -> str:
    preds = " OR ".join(f"t = '{w}'" for w in lang_words)
    return f"len(list_filter(string_split({col}, ' '), t -> {preds}))"


def _argmax_case(names: list[str]) -> str:
    """Nested CASE computing the argmax label over count columns ``names``;
    ties break toward the earlier (more frequent on the web) language.
    Identical SQL is valid in Spark and DuckDB."""
    clauses = []
    for i, n in enumerate(names[:-1]):
        ge = " AND ".join(f"{n} >= {m}" for m in names[i + 1 :])
        clauses.append(f"WHEN {ge} THEN '{n}'")
    return f"CASE {' '.join(clauses)} ELSE '{names[-1]}' END"


# ---------------------------------------------------------------------------
# q21 — per-document token statistics (token counting for a training corpus).
# ---------------------------------------------------------------------------
@register(
    "q21_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT)                AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
           {rnd_sql("len(list_distinct(string_split(text, ' '))) * 1.0"
                    " / len(string_split(text, ' '))", 6)}          AS type_token_ratio,
           {rnd_sql("length(text) * 1.0 / len(string_split(text, ' '))", 6)}
                                                                    AS chars_per_token
    FROM documents
    """,
    doc="Whitespace token counts, vocabulary size, type-token ratio per doc.",
    tags=("text", "tokens"),
)
def q21_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        rnd(nd * 1.0 / n, 6).alias("type_token_ratio"),
        rnd(F.length("text") * 1.0 / n, 6).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# q22 — language identification (stopword-probe heuristic) + confusion matrix
# against the labeled lang column.
# ---------------------------------------------------------------------------
def _q22_sql(probe_fn) -> str:
    counts = ", ".join(
        f"{probe_fn(words)} AS {lang}" for lang, words in LANG_PROBES
    )
    case = _argmax_case([lang for lang, _ in LANG_PROBES])
    return f"""
    SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n_docs
    FROM (
        SELECT lang, {case} AS predicted
        FROM (SELECT lang, {counts} FROM documents)
    )
    GROUP BY lang, predicted
    """


@register(
    "q22_language_id",
    oracle=_q22_sql(_probe_count_duck),
    doc="Stopword-probe language ID; confusion counts vs the labeled lang.",
    tags=("text", "lang-id"),
)
def q22_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_q22_sql(_probe_count_spark))


# ---------------------------------------------------------------------------
# q23 — document quality scoring: length / punctuation / stopword signals
# combined into one score, bucketed. The standard pre-training corpus filter
# (Gopher/C4-style heuristics) as pure column expressions.
# ---------------------------------------------------------------------------
_Q23_SPARK_STOP = _probe_count_spark(LANG_PROBES[0][1])
_Q23_DUCK_STOP = _probe_count_duck(LANG_PROBES[0][1])


def _q23_sql(stop_expr: str, split_len: str, nonword: str) -> str:
    return f"""
    SELECT bucket,
           CAST(count(*) AS BIGINT)      AS n_docs,
           {rnd_sql("avg(score)", 6)}    AS avg_score,
           {rnd_sql("min(score)", 6)}    AS min_score,
           {rnd_sql("max(score)", 6)}    AS max_score
    FROM (
        SELECT CASE WHEN score >= 0.5 THEN 'high'
                    WHEN score >= 0.25 THEN 'medium'
                    ELSE 'low' END AS bucket,
               score
        FROM (
            -- CAST: keep the score in DOUBLE — decimal-literal arithmetic
            -- would make Spark's avg() a scale-5 DECIMAL (truncating) while
            -- DuckDB's stays full-precision.
            SELECT CAST(CASE WHEN n_tok BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END
                    + CASE WHEN nonword_ratio < 0.05 THEN 0.3 ELSE 0.0 END
                    + CASE WHEN stop_ratio >= 0.01 THEN 0.3 ELSE 0.0 END
                    AS DOUBLE) AS score
            FROM (
                SELECT {split_len} AS n_tok,
                       {nonword} * 1.0 / length(text)  AS nonword_ratio,
                       {stop_expr} * 1.0 / {split_len} AS stop_ratio
                FROM documents
            )
        )
    )
    GROUP BY bucket
    """


_Q23_SPARK = _q23_sql(
    _Q23_SPARK_STOP,
    "size(split(text, ' '))",
    "length(regexp_replace(text, '[a-z0-9 ]', ''))",
)
_Q23_DUCK = _q23_sql(
    _Q23_DUCK_STOP,
    "len(string_split(text, ' '))",
    "length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))",
)


@register(
    "q23_quality_score",
    oracle=_Q23_DUCK,
    doc="Gopher-style quality heuristics (length, punctuation, stopword "
    "density) combined into a bucketed score distribution.",
    tags=("text", "quality"),
)
def q23_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_Q23_SPARK)


# ---------------------------------------------------------------------------
# q24 — document fingerprinting: md5 content hash (exact-dup key) + min
# shingle-hash (MinHash-1 of 3-gram shingles — the winnowing/rolling-hash
# fingerprint unit). Per-doc map, no shuffle.
# ---------------------------------------------------------------------------
@register(
    "q24_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5(text) AS content_hash,
           CAST(list_aggregate({
               'list_transform(' + shingles_sql('text', 3) + ', s -> ' + hash16_sql('s') + ')'
           }, 'min') AS INT) AS min_shingle_hash
    FROM documents
    """,
    doc="Exact content hash + MinHash-1 shingle fingerprint per document.",
    tags=("text", "fingerprint"),
)
def q24_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    sh = shingles("text", 3)
    return d.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.array_min(F.transform(sh, lambda s: hash16(s)))
        .cast("int")
        .alias("min_shingle_hash"),
    )


# ---------------------------------------------------------------------------
# q25 — corpus token frequencies: explode -> partial-agg -> top-k.
# ---------------------------------------------------------------------------
@register(
    "q25_token_frequencies",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 25
    """,
    doc="Global token frequency top-25 (explode + partial agg + top-k).",
    bench=True,
    tags=("text", "explode", "A1", "O2"),
)
def q25_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q38 — token counting, whitespace + BPE-ish: subword estimate as
# ceil(len/4) chunks per word (the standard ~4-chars-per-token budget rule),
# all JVM-side array expressions. Dialect-generated, oracle = same text.
# ---------------------------------------------------------------------------
def _q38(d: dict) -> str:
    toks = d["split"]("text")
    sub = f"{d['lt']}({toks}, t -> CAST(ceil(length(t) / 4.0) AS BIGINT))"
    if d["name"] == "duck":
        n_sub = f"CAST(list_sum({sub}) AS BIGINT)"
    else:
        n_sub = f"aggregate({sub}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    return f"""
    SELECT doc_id,
           CAST({d['len']}({toks}) AS BIGINT) AS n_ws_tokens,
           {n_sub}                            AS n_bpe_tokens,
           CAST(length(text) AS BIGINT)       AS n_chars_actual
    FROM documents
    """


def _register_q38():
    from music_recommendation_service_spark.functions.dialect import register_sql

    register_sql(
        "q38_token_budget",
        _q38,
        ("documents",),
        doc="Whitespace + BPE-ish (ceil(len/4) subword) token counts per doc "
        "— the training-token budget estimator.",
        tags=("text", "tokens", "bpe"),
    )


_register_q38()


# ---------------------------------------------------------------------------
# q112 — pattern-scrub normalization: replace digit runs with a <NUM>
# placeholder and measure the scrub per event_type. The standard
# pre-training normalization/PII-scrub pass (numbers, ids, timestamps
# collapse to placeholders so near-identical log/template strings dedup
# and the model never memorizes literal identifiers); here it runs over
# the events.props JSON payloads, whose numeric values are exactly the
# volatile part. n_templates counts DISTINCT post-scrub strings — the
# template-cardinality collapse a scrub is for (raw props are ~all
# distinct; scrubbed ones collapse to a handful of shapes).
#
# Scale design: pure whole-stage-codegen regexp expressions (no UDF, no
# explode); one hash aggregate keyed by event_type; count(DISTINCT x)
# rewrites to the standard two-level expand+agg. The regex is anchored to
# digit runs only — linear scans, no backtracking blowup.
# ---------------------------------------------------------------------------
def _q112(d: dict) -> str:
    if d["name"] == "duck":
        scrub = "regexp_replace(props, '[0-9]+', '<NUM>', 'g')"
    else:
        scrub = "regexp_replace(props, '[0-9]+', '<NUM>')"
    # Spark's regexp_extract_all defaults to capture-group 1; group 0 (the
    # whole match) is what a groupless scrub pattern needs. DuckDB's default
    # is already 0.
    grp = ", 0" if d["name"] == "spark" else ""
    n_runs = f"{d['len']}(regexp_extract_all(props, '[0-9]+'{grp}))"
    return f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT)                 AS n_events,
           CAST(sum({n_runs}) AS BIGINT)            AS n_digit_runs,
           {rnd_sql(f"avg({n_runs})", 6)}           AS avg_digit_runs,
           CAST(count(DISTINCT {scrub}) AS BIGINT)  AS n_templates,
           CAST(count(DISTINCT props) AS BIGINT)    AS n_raw
    FROM events
    GROUP BY event_type
    """


def _register_q112():
    from music_recommendation_service_spark.functions.dialect import register_sql

    register_sql(
        "q112_pattern_scrub",
        _q112,
        ("events",),
        doc="Digit-run <NUM> scrub over events.props: per-event-type scrub "
        "volume and template-cardinality collapse (distinct raw vs distinct "
        "scrubbed strings).",
        tags=("text", "normalization", "scrub", "llm-pipeline"),
    )


_register_q112()


# ---------------------------------------------------------------------------
# q132 — EXACT token heavy hitters with sketch-bounded state (freq > n/k,
# k=50): pass 1 folds each partition through a k-counter Misra-Gries
# summary (union of survivors is a guaranteed SUPERSET of the true heavy
# hitters — pigeonhole over partitions), pass 2 exact-counts the candidates
# only behind a broadcast semi-join. Shuffle volume O(partitions x k)
# instead of O(vocab); output exact, so the plain-SQL oracle pins it
# value-for-value. See operators/heavyhitters.py for the guarantee.
# ---------------------------------------------------------------------------
_HH_K = 50


def _q132_build(spark, sf_dir):
    from pyspark.sql import functions as F

    from music_recommendation_service_spark.operators.heavyhitters import (
        heavy_hitters,
    )
    from music_recommendation_service_spark.sources.catalog import load_table

    from music_recommendation_service_spark.sources.writers import (
        scratch_materialize,
    )

    # Both heavy-hitter passes (the Misra-Gries sketch and the exact
    # verification) consume the token stream; materialize the split+explode
    # once (round-12) so pass 2 re-reads skinny parquet instead of
    # re-running the string pipeline.
    toks = scratch_materialize(
        load_table(spark, sf_dir, "documents").select(
            F.explode(F.split("text", " ")).alias("item")
        ),
        "q132_toks",
    )
    return heavy_hitters(toks, "item", _HH_K).orderBy("item")


register(
    "q132_token_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS item FROM documents),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
    SELECT item, CAST(count(*) AS BIGINT) AS freq
    FROM tok, tot
    GROUP BY item, n
    HAVING count(*) * {_HH_K} > n
    ORDER BY item
    """,
    doc=f"Exact 1/{_HH_K} token heavy hitters via per-partition Misra-Gries "
    "candidates + broadcast exact verification (O(parts*k) shuffle).",
    tags=("text", "sketch", "heavy-hitters", "llm-pipeline"),
)(_q132_build)
