"""Similarity search over the ``embeddings`` table (``array<float>`` column):
brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed approximate variant as the scale path.

Scale design
------------
- q31 (brute force) is exact k-NN: the query set (a small fixed slice) is
  broadcast against the candidate corpus — one pass over the big side, no
  shuffle of the corpus itself; ranking shuffles only (query, candidate,
  score) triples, partitioned by query id. Cost is O(|Q| x N): the baseline
  you run per-batch, not per-request.
- q32 (LSH ANN) replaces the O(|Q| x N) scan with signature buckets: 16
  deterministic random-hyperplane sign bits per vector (a pure map, computed
  in one pass, whole-stage codegen), banded 2 x 8 bits; candidates are
  vectors sharing a band bucket with a query, so the join is equi on
  (band, bucket) and the per-query work is O(bucket size). At 100 TB the
  signature table is the only thing shuffled (~24 B/row), and band buckets
  are splittable by AQE if skewed.

Hyperplanes are derived from md5 in pure Python (no RNG state) and inlined
as double-literal arrays into BOTH dialects, so Spark and the DuckDB oracle
score identical geometry.
"""

from __future__ import annotations

import hashlib

from music_recommendation_service_spark.functions import rnd_sql
from music_recommendation_service_spark.functions.dialect import DUCK, SPARK, register_sql

DIM = 64
N_PLANES = 24
# 4 bands of 6 sign bits + margin-ordered multi-probe (Lv et al., "Multi-
# Probe LSH", VLDB'07). Per-band match probability for two vectors at angle
# θ is (1 - θ/π)^r, so longer bands (r=6) cut the random-pair candidate
# share ~8x vs r=4 — and the recall that costs is bought back by ALSO
# probing, per band, the buckets reached by flipping the _N_PROBES sign
# bits with the smallest |projection| margin (a near-duplicate's wrong bit
# is overwhelmingly a near-boundary bit). Measured on the fixed testdata
# (tests/test_ann_recall.py): recall@10 0.70 at 29% candidate share
# (sf0.001), vs 0.44 at 22% for the old exact-bucket r=4 config.
# _BAND_BITS trades candidates for recall; _N_PROBES buys recall back at
# ~linear probe-row cost (probe rows are metadata — 3 ints per row).
_BAND_BITS = 6
_N_PROBES = 4


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1)^DIM from md5 —
    reproducible across engines/sessions with no RNG."""
    planes = []
    for i in range(N_PLANES):
        row = []
        for j in range(DIM):
            h = int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)
            row.append(round(h / 2**31 - 1.0, 6))
        planes.append(row)
    return planes


HYPERPLANES = _hyperplanes()


# ---------------------------------------------------------------------------
# q31 — exact brute-force cosine top-k (k=10) for the fixed query slice
# vec_id % 100 == 0. Ties broken by neighbor id.
# ---------------------------------------------------------------------------
def _q31(d: dict) -> str:
    dot_qc = d["dot"]("q.v", "c.v")
    return f"""
    WITH e AS (
        SELECT vec_id, {d['dblarr']('embedding')} AS v FROM embeddings
    ),
    n AS (
        SELECT vec_id, v, sqrt({d['dot']('v', 'v')}) AS nrm FROM e
    ),
    q AS (
        SELECT vec_id, v, nrm FROM n WHERE vec_id % 100 = 0
    ),
    scored AS (
        SELECT q.vec_id AS query_id,
               c.vec_id AS neighbor_id,
               ({dot_qc}) / (q.nrm * c.nrm) AS cos
        FROM q JOIN n c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id,
           {rnd_sql('cos', 6)}  AS cosine,
           CAST(rnk AS INT)     AS rank
    FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id
               ) AS rnk
        FROM scored
    )
    WHERE rnk <= 10
    """


register_sql(
    "q31_knn_bruteforce",
    _q31,
    ("embeddings",),
    doc="Exact cosine top-10 neighbors for the fixed query slice "
    "(broadcast queries x one corpus pass).",
    bench=True,
    tags=("similarity", "knn"),
)


# ---------------------------------------------------------------------------
# q32 — multi-probe LSH approximate nearest neighbors: random-hyperplane
# sign signatures banded 4 x 6 bits; each query probes, per band, its exact
# bucket PLUS the buckets reached by flipping the _N_PROBES smallest-margin
# sign bits (the bits most likely to disagree for a true neighbor); exact
# cosine re-rank within candidates, top-10 per query.
#
# Margins are rounded to 6 decimals before ranking (bit index tiebreak) so
# Spark and DuckDB order probes identically despite fold-order float drift.
# ---------------------------------------------------------------------------
def _q32_cand_cte(d: dict) -> str:
    """Shared WITH-prefix up through the ``cand`` CTE — used by the full
    q32 query and by the candidate-share diagnostic the recall test guards
    (one SQL text, no drift between measurement and query)."""
    proj_terms = ", ".join(
        d["dot"]("v", d["arrlit"](HYPERPLANES[i])) for i in range(N_PLANES)
    )
    arr = f"array({proj_terms})" if d["name"] == "spark" else f"[{proj_terms}]"
    bit_terms = " + ".join(
        d["shl"](f"(CASE WHEN {d['elem']('pr', i + 1)} >= 0 THEN 1 ELSE 0 END)", i)
        for i in range(N_PLANES)
    )
    mask = (1 << _BAND_BITS) - 1
    band_rows = "\n        UNION ALL\n".join(
        f"        SELECT vec_id, {b} AS band,"
        f" ({d['shr']('sig', b * _BAND_BITS)} & {mask}) AS bucket FROM sig"
        for b in range(N_PLANES // _BAND_BITS)
    )
    if d["name"] == "spark":
        qm_inner = (
            "SELECT vec_id, pos AS i, abs(val) AS margin FROM proj "
            "LATERAL VIEW posexplode(pr) t AS pos, val "
            "WHERE vec_id % 100 = 0"
        )
    else:
        qm_inner = (
            "SELECT vec_id, dim - 1 AS i, abs(val) AS margin FROM ("
            "SELECT vec_id, generate_subscripts(pr, 1) AS dim, unnest(pr) AS val "
            "FROM proj) WHERE vec_id % 100 = 0"
        )
    band_of_i = d["idiv"]("i", _BAND_BITS)
    return f"""
    WITH e AS (
        SELECT vec_id, {d['dblarr']('embedding')} AS v FROM embeddings
    ),
    n AS (
        SELECT vec_id, v, sqrt({d['dot']('v', 'v')}) AS nrm FROM e
    ),
    proj AS (
        SELECT vec_id, {arr} AS pr FROM e
    ),
    sig AS (
        SELECT vec_id, ({bit_terms}) AS sig FROM proj
    ),
    bands AS (
{band_rows}
    ),
    qmargin AS (
        SELECT vec_id, {band_of_i} AS band, i % {_BAND_BITS} AS bit,
               row_number() OVER (
                   PARTITION BY vec_id, {band_of_i}
                   ORDER BY {rnd_sql('margin', 6)}, i % {_BAND_BITS}
               ) AS rn
        FROM ({qm_inner})
    ),
    probes AS (
        SELECT vec_id, band, bucket FROM bands WHERE vec_id % 100 = 0
        UNION ALL
        SELECT f.vec_id, f.band,
               {d['xor']('b.bucket', d['shl']('1', 'f.bit'))} AS bucket
        FROM qmargin f
        JOIN bands b ON f.vec_id = b.vec_id AND f.band = b.band
        WHERE f.rn <= {_N_PROBES}
    ),
    cand AS (
        SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
        FROM probes qb
        JOIN bands cb ON qb.band = cb.band AND qb.bucket = cb.bucket
                     AND qb.vec_id <> cb.vec_id
    )"""


def _q32(d: dict) -> str:
    dot_qc = d["dot"]("q.v", "c.v")
    return f"""{_q32_cand_cte(d)},
    scored AS (
        SELECT cd.query_id, cd.neighbor_id,
               ({dot_qc}) / (q.nrm * c.nrm) AS cos
        FROM cand cd
        JOIN n q ON cd.query_id = q.vec_id
        JOIN n c ON cd.neighbor_id = c.vec_id
    )
    SELECT query_id, neighbor_id,
           {rnd_sql('cos', 6)}  AS cosine,
           CAST(rnk AS INT)     AS rank
    FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id
               ) AS rnk
        FROM scored
    )
    WHERE rnk <= 10
    """


def ann_candidate_counts(spark, sf_dir: str) -> tuple[int, int, int]:
    """(n_candidate_pairs, n_queries, corpus_size) for the exact candidate
    set q32 re-ranks — the recall test's candidate-share guard reads the
    REAL query's own CTE, not a reimplementation."""
    from music_recommendation_service_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("embeddings")
    row = spark.sql(
        f"""{_q32_cand_cte(SPARK)}
        SELECT CAST(count(*) AS BIGINT) AS n_cand,
               CAST(count(DISTINCT query_id) AS BIGINT) AS n_q
        FROM cand"""
    ).collect()[0]
    return int(row["n_cand"]), int(row["n_q"]), emb.count()


def ivf_candidate_counts(spark, sf_dir: str) -> tuple[int, int, int]:
    """(n_candidate_pairs, n_queries, corpus_size) for the exact candidate
    set q44 re-ranks — built from q44's own CTE chain, not a
    reimplementation, so the recall test's share guard measures the real
    probing cost."""
    from music_recommendation_service_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("embeddings")
    row = spark.sql(
        f"""WITH {_q44_cand_ctes(SPARK)}
        SELECT CAST(count(*) AS BIGINT) AS n_cand,
               CAST(count(DISTINCT query_id) AS BIGINT) AS n_q
        FROM cand"""
    ).collect()[0]
    return int(row["n_cand"]), int(row["n_q"]), emb.count()


register_sql(
    "q32_ann_lsh",
    _q32,
    ("embeddings",),
    doc="Multi-probe random-hyperplane LSH (24 bits, 4x6 bands, 4 smallest-"
    "margin bit flips per band) approximate top-10 neighbors with exact "
    "cosine re-rank inside probed buckets.",
    tags=("similarity", "ann", "lsh"),
)


# ---------------------------------------------------------------------------
# q39 — per-label embedding centroids (the IVF coarse-quantizer builder):
# posexplode components -> one (label, dim) hash aggregate. At scale this is
# the standard vector-average shuffle: volume O(labels x DIM), not O(rows).
# ---------------------------------------------------------------------------
def _q39(d: dict) -> str:
    from music_recommendation_service_spark.functions import rnd_sql

    if d["name"] == "duck":
        inner = (
            "SELECT label, generate_subscripts(v, 1) AS dim, unnest(v) AS val "
            f"FROM (SELECT label, {d['dblarr']('embedding')} AS v FROM embeddings)"
        )
    else:
        inner = (
            "SELECT label, pos + 1 AS dim, val "
            f"FROM (SELECT label, {d['dblarr']('embedding')} AS v FROM embeddings) "
            "LATERAL VIEW posexplode(v) t AS pos, val"
        )
    return f"""
    SELECT label,
           CAST(dim AS INT)          AS dim,
           {rnd_sql('avg(val)', 6)}  AS centroid_component,
           CAST(count(*) AS BIGINT)  AS n_vectors
    FROM ({inner})
    GROUP BY label, dim
    """


register_sql(
    "q39_label_centroids",
    _q39,
    ("embeddings",),
    doc="Per-label centroid vectors via posexplode + hash aggregate "
    "(IVF coarse-quantizer construction).",
    tags=("similarity", "ivf", "vector-agg"),
)


# ---------------------------------------------------------------------------
# q44 — IVF-flat ANN search: build 10 coarse centroids (per-label means),
# assign every vector to its NEAREST centroid (not its label — real IVF
# assignment), probe the nprobe=2 closest lists per query, exact cosine
# re-rank inside the probed lists.
#
# Scale shape: centroids are tiny (broadcast); assignment is a map over the
# corpus; candidate generation is an equi-join on centroid id — per-query
# work is O(probed-list size), the IVF contract. Compare q32 (LSH): same
# contract, hash buckets instead of learned lists.
# ---------------------------------------------------------------------------
def ivf_assign_cte(d: dict) -> str:
    """The shared IVF coarse-quantizer WITH-clause body: per-label mean
    centroids, L2 norms, and nearest-centroid assignment of every vector.

    Defines CTEs ``e`` (vec_id, label, v), ``cent_n`` (cid, c, cnrm),
    ``en`` (vec_id, v, nrm), ``affinity`` (vec_id, cid, cos, rnk), and
    ``assigned`` (vec_id, cid). Consumers append their own CTEs after it
    (q44 ANN probing; q102 cluster-bounded semantic dedup). Returned text
    starts after ``WITH `` so callers control the full statement.
    """
    if d["name"] == "duck":
        comp = (
            "SELECT label, generate_subscripts(v, 1) AS dim, unnest(v) AS val "
            "FROM e"
        )
        rebuild = "list(avg_val ORDER BY dim)"
    else:
        comp = (
            "SELECT label, pos + 1 AS dim, val FROM e "
            "LATERAL VIEW posexplode(v) t AS pos, val"
        )
        rebuild = (
            "transform(sort_array(collect_list(struct(dim, avg_val))),"
            " s -> s.avg_val)"
        )
    cos_vc = f"({d['dot']('a.v', 'c.c')}) / (a.nrm * c.cnrm)"
    return f"""e AS (
        SELECT vec_id, label, {d['dblarr']('embedding')} AS v FROM embeddings
    ),
    comp AS ({comp}),
    cent AS (
        SELECT label AS cid, {rebuild} AS c
        FROM (SELECT label, dim, avg(val) AS avg_val FROM comp GROUP BY label, dim)
        GROUP BY label
    ),
    cent_n AS (
        SELECT cid, c, sqrt({d['dot']('c', 'c')}) AS cnrm FROM cent
    ),
    en AS (
        SELECT vec_id, v, sqrt({d['dot']('v', 'v')}) AS nrm FROM e
    ),
    affinity AS (
        SELECT a.vec_id, c.cid, {cos_vc} AS cos,
               row_number() OVER (
                   PARTITION BY a.vec_id ORDER BY {cos_vc} DESC, c.cid
               ) AS rnk
        FROM en a CROSS JOIN cent_n c
    ),
    assigned AS (
        SELECT vec_id, cid FROM affinity WHERE rnk = 1
    )"""


# Fine IVF quantizer for q44: K deterministic md5-ordered seed vectors,
# refined by _IVF_STEPS unrolled Lloyd's iterations (the q108 refinement
# wired into the ANN path, judge round-5 order #1), then multi-probe over
# the _IVF_NPROBE nearest cells. Finer cells + deeper probing is what
# actually buys recall on a near-isotropic corpus: measured on the fixed
# testdata, recall@10 went 0.32 @ 21% candidate share (old k=10 label
# cells, nprobe=2) -> 0.72 @ 38% (K=32, 2 Lloyd steps, nprobe=12) — at
# parity with the multi-probe LSH path (q32: 0.70 @ 29%). At 100 TB only
# the O(K x DIM) centroid table and the (vec_id, cid) assignment map are
# shuffled; centroids broadcast to both the assignment and probe joins.
_IVF_K = 32
_IVF_NPROBE = 12
_IVF_STEPS = 2


def _ivf_refined_ctes(d: dict, k: int = _IVF_K, steps: int = _IVF_STEPS) -> str:
    """CTE chain after ``WITH ``: ``e``/``en`` (raw + UNIT vectors) over
    embeddings, ``k`` md5-seeded ``cent0`` rows, then ``steps`` Lloyd
    iterations, ending in ``affinity`` (every vector's cosine + rank
    against the FINAL centroids) and ``assigned`` (rnk = 1). The ONE
    canonical SQL rendering of the quantizer — q44, its candidate-share
    probe, and q109's oracle all call it, so the parity-critical
    arithmetic cannot silently fork.

    The arithmetic is EXACTLY ``operators.kmeans.kmeans_fit``'s (seeds =
    unit vectors in md5 order, centroid = mean of assigned UNIT vectors,
    cos = dot(u, unit(c)), empty cells keep the previous centroid) so the
    catalog query and the reusable index-build operator
    (``operators.ann_index.build_ivf_index``) produce bit-identical
    quantizers — pinned by ``tests/test_ann_index.py``."""
    str_t = "VARCHAR" if d["name"] == "duck" else "STRING"

    def unit(c: str) -> str:
        return f"{d['lt']}({c}, x -> x / sqrt({d['dot'](c, c)}))"

    cos = f"{d['dot']('a.u', unit('c.c'))}"
    parts = [
        f"""e AS (
        SELECT vec_id, {d['dblarr']('embedding')} AS v FROM embeddings
    ),
    en AS (
        SELECT vec_id, v, sqrt({d['dot']('v', 'v')}) AS nrm, {unit('v')} AS u
        FROM e
    ),
    cent0 AS (
        SELECT vec_id AS cid, u AS c
        FROM (
            SELECT vec_id, u FROM en
            ORDER BY md5(CAST(vec_id AS {str_t})), vec_id
            LIMIT {k}
        )
    )"""
    ]
    for i in range(steps):
        if d["name"] == "duck":
            comp = (
                f"SELECT g.cid, generate_subscripts(e.u, 1) AS dim, "
                f"unnest(e.u) AS val "
                f"FROM assign{i} g JOIN en e ON g.vec_id = e.vec_id"
            )
            rebuild = "list(avg_val ORDER BY dim)"
        else:
            comp = (
                f"SELECT g.cid, pos + 1 AS dim, val "
                f"FROM assign{i} g JOIN en e ON g.vec_id = e.vec_id "
                f"LATERAL VIEW posexplode(e.u) t AS pos, val"
            )
            rebuild = (
                "transform(sort_array(collect_list(struct(dim, avg_val))),"
                " s -> s.avg_val)"
            )
        parts.append(f"""assign{i} AS (
        SELECT vec_id, cid FROM (
            SELECT a.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY a.vec_id ORDER BY {cos} DESC, c.cid
                   ) AS rnk
            FROM en a CROSS JOIN cent{i} c
        ) WHERE rnk = 1
    ),
    comp{i} AS ({comp}),
    means{i} AS (
        SELECT cid, {rebuild} AS c
        FROM (
            SELECT cid, dim, avg(val) AS avg_val
            FROM comp{i} GROUP BY cid, dim
        )
        GROUP BY cid
    ),
    cent{i + 1} AS (
        SELECT p.cid, coalesce(m.c, p.c) AS c
        FROM cent{i} p LEFT JOIN means{i} m ON p.cid = m.cid
    )""")
    parts.append(f"""affinity AS (
        SELECT a.vec_id, c.cid, {cos} AS cos,
               row_number() OVER (
                   PARTITION BY a.vec_id ORDER BY {cos} DESC, c.cid
               ) AS rnk
        FROM en a CROSS JOIN cent{steps} c
    ),
    assigned AS (
        SELECT vec_id, cid FROM affinity WHERE rnk = 1
    )""")
    return ",\n    ".join(parts)


def _q44_cand_ctes(d: dict) -> str:
    """q44's probe + candidate CTEs on top of the refined quantizer —
    shared by the catalog query and ``ivf_candidate_counts`` so the
    recall test's share guard measures EXACTLY the set q44 re-ranks."""
    return f"""{_ivf_refined_ctes(d)},
    probes AS (
        SELECT vec_id AS query_id, cid FROM affinity
        WHERE rnk <= {_IVF_NPROBE} AND vec_id % 100 = 0
    ),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p JOIN assigned a ON p.cid = a.cid
        WHERE p.query_id <> a.vec_id
    )"""


def _q44(d: dict) -> str:
    from music_recommendation_service_spark.functions import rnd_sql

    cos_qc = f"({d['dot']('q.v', 'x.v')}) / (q.nrm * x.nrm)"
    return f"""
    WITH {_q44_cand_ctes(d)},
    scored AS (
        SELECT cd.query_id, cd.neighbor_id, {cos_qc} AS cos
        FROM cand cd
        JOIN en q ON cd.query_id = q.vec_id
        JOIN en x ON cd.neighbor_id = x.vec_id
    )
    SELECT query_id, neighbor_id,
           {rnd_sql('cos', 6)}  AS cosine,
           CAST(rnk AS INT)     AS rank
    FROM (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id
               ) AS rnk
        FROM scored
    )
    WHERE rnk <= 10
    """


register_sql(
    "q44_ann_ivf",
    _q44,
    ("embeddings",),
    doc=f"IVF-flat ANN, k-means-refined: {_IVF_K} md5-seeded centroids, "
    f"{_IVF_STEPS} Lloyd steps, nprobe={_IVF_NPROBE} multi-probe, exact "
    "cosine re-rank in probed lists (recall@10 0.72 at 38% cand share).",
    tags=("similarity", "ann", "ivf", "kmeans"),
)


# ---------------------------------------------------------------------------
# q108 — one Lloyd's k-means refinement step over the embedding corpus:
# start from the per-label mean centroids (the IVF coarse quantizer),
# re-assign every vector to its nearest centroid by cosine, recompute
# centroids as the assigned means, re-assign once more, and report the
# refined clustering. The iterative-clustering shape (PageRank and
# label-propagation are the graph twins): each iteration is ONE
# posexplode + hash aggregate (O(k x DIM) state) and one broadcast
# affinity join — at 100 TB the centroids stay tiny and only the
# assignment map touches the corpus; more iterations chain the same two
# steps (engine-side you'd localCheckpoint between them, as
# operators/components.py does).
# ---------------------------------------------------------------------------
def _q108(d: dict, mat_src: str | None = None) -> str:
    """``mat_src`` substitutes a pre-materialized (vec_id, cid, v, nrm)
    relation for the inline assigned ⋈ en join (the Spark build's round-12
    optimization); the default inlines everything (the oracle form)."""
    from music_recommendation_service_spark.functions import rnd_sql

    if d["name"] == "duck":
        comp1 = (
            "SELECT a.cid, generate_subscripts(e.v, 1) AS dim, unnest(e.v) AS val "
            "FROM assigned a JOIN en e ON a.vec_id = e.vec_id"
            if mat_src is None
            else "SELECT cid, generate_subscripts(v, 1) AS dim, unnest(v) AS val "
            f"FROM {mat_src}"
        )
        rebuild = "list(avg_val ORDER BY dim)"
    else:
        comp1 = (
            "SELECT a.cid, pos + 1 AS dim, val "
            "FROM assigned a JOIN en e ON a.vec_id = e.vec_id "
            "LATERAL VIEW posexplode(e.v) t AS pos, val"
            if mat_src is None
            else f"SELECT cid, pos + 1 AS dim, val FROM {mat_src} "
            "LATERAL VIEW posexplode(v) t AS pos, val"
        )
        rebuild = (
            "transform(sort_array(collect_list(struct(dim, avg_val))),"
            " s -> s.avg_val)"
        )
    cos1 = f"({d['dot']('a.v', 'c.c1')}) / (a.nrm * c.cnrm1)"
    head = (
        f"    WITH {ivf_assign_cte(d)},\n    "
        if mat_src is None
        else "    WITH "
    )
    en1 = "en" if mat_src is None else f"(SELECT vec_id, v, nrm FROM {mat_src})"
    return f"""
{head}comp1 AS ({comp1}),
    cent1 AS (
        SELECT cid, {rebuild} AS c1
        FROM (SELECT cid, dim, avg(val) AS avg_val FROM comp1 GROUP BY cid, dim)
        GROUP BY cid
    ),
    cent1_n AS (
        SELECT cid, c1, sqrt({d['dot']('c1', 'c1')}) AS cnrm1 FROM cent1
    ),
    affinity1 AS (
        SELECT a.vec_id, c.cid, {cos1} AS cos,
               row_number() OVER (
                   PARTITION BY a.vec_id ORDER BY {cos1} DESC, c.cid
               ) AS rnk
        FROM {en1} a CROSS JOIN cent1_n c
    )
    SELECT cid                           AS cluster_id,
           CAST(count(*) AS BIGINT)      AS n_vectors,
           {rnd_sql('avg(cos)', 6)}      AS mean_cosine,
           min(vec_id)                   AS exemplar_id
    FROM affinity1
    WHERE rnk = 1
    GROUP BY cid
    """


# Round-12 optimization: the inline form executed the e/en subtree for
# both the mean-recompute join AND the reassignment scan, with the coarse
# assignment window above one of them. The Spark build materializes ONE
# (vec_id, cid, v, nrm) relation (assignment map + vectors — the IVF
# index-build artifact) and feeds both consumers from it; the DuckDB
# oracle keeps the inline form, pinning identical rows.
def _q108_build(spark, sf_dir: str):
    from music_recommendation_service_spark.sources.catalog import load_table
    from music_recommendation_service_spark.sources.writers import (
        scratch_materialize,
    )

    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    m = scratch_materialize(
        spark.sql(
            f"WITH {ivf_assign_cte(SPARK)}\n"
            "    SELECT a.vec_id, a.cid, e.v, e.nrm\n"
            "    FROM assigned a JOIN en e ON a.vec_id = e.vec_id"
        ),
        "q108_assigned",
    )
    m.createOrReplaceTempView("q108_assigned_mat")
    return spark.sql(_q108(SPARK, mat_src="q108_assigned_mat"))


def _register_q108():
    from music_recommendation_service_spark.plans import register

    register(
        "q108_kmeans_refine",
        oracle=_q108(DUCK),
        doc="One Lloyd's refinement of the IVF coarse quantizer: reassign "
        "-> mean-recompute -> reassign; per-cluster size, mean cosine, "
        "exemplar. The Spark build materializes the (assignment, vector) "
        "relation once; the oracle keeps the inline form.",
        tags=("similarity", "kmeans", "iterative", "clustering"),
    )(_q108_build)


_register_q108()


# ---------------------------------------------------------------------------
# q134 — PRODUCT QUANTIZATION ANN (Jégou/Douze/Schmid TPAMI'11): the third
# leg of the ANN family next to multi-probe LSH (q32) and IVF-flat (q44).
# The 64-dim vector splits into M=4 16-dim subspaces; each subspace gets
# its own K=8 codebook (md5-seeded subvectors + one Lloyd step — the same
# deterministic quantizer discipline as q44); every vector compresses to
# M code ids. The asymmetric-distance (ADC) scan then ranks the WHOLE
# corpus per query from M table lookups per vector:
#   d(q, x) ~ sum_s || q_s - c_{s, code_s(x)} ||^2
# and the top _PQ_CAND candidates get an exact re-rank.
#
# Why this matters at 100 TB: IVF bounds how many vectors a query TOUCHES;
# PQ bounds how many BYTES each touched vector costs. Here 64 floats
# (256 B) become 4 code bytes — a 64x scan-size compression — and the ADC
# pass joins code columns against an O(M x K)-row broadcast distance
# table, never reading raw embeddings until the _PQ_CAND-row re-rank. At
# sf0.01: recall@10 = 0.44 at a 10% exact-read share (vs q44's 0.72 @ 38%
# and q32's 0.70 @ 29% — PQ trades recall for the smallest exact-read
# share and the only compressed scan). Production composition is IVF x PQ
# (probe cells, ADC within them); the catalog keeps the PQ leg isolated
# so the oracle pins its arithmetic end-to-end.
#
# Every CROSS JOIN here is a broadcast against a scalar-bounded side: the
# K=8 per-subspace centroid tables and the handful of query vectors
# (vec_id % 100 = 0).
# ---------------------------------------------------------------------------
_PQ_M = 4        # subspaces
_PQ_SUB = 16     # dims per subspace (M * SUB = embedding dim)
_PQ_K = 8        # codewords per subspace -> one byte-sized code each
_PQ_CAND = 50    # ADC candidates handed to the exact re-rank
_PQ_TOPK = 10


def _pq_lslice(d: dict, l: str, start: int, k: int) -> str:
    """k elements of ``l`` from 1-based ``start`` (constant at gen time):
    Spark slice() takes (start, LENGTH), DuckDB list_slice (start, STOP)."""
    if d["name"] == "duck":
        return f"list_slice({l}, {start}, {start + k - 1})"
    return f"slice({l}, {start}, {k})"


def _pq_sql2(d: dict, a: str, b: str) -> str:
    """Squared L2 via three dot products — both dialects share d['dot']."""
    return f"(({d['dot'](a, a)}) - 2 * ({d['dot'](a, b)}) + ({d['dot'](b, b)}))"


def _pq_e_sql(d: dict) -> str:
    return f"SELECT vec_id, {d['dblarr']('embedding')} AS v FROM embeddings"


def _pq_seeds_sql(d: dict, e: str = "e") -> str:
    str_t = "VARCHAR" if d["name"] == "duck" else "STRING"
    return f"""SELECT vec_id, v, row_number() OVER (
            ORDER BY md5(CAST(vec_id AS {str_t})), vec_id
        ) AS srn
        FROM {e}"""


def _pq_subspace_ctes(d: dict, s: int, e: str = "e", seeds: str = "seeds") -> str:
    """Subspace ``s``'s codebook + code-lookup pipeline:
    es/cent0/asg/comp/means/cent/code CTE definitions, parameterized on
    the embedding (``e``) and seed relations so the Spark build can point
    them at materialized twins while the oracle keeps the inline form."""
    off = s * _PQ_SUB + 1
    sv = _pq_lslice(d, "v", off, _PQ_SUB)
    if d["name"] == "duck":
        comp = (
            f"SELECT g.cid, generate_subscripts(a.sv, 1) AS dim, "
            f"unnest(a.sv) AS val "
            f"FROM asg{s} g JOIN es{s} a ON g.vec_id = a.vec_id"
        )
        rebuild = "list(avg_val ORDER BY dim)"
    else:
        comp = (
            f"SELECT g.cid, pos + 1 AS dim, val FROM asg{s} g "
            f"JOIN es{s} a ON g.vec_id = a.vec_id "
            f"LATERAL VIEW posexplode(a.sv) t AS pos, val"
        )
        rebuild = (
            "transform(sort_array(collect_list(struct(dim, avg_val))),"
            " s -> s.avg_val)"
        )
    return f"""es{s} AS (
        SELECT vec_id, {sv} AS sv FROM {e}
    ),
    cent{s}0 AS (
        SELECT srn AS cid, {sv} AS c FROM {seeds} WHERE srn <= {_PQ_K}
    ),
    asg{s} AS (
        SELECT vec_id, cid FROM (
            SELECT a.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {_pq_sql2(d, 'a.sv', 'c.c')}, c.cid
                   ) AS rnk
            FROM es{s} a CROSS JOIN cent{s}0 c
        ) WHERE rnk = 1
    ),
    comp{s} AS ({comp}),
    means{s} AS (
        SELECT cid, {rebuild} AS c
        FROM (SELECT cid, dim, avg(val) AS avg_val FROM comp{s} GROUP BY cid, dim)
        GROUP BY cid
    ),
    cent{s} AS (
        SELECT p.cid, coalesce(m.c, p.c) AS c
        FROM cent{s}0 p LEFT JOIN means{s} m ON p.cid = m.cid
    ),
    code{s} AS (
        SELECT vec_id, cid FROM (
            SELECT a.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {_pq_sql2(d, 'a.sv', 'c.c')}, c.cid
                   ) AS rnk
            FROM es{s} a CROSS JOIN cent{s} c
        ) WHERE rnk = 1
    )"""


def _pq_tail_ctes(d: dict, e: str = "e", cent=None, code=None) -> str:
    """dtab/adc/cand/rerank — the ADC scan + exact re-rank. ``cent``/
    ``code`` map a subspace index to a relation name; the defaults keep
    the inline CTE names (the oracle form), the Spark build substitutes
    materialized index tables."""
    cent = cent or (lambda s: f"cent{s}")
    code = code or (lambda s: f"code{s}")
    parts = []
    for s in range(_PQ_M):
        off = s * _PQ_SUB + 1
        qsv = _pq_lslice(d, "v", off, _PQ_SUB)
        parts.append(f"""dtab{s} AS (
        SELECT q.vec_id AS qid, c.cid, {_pq_sql2(d, f"({qsv})", 'c.c')} AS dd
        FROM (SELECT vec_id, v FROM {e} WHERE vec_id % 100 = 0) q
        CROSS JOIN {cent(s)} c
    )""")
    joins = " ".join(
        f"JOIN {code(s)} c{s} ON c{s}.vec_id = x.vec_id "
        f"JOIN dtab{s} t{s} ON t{s}.qid = q.vec_id AND t{s}.cid = c{s}.cid"
        for s in range(_PQ_M)
    )
    adc_sum = " + ".join(f"t{s}.dd" for s in range(_PQ_M))
    parts.append(f"""adc AS (
        SELECT q.vec_id AS qid, x.vec_id, {adc_sum} AS adc_dist
        FROM (SELECT vec_id FROM {e} WHERE vec_id % 100 = 0) q
        CROSS JOIN (SELECT vec_id FROM {e}) x {joins}
    ),
    cand AS (
        SELECT qid, vec_id, adc_dist FROM (
            SELECT qid, vec_id, adc_dist, row_number() OVER (
                PARTITION BY qid ORDER BY adc_dist, vec_id
            ) AS rnk
            FROM adc WHERE qid <> vec_id
        ) WHERE rnk <= {_PQ_CAND}
    ),
    rerank AS (
        SELECT c.qid, c.vec_id, c.adc_dist,
               {_pq_sql2(d, 'q.v', 'x.v')} AS exact_dist
        FROM cand c
        JOIN {e} q ON q.vec_id = c.qid
        JOIN {e} x ON x.vec_id = c.vec_id
    )""")
    return ",\n    ".join(parts)


def _pq_ctes(d: dict) -> str:
    """The fully-inline CTE chain (the oracle form): e/seeds, the four
    codebook+code pipelines, then the ADC tail."""
    parts = [
        f"""e AS (
        {_pq_e_sql(d)}
    ),
    seeds AS (
        {_pq_seeds_sql(d)}
    )"""
    ]
    for s in range(_PQ_M):
        parts.append(_pq_subspace_ctes(d, s))
    parts.append(_pq_tail_ctes(d))
    return ",\n    ".join(parts)


def _q134_select(d: dict) -> str:
    from music_recommendation_service_spark.functions import rnd_sql

    return f"""SELECT qid, vec_id, CAST(rnk AS INT) AS rank,
           {rnd_sql('adc_dist', 6)} AS adc_dist,
           {rnd_sql('exact_dist', 6)} AS exact_dist
    FROM (
        SELECT qid, vec_id, adc_dist, exact_dist, row_number() OVER (
            PARTITION BY qid ORDER BY exact_dist, vec_id
        ) AS rnk
        FROM rerank
    ) WHERE rnk <= {_PQ_TOPK}
    """


def _q134(d: dict) -> str:
    return f"""
    WITH {_pq_ctes(d)}
    {_q134_select(d)}"""


def _q134_build(spark, sf_dir: str):
    """Spark-side build (round-12 optimization pass; OPTIMIZATION_r12.md).

    The inline form re-executes shared CTE subtrees per reference: `seeds`
    (a global-sort window) is inlined into every cent{s}0, each cent{s}
    subtree runs for BOTH its code{s} lookup and its dtab{s} ADC table,
    and the stats-less intermediates degraded every vec_id join to a
    shuffled SortMergeJoin — the sf0.1 physical plan carried 30
    SortMergeJoins / 60 Window nodes / 64 HashAggregates. Materializing
    the codebook artifacts once per session (guide §2.4/§5: this is the
    PQ *index build* — at 100 TB these ARE durable index tables, written
    once, served many times; operators/ann_index.py is the production
    twin) leaves the per-query plan as the ADC scan + top-{_PQ_CAND}
    re-rank. The artifacts are CONSOLIDATED (second round-12 pass): one
    (vec_id, c0..c{_PQ_M - 1}) codes row per vector instead of {_PQ_M}
    one-column-code tables, the {_PQ_M} codebooks in one (s, cid, c)
    table, and the per-query ADC distance tables precomputed into one
    (s, qid, cid, dd) table — the warm plan builds 5-6 tiny broadcasts
    instead of 16 (measured: 16 single-task ~50-100 ms broadcast-build
    jobs dominated the warm profile). Every materialized intermediate is
    an exact value-preserving reshape of the same CTEs, so results are
    bit-identical to the oracle's inline form."""
    from music_recommendation_service_spark.sources.catalog import load_table
    from music_recommendation_service_spark.sources.writers import (
        scratch_materialize,
    )

    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    d = SPARK
    scratch_materialize(
        spark.sql(_pq_e_sql(d)), "q134_e"
    ).createOrReplaceTempView("q134_e")
    scratch_materialize(
        spark.sql(_pq_seeds_sql(d, e="q134_e")), "q134_seeds"
    ).createOrReplaceTempView("q134_seeds")
    # All M codebooks in one (s, cid, c) table: one index-build job for the
    # four subspace Lloyd pipelines (unreferenced CTEs are pruned).
    pipes = ",\n    ".join(
        _pq_subspace_ctes(d, s, e="q134_e", seeds="q134_seeds")
        for s in range(_PQ_M)
    )
    cents_union = "\nUNION ALL ".join(
        f"SELECT {s} AS s, cid, c FROM cent{s}" for s in range(_PQ_M)
    )
    scratch_materialize(
        spark.sql(f"WITH {pipes}\n{cents_union}"), "q134_cents"
    ).createOrReplaceTempView("q134_cents")
    # One codes row per vector (vec_id, c0..c3): the code-assignment window
    # per subspace against its codebook slice, joined on vec_id.
    code_ctes, sel, joins = [], [], []
    for s in range(_PQ_M):
        off = s * _PQ_SUB + 1
        sv = _pq_lslice(d, "v", off, _PQ_SUB)
        code_ctes.append(
            f"""x{s} AS (
        SELECT vec_id, cid FROM (
            SELECT a.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {_pq_sql2(d, f"({sv})", 'c.c')}, c.cid
                   ) AS rnk
            FROM q134_e a
            CROSS JOIN (SELECT cid, c FROM q134_cents WHERE s = {s}) c
        ) WHERE rnk = 1
    )"""
        )
        sel.append(f"x{s}.cid AS c{s}")
        if s:
            joins.append(f"JOIN x{s} ON x{s}.vec_id = x0.vec_id")
    scratch_materialize(
        spark.sql(
            "WITH " + ",\n    ".join(code_ctes) + "\nSELECT x0.vec_id, "
            + ", ".join(sel) + "\nFROM x0 " + " ".join(joins)
        ),
        "q134_codes",
    ).createOrReplaceTempView("q134_codes")
    # The ADC distance tables for the fixed query slice, one (s, qid, cid,
    # dd) table (O(M x K x queries) rows).
    dtab_union = "\nUNION ALL ".join(
        f"SELECT {s} AS s, q.vec_id AS qid, c.cid, "
        + _pq_sql2(d, f"({_pq_lslice(d, 'v', s * _PQ_SUB + 1, _PQ_SUB)})", "c.c")
        + " AS dd FROM (SELECT vec_id, v FROM q134_e WHERE vec_id % 100 = 0) q"
        f" CROSS JOIN (SELECT cid, c FROM q134_cents WHERE s = {s}) c"
        for s in range(_PQ_M)
    )
    scratch_materialize(spark.sql(dtab_union), "q134_dtab").createOrReplaceTempView(
        "q134_dtab"
    )
    adc_joins = " ".join(
        f"JOIN q134_dtab t{s} ON t{s}.s = {s} AND t{s}.qid = q.vec_id "
        f"AND t{s}.cid = x.c{s}"
        for s in range(_PQ_M)
    )
    adc_sum = " + ".join(f"t{s}.dd" for s in range(_PQ_M))
    return spark.sql(
        f"""WITH adc AS (
        SELECT q.vec_id AS qid, x.vec_id, {adc_sum} AS adc_dist
        FROM (SELECT vec_id FROM q134_e WHERE vec_id % 100 = 0) q
        CROSS JOIN q134_codes x {adc_joins}
    ),
    cand AS (
        SELECT qid, vec_id, adc_dist FROM (
            SELECT qid, vec_id, adc_dist, row_number() OVER (
                PARTITION BY qid ORDER BY adc_dist, vec_id
            ) AS rnk
            FROM adc WHERE qid <> vec_id
        ) WHERE rnk <= {_PQ_CAND}
    ),
    rerank AS (
        SELECT c.qid, c.vec_id, c.adc_dist,
               {_pq_sql2(d, 'q.v', 'x.v')} AS exact_dist
        FROM cand c
        JOIN q134_e q ON q.vec_id = c.qid
        JOIN q134_e x ON x.vec_id = c.vec_id
    )
    {_q134_select(d)}"""
    )


def _register_q134():
    from music_recommendation_service_spark.plans import register

    register(
        "q134_ann_pq",
        oracle=_q134(DUCK),
        doc=f"Product-quantization ANN: M={_PQ_M} subspaces x K={_PQ_K} "
        f"codebooks (md5-seeded, one Lloyd step), ADC scan from code "
        f"joins, exact re-rank of top {_PQ_CAND} (recall@10 0.50 at 10% "
        "exact-read share; 64x scan compression). The Spark build "
        "materializes the codebook artifacts once (PQ index build) and "
        "serves the ADC scan from them; the oracle pins the inline form.",
        tags=("similarity", "ann", "pq", "kmeans"),
    )(_q134_build)


_register_q134()


# ---------------------------------------------------------------------------
# q146 — hard-negative mining: for each query vector (q31's fixed slice),
# the top-5 most-similar vectors with a DIFFERENT label — the contrastive
# training-data op (nearest wrong-class examples are the negatives that
# teach a ranker the decision boundary; random negatives are too easy).
# Same broadcast-queries x one-corpus-pass shape as q31: the label filter
# rides IN the join condition, so no post-hoc filtering of a larger top-k
# (which could under-fill). This query pins the exact semantics; the scale
# path is operators/ann_index.py::hard_negatives — the same contract served
# from the IVF-PQ index with the label filter in the candidate fetch,
# recall >= 0.8 of this exact top-5 at <= 15% exact-read share (pinned in
# tests/test_ann_index.py).
# ---------------------------------------------------------------------------
def _q146(d: dict) -> str:
    dot_qc = d["dot"]("q.v", "c.v")
    return f"""
    WITH e AS (
        SELECT vec_id, label, {d['dblarr']('embedding')} AS v FROM embeddings
    ),
    n AS (
        SELECT vec_id, label, v, sqrt({d['dot']('v', 'v')}) AS nrm FROM e
    ),
    q AS (
        SELECT vec_id, label, v, nrm FROM n WHERE vec_id % 100 = 0
    ),
    scored AS (
        SELECT q.vec_id  AS query_id,
               q.label   AS query_label,
               c.vec_id  AS negative_id,
               c.label   AS negative_label,
               ({dot_qc}) / (q.nrm * c.nrm) AS cos
        FROM q JOIN n c
          ON q.label <> c.label
    )
    SELECT query_id, query_label, negative_id, negative_label,
           {rnd_sql('cos', 6)} AS cosine,
           CAST(rnk AS INT)    AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, negative_id
        ) AS rnk
        FROM scored
    )
    WHERE rnk <= 5
    """


register_sql(
    "q146_hard_negatives",
    _q146,
    ("embeddings",),
    doc="Hard-negative mining for contrastive training: per query vector, "
    "the top-5 nearest neighbors with a DIFFERENT label (exact cosine, "
    "label filter in the join).",
    tags=("similarity", "training-data", "negatives"),
)
