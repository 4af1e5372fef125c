"""Text-analysis operators for large-scale document pipelines.

These generalize beyond the reference's surface (its only string ops are
split/alias, SURVEY.md §2.8) to the operations a training-data pipeline
needs: tokenization, language ID, quality scoring, fingerprinting.

Everything is built from JVM-side ``pyspark.sql.functions`` expressions —
no Python UDFs in the hot path — and every function has an exact DuckDB-SQL
twin (used by the query oracles), so semantics are pinned cross-engine:

- tokens: literal single-space split (documents are normalized text).
- token hash: md5 hex (identical in Spark and DuckDB); numeric variants take
  the first 4 hex chars via positional lookup (strpos/instr of
  '0123456789abcdef'), giving a portable 16-bit hash with no dependence on
  engine-internal hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("a", "the")  # minimal English function-word probe set

HEX = "0123456789abcdef"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on single space)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.split(col, " ")


def n_tokens(text: Column | str) -> Column:
    return F.size(tokens(text))


def n_distinct_tokens(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column | str) -> Column:
    """Count of tokens in the stopword probe set (language-ID feature)."""
    preds = " OR ".join(f"t = '{s}'" for s in STOPWORDS)
    c = text if isinstance(text, str) else None
    if c is None:
        raise ValueError("stopword_count requires a column name")
    return F.expr(f"size(filter(split({c}, ' '), t -> {preds}))")


def hash16(token: Column) -> Column:
    """Portable 16-bit token hash: first 4 hex chars of md5, decoded by
    positional lookup. Matches the DuckDB twin digit-for-digit."""
    h = F.md5(token)
    out = F.lit(0)
    for i in range(1, 5):
        digit = F.instr(F.lit(HEX), F.substring(h, i, 1)) - 1
        out = out * 16 + digit
    return out


def hash16_sql(token_expr: str) -> str:
    """SQL twin of :func:`hash16` — instr/substring/md5 only, so the same
    string parses in BOTH Spark SQL and DuckDB."""
    parts = []
    for i in range(1, 5):
        parts.append(f"(instr('{HEX}', substring(md5({token_expr}), {i}, 1)) - 1)")
    expr = parts[0]
    for p in parts[1:]:
        expr = f"(({expr}) * 16 + {p})"
    return expr


def md5_word16_sql(expr: str, word: int) -> str:
    """Portable 16-bit word ``word`` (0-7) of md5(expr) — the SQL twin of
    ``int(hashlib.md5(x).hexdigest()[4*w:4*w+4], 16)``. Parses in both
    Spark SQL and DuckDB."""
    parts = []
    for i in range(4 * word + 1, 4 * word + 5):
        parts.append(f"(instr('{HEX}', substring(md5({expr}), {i}, 1)) - 1)")
    out = parts[0]
    for p in parts[1:]:
        out = f"(({out}) * 16 + {p})"
    return out


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined), the dedup unit for MinHash/Jaccard.

    Implemented with transform/sequence/slice — all codegen'd array
    expressions, no UDF."""
    c = text if isinstance(text, str) else None
    if c is None:
        raise ValueError("shingles requires a column name")
    return F.expr(
        f"transform(sequence(1, greatest(size(split({c}, ' ')) - {n - 1}, 0)),"
        f" i -> concat_ws(' ', slice(split({c}, ' '), i, {n})))"
    )


def shingles_sql(text_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (1-based list slicing both sides)."""
    toks = f"string_split({text_expr}, ' ')"
    joined = ", ".join(f"{toks}[i + {j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1),"
        f" i -> concat_ws(' ', {joined}))"
    )
