"""SQL front door for the snapshot DML surface.

The reference's only SQL entry point is a read-only Thrift SELECT
(``observability/dashboards/music_analytics.json:47``), which ``Engine.sql``
already covers. The engine's snapshot tables, however, carry a Delta-scale
DML surface (MERGE, UPDATE, DELETE, time travel, history) that was
reachable only through Python calls — a user coming from Delta writes
``MERGE INTO`` / ``VERSION AS OF`` as SQL strings and hit a wall. This
module parses that dialect subset over snapshot-backed views and
dispatches to the protocol operators, so the statements a Delta user
already writes work unchanged; everything the parser does not recognize
falls through to Spark SQL untouched.

Supported statements (on views registered via ``Engine.snapshot(path,
view=...)``; the grammar is the documented subset below, and anything
malformed errors loudly rather than half-executing):

    DELETE FROM v [WHERE <pred>]
    UPDATE v SET c = e [, ...] [WHERE <pred>]
    INSERT INTO v <SELECT ...>                       -- append
    INSERT INTO v (c1, ...) VALUES (...), (...)      -- append
    INSERT OVERWRITE v <SELECT ...>      -- dynamic partition overwrite on
                                         -- partitioned tables, else full
    INSERT OVERWRITE v WHERE <pred> <SELECT ...>     -- replaceWhere
    MERGE [WITH SCHEMA EVOLUTION] INTO v [AS] t
      USING (<query>)|view [AS] s ON t.k = s.k [AND ...]
      -- WITH SCHEMA EVOLUTION: source-only columns widen the target in
      -- the same commit (Delta parity); without it they stay accessible
      -- in clause expressions but are never stored
      WHEN MATCHED [AND <cond>] THEN UPDATE SET c = e, ... | DELETE
      WHEN NOT MATCHED [BY TARGET] [AND <cond>]
           THEN INSERT * | INSERT (c, ...) VALUES (e, ...)
      WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET ... | DELETE
    SELECT ... FROM v VERSION AS OF <n> ...          -- time travel
    SELECT ... FROM v TIMESTAMP AS OF '<iso ts>' ... -- time travel
    SELECT ... FROM snapshot_files('v'[, ver])       -- active-file
                                                     -- inventory (typed,
                                                     -- distributed resolve)
    SELECT ... FROM table_changes('v', from[, to])   -- CDF (per-commit
        _change_type/_commit_version/_commit_timestamp, Delta parity)
    DESCRIBE HISTORY v
    DESCRIBE DETAIL v                                -- current-state summary
    OPTIMIZE v [WHERE <pred>] [ZORDER BY (c1, c2)]   -- compact / cluster
        -- WHERE scopes compaction to files the predicate may touch
        -- (per-file stats), Delta's partition-scoped OPTIMIZE shape
    VACUUM v [RETAIN <n> VERSIONS] [DRY RUN]         -- version-based retention
    DROP TABLE [IF EXISTS] v                         -- unregister (data stays)
    SHOW TABLES
    SHOW PARTITIONS v        -- partition tuples + live row/file counts,
                             -- answered from manifest metadata only
    RESTORE [TABLE] v TO VERSION AS OF <n>
    RESTORE [TABLE] v TO TIMESTAMP AS OF '<iso ts>'
    CREATE [OR REPLACE] TABLE v LOCATION '<path>'
        [PARTITIONED BY (c1, c2)] AS <select>        -- CTAS (Hive layout)
    CREATE TABLE v LOCATION '<path>' SHALLOW CLONE w [VERSION AS OF n]
    CONVERT TO SNAPSHOT '<parquet>' AS v LOCATION '<path>' [STATS (c, ...)]
        -- onboard existing parquet in place (absolute external refs,
        -- zero rows copied; Delta CONVERT TO DELTA parity; Hive
        -- key=value layouts convert partitioned, values from the paths)
    ALTER TABLE v ADD COLUMNS (c TYPE, ...)          -- schema evolution
    ALTER TABLE v RENAME COLUMN a TO b               -- column mapping
    ALTER TABLE v DROP COLUMN(S) a[, b]
    ALTER TABLE v ADD CONSTRAINT n CHECK (expr)
    ALTER TABLE v DROP CONSTRAINT n
    ALTER TABLE v SET IDENTITY c [START n] [STEP n]  -- GENERATED ALWAYS
    ALTER TABLE v DROP IDENTITY
    BEGIN LAKE TRANSACTION; <stmt>; ...; COMMIT      -- multi-table unit

``BEGIN LAKE TRANSACTION`` — the guarantee, precisely (Engine.sql_atomic,
STAGED PUBLISH, snapshot protocol v4): every statement's table commit
lands as a STAGED version, invisible to ALL readers — direct
``snapshot_read`` / temp-view readers included — until the transaction's
single decision file is claimed "published". COMMIT is that one atomic
claim, so every staged version becomes visible at the same instant: a
direct reader can never observe table A's new version without table B's.
A mid-transaction failure (or a crash at ANY point before the decision)
leaves every staged version invisible — both tables keep serving their
old, mutually consistent content; no compensation commits, no rollback
window. A concurrent writer cannot commit past a pending staged version
(it backs off, then raises ``ConcurrentSnapshotError``; a transaction
whose writer crashed is decided "aborted" after
``SNAPSHOT_TXN_TIMEOUT_SEC`` by the first blocked writer or vacuum). On
success ONE lake-log entry additionally pins the produced versions for
log-resolving readers (``lake_read``), adding lake-level time travel on
top of the direct-reader atomicity.

MERGE/UPDATE/DELETE map 1:1 onto ``snapshot_merge_when`` /
``snapshot_update_where`` / ``snapshot_delete_where``, so the CDF a SQL
statement emits is IDENTICAL to the Python call's (pinned by tests).
Arbitrary target/source aliases are rewritten to the ``t``/``s`` the merge
machinery uses; alias rewriting skips string literals. Known limits, by
design: the ON condition must be a conjunction of key equalities (the
protocol's keyed-merge discipline), and DML targets must be snapshot
views — catalog parquet tables stay read-only (reference parity: its
Thrift surface is SELECT-only).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


class SqlDispatchError(ValueError):
    """A statement engaged the DML front door but could not be parsed or
    targeted — raised instead of silently handing Spark SQL a statement
    that would half-work."""


# ---------------------------------------------------------------------------
# top-level tokenizing helpers (depth- and quote-aware)
# ---------------------------------------------------------------------------

def _top_level_spans(s: str):
    """Yield (start, end) spans of s outside parentheses and single-quoted
    literals ('' escapes a quote, SQL-style)."""
    depth, i, n, start = 0, 0, len(s), 0
    while i < n:
        c = s[i]
        if c == "'":
            if depth == 0 and start < i:
                yield (start, i)
            i += 1
            while i < n:
                if s[i] == "'":
                    if i + 1 < n and s[i + 1] == "'":
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            start = i
            continue
        if c == "(":
            if depth == 0 and start < i:
                yield (start, i)
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                start = i + 1
        i += 1
    if depth == 0 and start < n:
        yield (start, n)


def _top_level_groups(s: str):
    """Yield (open_idx, close_idx) of balanced top-level ``(...)`` groups,
    skipping single-quoted literals ('' escapes, SQL-style)."""
    depth, i, n, open_at = 0, 0, len(s), -1
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n:
                if s[i] == "'":
                    if i + 1 < n and s[i + 1] == "'":
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            continue
        if c == "(":
            if depth == 0:
                open_at = i
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0 and open_at >= 0:
                yield (open_at, i)
                open_at = -1
        i += 1


def _parse_gen_colspecs(spec: str) -> list[tuple[str, str, str]]:
    """Parse a CREATE TABLE column-spec list into
    ``[(col, type_ddl, expr)]``. CTAS derives its data schema from the
    select, so every entry here MUST be a generated column:
    ``<col> <TYPE> GENERATED ALWAYS AS (<expr>)``. Types with arguments
    (DECIMAL(10,2)) and exprs with nested parens/commas are handled by
    top-level splitting."""
    out = []
    for piece in _split_top(spec, r","):
        if not piece.strip():
            continue
        m = re.match(
            r"\s*`?([\w]+)`?\s+(.+?)\s+GENERATED\s+ALWAYS\s+AS\s*\((.*)\)\s*$",
            piece, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlDispatchError(
                f"CREATE TABLE column spec {piece.strip()!r}: CTAS takes "
                f"its data columns from the select; the only declarations "
                f"allowed here are generated columns — "
                f"<col> <TYPE> GENERATED ALWAYS AS (<expr>). For identity "
                f"columns use ALTER TABLE ... SET IDENTITY."
            )
        out.append((m.group(1), m.group(2).strip(), m.group(3).strip()))
    if not out:
        raise SqlDispatchError("CREATE TABLE: empty column-spec list")
    return out


def _find_top(s: str, pattern: str, pos: int = 0):
    """First match of ``pattern`` (case-insensitive) at top level, at or
    after ``pos``; returns a re.Match against s or None."""
    rx = re.compile(pattern, re.IGNORECASE)
    for a, b in _top_level_spans(s):
        if b <= pos:
            continue
        m = rx.search(s, max(a, pos), b)
        if m:
            return m
    return None


def _split_top(s: str, pattern: str):
    """Split s on top-level occurrences of ``pattern`` (case-insensitive)."""
    parts, pos = [], 0
    while True:
        m = _find_top(s, pattern, pos)
        if not m:
            parts.append(s[pos:])
            return parts
        parts.append(s[pos:m.start()])
        pos = m.end()


def _requalify(expr: str, t_alias: str | None, s_alias: str | None) -> str:
    """Rewrite ``<alias>.col`` qualifiers to the canonical ``t.``/``s.``
    the merge machinery evaluates against, outside string literals."""
    subs = []
    if t_alias and t_alias.lower() != "t":
        subs.append((t_alias, "\x00T\x00."))
    if s_alias and s_alias.lower() != "s":
        subs.append((s_alias, "\x00S\x00."))
    if not subs:
        return expr
    out, last = [], 0
    for a, b in _top_level_spans(expr):
        seg = expr[a:b]
        for alias, repl in subs:
            seg = re.sub(
                rf"(?<![\w.`]){re.escape(alias)}\s*\.", repl, seg,
                flags=re.IGNORECASE,
            )
        out.append(expr[last:a])
        out.append(seg)
        last = b
    out.append(expr[last:])
    joined = "".join(out)
    return joined.replace("\x00T\x00.", "t.").replace("\x00S\x00.", "s.")


def _strip_qualifier(col: str, *aliases) -> str:
    c = col.strip().strip("`")
    for a in aliases:
        if a and c.lower().startswith(a.lower() + "."):
            return c[len(a) + 1:].strip("`")
    if "." in c:
        return c.rsplit(".", 1)[1].strip("`")
    return c


# ---------------------------------------------------------------------------
# statement parsers
# ---------------------------------------------------------------------------

_IDENT = r"[A-Za-z_][\w]*"


def _require_view(name: str, views: dict) -> str:
    if name not in views:
        raise SqlDispatchError(
            f"DML target {name!r} is not a registered snapshot view "
            f"(known: {sorted(views)}); catalog tables are read-only — "
            "register the table with Engine.snapshot(path, view=...) first"
        )
    return views[name]


def _parse_delete(q: str, views: dict):
    m = re.match(
        rf"\s*DELETE\s+FROM\s+({_IDENT})\s*(?:WHERE\s+(.*))?$",
        q, re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise SqlDispatchError(f"unparseable DELETE: {q!r}")
    name, pred = m.group(1), (m.group(2) or "true").strip()
    return _require_view(name, views), name, _strip_table_prefix(pred, name)


def _strip_table_prefix(expr: str, name: str) -> str:
    """Bare-table DML predicates may qualify columns with the view name;
    snapshot_update_where/delete_where evaluate against unqualified
    columns."""
    return re.sub(
        rf"(?<![\w.`]){re.escape(name)}\s*\.", "", expr, flags=re.IGNORECASE
    )


def _parse_update(q: str, views: dict):
    m = re.match(
        rf"\s*UPDATE\s+({_IDENT})\s+SET\s+(.*)$", q,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise SqlDispatchError(f"unparseable UPDATE: {q!r}")
    name, rest = m.group(1), m.group(2)
    wh = _find_top(rest, r"\bWHERE\b")
    set_part, pred = (
        (rest[: wh.start()], rest[wh.end():]) if wh else (rest, "true")
    )
    assignments = {}
    for piece in _split_top(set_part, r","):
        am = re.match(r"\s*([\w.`]+)\s*=\s*(.+)$", piece, re.DOTALL)
        if not am:
            raise SqlDispatchError(f"unparseable SET item: {piece!r}")
        assignments[_strip_qualifier(am.group(1), name)] = _strip_table_prefix(
            am.group(2).strip(), name
        )
    return (
        _require_view(name, views), name,
        _strip_table_prefix(pred.strip(), name), assignments,
    )


def _parse_insert(q: str, views: dict):
    m = re.match(
        rf"\s*INSERT\s+(INTO|OVERWRITE)\s+({_IDENT})\s*(.*)$",
        q, re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise SqlDispatchError(f"unparseable INSERT: {q!r}")
    mode = m.group(1).upper()
    name, rest = m.group(2), m.group(3).strip()
    where = None
    wm = re.match(r"WHERE\b\s*(.*)$", rest, re.IGNORECASE | re.DOTALL)
    if wm:
        # The replaceWhere predicate may itself contain parenthesized
        # terms — IN ('a','b'), (x=1 OR y=2), even IN (SELECT ...) — so
        # split with the quote/paren-aware scanner, not a lookahead: the
        # predicate ends at the first TOP-LEVEL SELECT/WITH/VALUES
        # keyword (subqueries sit inside parens and are skipped).
        body = wm.group(1)
        qm = _find_top(body, r"\b(SELECT|WITH|VALUES)\b")
        if qm:
            where, rest = body[: qm.start()].strip(), body[qm.start():].strip()
        else:
            # query itself parenthesized: WHERE <pred> (SELECT ...)
            # [UNION ALL (SELECT ...)] — take the FIRST top-level group
            # that opens with a query keyword and is not preceded by an
            # operator (an operator means it's a scalar subquery INSIDE
            # the predicate, e.g. x = (SELECT max(k) FROM t)); the query
            # runs from that group to end-of-string, so set-operator
            # chains of parenthesized branches parse whole.
            split_at = None
            for a, b in _top_level_groups(body):
                if not re.match(
                    r"\s*(SELECT|WITH|VALUES)\b", body[a + 1: b], re.IGNORECASE
                ):
                    continue
                before_txt = body[:a].rstrip()
                if re.search(
                    r"([=<>!+\-*/,(]|\b(IN|NOT|AND|OR|BETWEEN|LIKE)\b)$",
                    before_txt, re.IGNORECASE,
                ):
                    continue  # part of the predicate, keep scanning
                split_at = a
                break
            if split_at is None:
                raise SqlDispatchError(
                    f"INSERT OVERWRITE {name} WHERE <pred> <query>: could "
                    f"not find the start of the query after the predicate "
                    f"in {body[:80]!r}"
                )
            where, rest = body[:split_at].strip(), body[split_at:].strip()
        if not where:
            raise SqlDispatchError(
                f"INSERT OVERWRITE {name}: empty WHERE predicate"
            )
    if where is not None and mode == "INTO":
        raise SqlDispatchError(
            "INSERT INTO takes no WHERE; the scoped form is "
            "INSERT OVERWRITE <view> WHERE <pred> <select>"
        )
    path = _require_view(name, views)
    cm = re.match(r"\(([^)]*)\)\s*VALUES\s*(.+)$", rest,
                  re.IGNORECASE | re.DOTALL)
    if cm:
        cols = [c.strip().strip("`") for c in cm.group(1).split(",")]
        select = (
            f"SELECT * FROM (VALUES {cm.group(2)}) "
            f"AS _ins({', '.join(cols)})"
        )
    else:
        if rest.startswith("(") and rest.endswith(")"):
            # strip the wrapper ONLY when one group spans the whole
            # string — "(A) UNION ALL (B)" must keep its parens
            groups = list(_top_level_groups(rest))
            if groups and groups[0] == (0, len(rest) - 1):
                rest = rest[1:-1]
            else:
                rest = f"SELECT * FROM ({rest}) AS _ins_q"
        if not re.match(r"\s*(SELECT|WITH|VALUES)\b", rest, re.IGNORECASE):
            raise SqlDispatchError(
                f"INSERT INTO {name}: expected a SELECT/WITH query or "
                f"(cols) VALUES (...), got {rest[:60]!r}"
            )
        select = rest
    return path, name, select, mode, (
        _strip_table_prefix(where.strip(), name) if where else None
    )


def _parse_merge(q: str, views: dict):
    head = re.match(
        rf"\s*MERGE\s+(WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+({_IDENT})"
        rf"(?:\s+AS)?(?:\s+({_IDENT}))?\s+USING\s+",
        q, re.IGNORECASE,
    )
    if not head:
        raise SqlDispatchError(f"unparseable MERGE head: {q[:80]!r}")
    evolve = bool(head.group(1))
    tname, t_alias = head.group(2), head.group(3) or head.group(2)
    if t_alias.upper() == "USING":
        t_alias = tname
    path = _require_view(tname, views)
    rest = q[head.end():]

    # source: (subquery) [AS] alias  |  ident [AS] alias
    if rest.lstrip().startswith("("):
        rest = rest.lstrip()
        depth, i = 0, 0
        for i, c in enumerate(rest):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
        src_sql, rest = rest[1:i], rest[i + 1:]
    else:
        sm = re.match(rf"\s*({_IDENT})", rest)
        if not sm:
            raise SqlDispatchError("unparseable MERGE source")
        src_sql, rest = f"SELECT * FROM {sm.group(1)}", rest[sm.end():]
    am = re.match(rf"\s*(?:AS\s+)?({_IDENT})\s+", rest, re.IGNORECASE)
    if am and am.group(1).upper() != "ON":
        s_alias, rest = am.group(1), rest[am.end():]
    else:
        s_alias = "s"
    on = _find_top(rest, r"\bON\b")
    if not on:
        raise SqlDispatchError("MERGE without ON condition")
    first_when = _find_top(rest, r"\bWHEN\b", on.end())
    if not first_when:
        raise SqlDispatchError("MERGE without WHEN clauses")
    on_cond = rest[on.end():first_when.start()].strip()
    key_cols = []
    for part in _split_top(on_cond, r"\bAND\b"):
        em = re.match(r"\s*([\w.`]+)\s*=\s*([\w.`]+)\s*$", part)
        if not em:
            raise SqlDispatchError(
                f"MERGE ON must be a conjunction of key equalities "
                f"(keyed-merge discipline); got {part.strip()!r}"
            )
        a = _strip_qualifier(em.group(1), t_alias, s_alias)
        b = _strip_qualifier(em.group(2), t_alias, s_alias)
        if a != b:
            raise SqlDispatchError(
                f"MERGE ON equality must name the same key column on both "
                f"sides; got {a!r} = {b!r}"
            )
        key_cols.append(a)

    def rq(e: str) -> str:
        return _requalify(e, t_alias, s_alias).strip()

    when_matched, when_not_matched, when_by_source = [], [], []
    clause_text = rest[first_when.start():]
    for raw in _split_top(clause_text, r"\bWHEN\b")[1:]:
        cm = re.match(
            r"\s*(MATCHED|NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED"
            r"(?:\s+BY\s+TARGET)?)\s*(?:AND\s+(.*?))?\s*THEN\s+(.*)$",
            raw, re.IGNORECASE | re.DOTALL,
        )
        if not cm:
            raise SqlDispatchError(f"unparseable WHEN clause: {raw[:80]!r}")
        kind = re.sub(r"\s+", " ", cm.group(1).upper())
        cond = rq(cm.group(2)) if cm.group(2) else None
        action = cm.group(3).strip()
        clause: dict = {}
        if cond:
            clause["condition"] = cond
        if re.match(r"DELETE\s*$", action, re.IGNORECASE):
            clause["action"] = "delete"
        elif re.match(r"UPDATE\s+SET\s+", action, re.IGNORECASE):
            clause["action"] = "update"
            sets = {}
            body = re.sub(r"^\s*UPDATE\s+SET\s+", "", action,
                          flags=re.IGNORECASE)
            for piece in _split_top(body, r","):
                am2 = re.match(r"\s*([\w.`]+)\s*=\s*(.+)$", piece, re.DOTALL)
                if not am2:
                    raise SqlDispatchError(
                        f"unparseable merge SET item: {piece!r}"
                    )
                sets[_strip_qualifier(am2.group(1), t_alias, s_alias)] = rq(
                    am2.group(2)
                )
            clause["set"] = sets
        elif re.match(r"INSERT\s*\*\s*$", action, re.IGNORECASE):
            clause["action"] = "insert"
        elif re.match(r"INSERT\s*\(", action, re.IGNORECASE):
            im = re.match(
                r"INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*$",
                action, re.IGNORECASE | re.DOTALL,
            )
            if not im:
                raise SqlDispatchError(
                    f"unparseable INSERT action: {action[:80]!r}"
                )
            cols = [c.strip().strip("`") for c in im.group(1).split(",")]
            vals = _split_top(im.group(2), r",")
            if len(cols) != len(vals):
                raise SqlDispatchError(
                    "INSERT column/value count mismatch in MERGE clause"
                )
            clause["action"] = "insert"
            clause["values"] = {
                _strip_qualifier(c, t_alias, s_alias): rq(v)
                for c, v in zip(cols, vals)
            }
        else:
            raise SqlDispatchError(
                f"unsupported merge action: {action[:60]!r}"
            )
        if kind == "MATCHED":
            if clause["action"] not in ("update", "delete"):
                raise SqlDispatchError("WHEN MATCHED takes UPDATE or DELETE")
            when_matched.append(clause)
        elif kind == "NOT MATCHED BY SOURCE":
            if clause["action"] not in ("update", "delete"):
                raise SqlDispatchError(
                    "WHEN NOT MATCHED BY SOURCE takes UPDATE or DELETE"
                )
            when_by_source.append(clause)
        else:
            if clause["action"] != "insert":
                raise SqlDispatchError("WHEN NOT MATCHED takes INSERT")
            when_not_matched.append(clause)
    return (
        path, tname, src_sql, key_cols,
        when_matched, when_not_matched, when_by_source, evolve,
    )


def _rewrite_table_changes(spark: SparkSession, q: str, views: dict) -> str:
    """Replace ``table_changes('view', from[, to])`` with a temp view of
    the row-level change feed — Delta's CDF SQL function. Per-commit
    attribution (Delta parity): each data commit in the window diffs
    against its predecessor (keyless ``snapshot_changes``, O(changed
    files) per commit) and stamps ``_commit_version`` and
    ``_commit_timestamp``; data_change=false commits (OPTIMIZE/metadata)
    emit nothing; the window's first retained version emits its full
    snapshot as inserts when the window opens at it (table creation is an
    insert-only commit, same as Delta with CDF on from the start)."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from music_recommendation_service_spark.sources import snapshots as S

    out = q
    while True:
        # the "(" opens a nested span _top_level_spans excludes, so match
        # the bare keyword at top level and read the argument list after it
        m = _find_top(out, r"\btable_changes\b")
        if not m:
            return out
        am = re.match(
            r"\s*\(\s*'([^']+)'\s*,\s*(\d+)\s*(?:,\s*(\d+))?\s*\)",
            out[m.end():],
        )
        if not am:
            raise SqlDispatchError(
                "table_changes needs ('view', from_version[, to_version])"
            )
        name, v_from = am.group(1), int(am.group(2))
        path = _require_view(name, views)
        versions = S.snapshot_versions(path)
        v_to = int(am.group(3)) if am.group(3) else versions[-1]
        if v_from < versions[0] or v_to > versions[-1] or v_from > v_to:
            raise SqlDispatchError(
                f"table_changes({name!r}, {v_from}, {v_to}): window outside "
                f"retained versions {versions[0]}..{versions[-1]}"
            )
        parts = []
        for v in versions:
            if not (v_from <= v <= v_to):
                continue
            mf = S._read_manifest(path, v)
            if mf.get("data_change") is False:
                continue  # Delta CDF excludes OPTIMIZE/metadata commits
            if v == versions[0]:
                # Whole-snapshot-as-inserts is only the truth for the
                # TABLE-CREATION commit (version 1: every row IS an
                # insert). After vacuum truncates the manifest prefix,
                # versions[0] can be any commit — its per-commit diff
                # needs the vacuumed predecessor, so the change data is
                # gone (Delta errors likewise). ADVICE r9 medium.
                if v != 1:
                    raise SqlDispatchError(
                        f"table_changes({name!r}, {v_from}, {v_to}): change "
                        f"data for version {v} requires vacuumed version "
                        f"{v - 1}; earliest available window starts at "
                        f"{versions[0] + 1}"
                    )
                ch = S.snapshot_read(spark, path, version=v).withColumn(
                    "_change_type", F.lit("insert")
                )
            else:
                ch = S.snapshot_changes(spark, path, v - 1, v)
            parts.append(
                ch.withColumn("_commit_version", F.lit(v).cast("long"))
                .withColumn(
                    "_commit_timestamp",
                    F.timestamp_seconds(F.lit(float(mf.get("committed_at") or 0))),
                )
            )
        if parts:
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p, allowMissingColumns=True)
        else:
            sch = StructType.fromJson(
                _json.loads(S._latest_manifest(path)["schema"])
            )
            df = (
                spark.createDataFrame([], schema=sch)
                .withColumn("_change_type", F.lit(""))
                .withColumn("_commit_version", F.lit(0).cast("long"))
                .withColumn(
                    "_commit_timestamp", F.timestamp_seconds(F.lit(0.0))
                )
            )
        tv = f"__tc_{name}_{v_from}_{v_to}"
        df.createOrReplaceTempView(tv)
        out = out[: m.start()] + tv + out[m.end() + am.end():]


def _rewrite_snapshot_files(
    spark: SparkSession, q: str, views: dict
) -> str:
    """Replace ``snapshot_files('view'[, version])`` with a temp view of
    the version's ACTIVE FILE LIST (``snapshot_files_df``) — the
    metadata-plane inventory surface as a SQL table function: bytes/rows
    per partition, DV debt, stats ranges, all aggregable in plain SQL
    with no JSON parsing. Typed parquet-checkpoint manifests resolve
    DISTRIBUTED (Spark reads the sidecar directly), so a million-file
    table answers inventory queries without materializing its file list
    on the driver."""
    from music_recommendation_service_spark.sources import snapshots as S

    out = q
    while True:
        m = _find_top(out, r"\bsnapshot_files\b")
        if not m:
            return out
        am = re.match(
            r"\s*\(\s*'([^']+)'\s*(?:,\s*(\d+))?\s*\)", out[m.end():]
        )
        if not am:
            raise SqlDispatchError(
                "snapshot_files needs ('view'[, version])"
            )
        name = am.group(1)
        path = _require_view(name, views)
        version = int(am.group(2)) if am.group(2) else None
        try:
            df = S.snapshot_files_df(spark, path, version)
        except ValueError as e:
            raise SqlDispatchError(str(e)) from e
        tv = f"__sf_{name}_{version if version is not None else 'latest'}"
        df.createOrReplaceTempView(tv)
        out = out[: m.start()] + tv + out[m.end() + am.end():]


def _rewrite_time_travel(
    spark: SparkSession, q: str, views: dict
) -> str:
    """Replace ``view VERSION AS OF n`` / ``view TIMESTAMP AS OF 'ts'``
    references with temp views of the time-traveled snapshot."""
    from music_recommendation_service_spark.sources.snapshots import (
        snapshot_read,
    )

    out = q
    while True:
        # the literal may be quoted, and quoted regions are excluded from
        # top-level spans — match the keyword head at top level, then read
        # the literal directly after it
        m = _find_top(out, rf"\b({_IDENT})\s+(VERSION|TIMESTAMP)\s+AS\s+OF\b")
        if not m:
            return out
        lm = re.match(r"\s*(\d+|'[^']*')", out[m.end():])
        if not lm:
            raise SqlDispatchError(
                f"unparseable time-travel literal after {m.group(0)!r}"
            )
        name, kind, lit = m.group(1), m.group(2).upper(), lm.group(1)
        if name not in views:
            raise SqlDispatchError(
                f"time travel on {name!r}: not a registered snapshot view"
            )
        if kind == "VERSION":
            ver = int(lit)
            tv = f"__tt_{name}_v{ver}"
            snapshot_read(spark, views[name], ver).createOrReplaceTempView(tv)
        else:
            ts = lit.strip("'")
            dt = datetime.fromisoformat(ts)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            unix = dt.timestamp()
            tv = f"__tt_{name}_t{int(unix)}"
            snapshot_read(
                spark, views[name], as_of=unix
            ).createOrReplaceTempView(tv)
        out = out[: m.start()] + tv + out[m.end() + lm.end():]


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------

def dispatch_sql(
    spark: SparkSession, query: str, views: dict
) -> tuple[DataFrame, str | None] | None:
    """Route a statement: DML/history/time-travel on snapshot views is
    handled here (returns ``(result_df, touched_view_or_None)``); anything
    else returns None for the caller to run as plain Spark SQL. DML
    results are one-row frames carrying the committed version (null for a
    provable no-op) — mirroring Delta's DML returning a small metrics
    relation rather than rows."""
    from music_recommendation_service_spark.sources import snapshots as S

    q = re.sub(r"--[^\n]*", "", query).strip().rstrip(";").strip()
    head = q.split(None, 1)[0].upper() if q else ""

    def vdf(v):
        return spark.createDataFrame([(v,)], "version long")

    if head == "DELETE":
        path, name, pred = _parse_delete(q, views)
        return vdf(S.snapshot_delete_where(spark, path, pred)), name
    if head == "UPDATE":
        path, name, pred, assignments = _parse_update(q, views)
        return (
            vdf(S.snapshot_update_where(spark, path, pred, assignments)),
            name,
        )
    if head == "INSERT":
        import json as _json

        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        path, name, select, ins_mode, ins_where = _parse_insert(q, views)
        df = spark.sql(select)
        latest = S._latest_manifest(path)
        sch = StructType.fromJson(_json.loads(latest["schema"]))
        ident_col = (latest.get("identity") or {}).get("col")
        required = sorted(sch.fieldNames())
        # identity and generated columns are GENERATED ALWAYS: the INSERT
        # may omit ANY subset of them — snapshot_append assigns/auto-fills;
        # supplying a value falls through to the append's own validation
        omittable = set(latest.get("generated") or {})
        if ident_col is not None:
            omittable.add(ident_col)
        got_cols = set(df.columns)
        ok = (
            got_cols <= set(required)
            and set(required) - got_cols <= omittable
            and len(df.columns) == len(got_cols)
        )
        if not ok:
            raise SqlDispatchError(
                f"INSERT INTO {name}: query columns {sorted(df.columns)} "
                f"!= table columns {required}"
                + (f" (GENERATED ALWAYS columns {sorted(omittable)} may "
                   f"be omitted)" if omittable else "")
            )
        # Delta INSERT semantics: align by name, implicit-cast to the
        # declared column types
        df = df.select(*[
            F.col(f.name).cast(f.dataType)
            for f in sch.fields if f.name in df.columns
        ])
        if ins_mode == "OVERWRITE":
            if ins_where is not None:
                # INSERT OVERWRITE v WHERE p <select>  =  Delta replaceWhere
                v = S.snapshot_replace_where(df, path, ins_where)
            elif latest.get("partition_cols"):
                # partitioned, no scope: replace exactly the incoming
                # partitions (Spark's dynamic partitionOverwriteMode)
                v = S.snapshot_dynamic_partition_overwrite(df, path)
            else:
                v = S.snapshot_write(df, path)
            return vdf(v), name
        return vdf(S.snapshot_append(df, path)), name
    if head == "MERGE":
        (path, name, src_sql, key_cols, wm, wnm, wbs, evolve) = _parse_merge(
            q, views
        )
        v = S.snapshot_merge_when(
            spark.sql(src_sql), path, key_cols=key_cols,
            when_matched=wm, when_not_matched=wnm,
            when_not_matched_by_source=wbs,
            merge_schema=evolve,
        )
        return vdf(v), name
    if head == "CREATE":
        pm = re.match(
            rf"\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+({_IDENT})\s*(.*)$",
            q, re.IGNORECASE | re.DOTALL,
        )
        crest = pm.group(3).strip() if pm else ""
        gen_specs: list[tuple[str, str, str]] = []
        if pm and crest.startswith("("):
            # optional column-spec list — CTAS derives its schema from the
            # select, so the ONLY declarations allowed here are generated
            # columns, added on top of the select's output (the q153 shape:
            # evt_day TIMESTAMP GENERATED ALWAYS AS (date_trunc('day', ts))
            # ... PARTITIONED BY (evt_day), Delta CREATE TABLE parity)
            groups = list(_top_level_groups(crest))
            if not groups or groups[0][0] != 0:
                raise SqlDispatchError(
                    "CREATE TABLE: unbalanced column-spec list"
                )
            a, b = groups[0]
            gen_specs = _parse_gen_colspecs(crest[1:b])
            crest = crest[b + 1:].strip()
        cm = re.match(
            rf"LOCATION\s+'([^']+)'\s+"
            rf"(?:PARTITIONED\s+BY\s*\(\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)\s+)?"
            rf"(AS\s+.*|SHALLOW\s+CLONE\s+.*)$",
            crest, re.IGNORECASE | re.DOTALL,
        ) if pm else None
        if not cm:
            raise SqlDispatchError(
                "CREATE grammar: CREATE [OR REPLACE] TABLE <view> "
                "[(c TYPE GENERATED ALWAYS AS (expr), ...)] LOCATION "
                "'<path>' [PARTITIONED BY (c1, c2)] AS <select> | "
                "SHALLOW CLONE <view> [VERSION AS OF n]"
            )
        replace, name = bool(pm.group(1)), pm.group(2)
        path, pby, tail = cm.group(1), cm.group(2), cm.group(3).strip()
        partition_by = (
            [c.strip() for c in pby.split(",")] if pby else None
        )
        if name in views and views[name] != path:
            raise SqlDispatchError(
                f"view {name!r} already registered at {views[name]}"
            )
        if S.snapshot_versions(path) and not replace:
            raise SqlDispatchError(
                f"table already exists at {path}; use CREATE OR REPLACE"
            )
        clone = re.match(
            rf"SHALLOW\s+CLONE\s+({_IDENT})"
            rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*$",
            tail, re.IGNORECASE,
        )
        if clone:
            if partition_by:
                raise SqlDispatchError(
                    "SHALLOW CLONE inherits the source's partitioning; "
                    "PARTITIONED BY applies to CTAS only"
                )
            if gen_specs:
                raise SqlDispatchError(
                    "SHALLOW CLONE inherits the source's generated rules; "
                    "column specs apply to CTAS only"
                )
            src = _require_view(clone.group(1), views)
            ver = int(clone.group(2)) if clone.group(2) else None
            v = S.snapshot_clone(src, path, version=ver)
        else:
            select = re.sub(r"^AS\s+", "", tail, flags=re.IGNORECASE)
            df = spark.sql(select)
            extra = None
            if gen_specs:
                from pyspark.sql import functions as F

                for col, typ, gexpr in gen_specs:
                    if col in df.columns:
                        raise SqlDispatchError(
                            f"generated column {col!r} collides with a "
                            f"column the select already produces"
                        )
                    try:
                        df = df.withColumn(col, F.expr(gexpr).cast(typ))
                        df.schema  # force analysis: refuse BEFORE any write
                    except SqlDispatchError:
                        raise
                    except Exception as exc:
                        raise SqlDispatchError(
                            f"bad GENERATED ALWAYS AS rule for {col!r} "
                            f"({typ}, {gexpr}): {exc}"
                        ) from None
                # the rule rides the SAME commit as the data it governs —
                # every later write auto-fills/validates, and the scan
                # planner's generated-partition derivations prune on it
                extra = {"generated": {c: e for c, _t, e in gen_specs}}
            v = S.snapshot_write(
                df, path, partition_by=partition_by, manifest_extra=extra
            )
        views[name] = path  # Engine.sql re-registers it as a temp view
        return vdf(v), name
    if head == "CONVERT":
        cm = re.match(
            rf"\s*CONVERT\s+TO\s+SNAPSHOT\s+'([^']+)'\s+AS\s+({_IDENT})\s+"
            rf"LOCATION\s+'([^']+)'(?:\s+STATS\s*\(\s*({_IDENT}"
            rf"(?:\s*,\s*{_IDENT})*)\s*\))?\s*$",
            q, re.IGNORECASE,
        )
        if not cm:
            raise SqlDispatchError(
                "CONVERT grammar: CONVERT TO SNAPSHOT '<parquet file|dir>' "
                "AS <view> LOCATION '<table path>' [STATS (c1, c2, ...)]"
            )
        src, name, path, stats = cm.groups()
        if name in views and views[name] != path:
            raise SqlDispatchError(
                f"view {name!r} already registered at {views[name]}"
            )
        v = S.snapshot_convert(
            spark, src, path,
            stats_cols=[c.strip() for c in stats.split(",")] if stats else (),
        )
        views[name] = path  # Engine.sql re-registers it as a temp view
        return vdf(v), name
    if head == "ALTER":
        am = re.match(rf"\s*ALTER\s+TABLE\s+({_IDENT})\s+(.*)$", q,
                      re.IGNORECASE | re.DOTALL)
        if not am:
            raise SqlDispatchError("ALTER grammar: ALTER TABLE <view> <action>")
        name, action = am.group(1), am.group(2).strip()
        path = _require_view(name, views)
        mm = re.match(r"ADD\s+COLUMNS?\s*\((.*)\)\s*$", action,
                      re.IGNORECASE | re.DOTALL)
        if mm:
            from pyspark.sql.types import StructType

            try:
                fields = StructType.fromDDL(mm.group(1)).fields
            except Exception as e:
                raise SqlDispatchError(
                    f"ALTER TABLE {name} ADD COLUMNS: cannot parse column "
                    f"list {mm.group(1)!r}: {e}"
                ) from e
            return vdf(S.snapshot_add_columns(path, fields)), name
        mm = re.match(
            rf"RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})\s*$",
            action, re.IGNORECASE,
        )
        if mm:
            return (
                vdf(S.snapshot_rename_columns(path, {mm.group(1): mm.group(2)})),
                name,
            )
        mm = re.match(
            rf"DROP\s+COLUMNS?\s*\(?\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)?\s*$",
            action, re.IGNORECASE,
        )
        if mm:
            cols = [c.strip() for c in mm.group(1).split(",")]
            return vdf(S.snapshot_drop_columns(path, cols)), name
        mm = re.match(
            rf"ADD\s+CONSTRAINT\s+({_IDENT})\s+CHECK\s*\((.*)\)\s*$",
            action, re.IGNORECASE | re.DOTALL,
        )
        if mm:
            return (
                vdf(S.snapshot_add_constraint(spark, path, mm.group(1), mm.group(2))),
                name,
            )
        mm = re.match(rf"DROP\s+CONSTRAINT\s+({_IDENT})\s*$", action, re.IGNORECASE)
        if mm:
            return vdf(S.snapshot_drop_constraint(path, mm.group(1))), name
        mm = re.match(
            rf"SET\s+IDENTITY\s+({_IDENT})"
            rf"(?:\s+START\s+(-?\d+))?(?:\s+STEP\s+(-?\d+))?\s*$",
            action, re.IGNORECASE,
        )
        if mm:
            return (
                vdf(S.snapshot_set_identity(
                    spark, path, mm.group(1),
                    start=int(mm.group(2)) if mm.group(2) else 1,
                    step=int(mm.group(3)) if mm.group(3) else 1,
                )),
                name,
            )
        if re.match(r"DROP\s+IDENTITY\s*$", action, re.IGNORECASE):
            return vdf(S.snapshot_drop_identity(path)), name
        raise SqlDispatchError(
            f"ALTER TABLE {name}: unsupported action {action!r} — supported: "
            "ADD COLUMNS (c TYPE, ...), RENAME COLUMN a TO b, "
            "DROP COLUMN(S) a[, b], ADD CONSTRAINT n CHECK (expr), "
            "DROP CONSTRAINT n, SET IDENTITY c [START n] [STEP n], "
            "DROP IDENTITY"
        )
    if head == "DROP":
        dm = re.match(
            rf"\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?({_IDENT})\s*$",
            q, re.IGNORECASE,
        )
        if not dm:
            raise SqlDispatchError(
                "DROP grammar: DROP TABLE [IF EXISTS] <view> — unregisters "
                "the name; data at the table's LOCATION is untouched "
                "(external-table semantics)"
            )
        if_exists, name = bool(dm.group(1)), dm.group(2)
        if name not in views:
            if if_exists:
                return spark.createDataFrame([(False,)], "dropped boolean"), None
            raise SqlDispatchError(
                f"DROP TABLE {name}: not a registered snapshot view "
                f"(known: {sorted(views)})"
            )
        del views[name]  # Engine syncs the durable catalog off this dict
        spark.catalog.dropTempView(name)
        return spark.createDataFrame([(True,)], "dropped boolean"), None
    if head == "SHOW":
        if re.match(r"\s*SHOW\s+TABLES\s*$", q, re.IGNORECASE):
            rows = sorted(views.items())
            return (
                spark.createDataFrame(rows or [], "name string, path string"),
                None,
            )
        pm = re.match(
            rf"\s*SHOW\s+PARTITIONS\s+({_IDENT})\s*$", q, re.IGNORECASE
        )
        if pm:
            # metadata only: partition tuples + live row/file counts from
            # manifest entries — never opens a data file. Column names
            # come from the manifest's partition_cols declaration, not the
            # first record, so a partitioned table with ZERO live entries
            # (all rows deleted / every partition dropped) returns an
            # empty frame with the right schema instead of crashing.
            ppath = _require_view(pm.group(1), views)
            recs = S.snapshot_partitions(ppath)
            # partition_cols straight off the manifest (O(1) on a pointer
            # manifest) — snapshot_detail would stat every live data file
            pcols = list(
                S._read_manifest(
                    ppath, S.snapshot_versions(ppath)[-1]
                ).get("partition_cols")
                or []
            )
            return (
                spark.createDataFrame(
                    [
                        tuple(
                            [str(r[c]) if r[c] is not None else None for c in pcols]
                            + [r["n_rows"], r["n_files"]]
                        )
                        for r in recs
                    ],
                    ", ".join([f"{c} string" for c in pcols])
                    + ", n_rows long, n_files long",
                ),
                None,
            )
        return None
    if head == "OPTIMIZE":
        om = re.match(
            rf"\s*OPTIMIZE\s+({_IDENT})"
            rf"(?:\s+WHERE\s+(.+?))?"
            rf"(?:\s+ZORDER\s+BY\s*\(?\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)?)?\s*$",
            q, re.IGNORECASE,
        )
        if not om:
            raise SqlDispatchError(
                "OPTIMIZE grammar: OPTIMIZE <view> [WHERE <pred>] "
                "[ZORDER BY (c1, c2, ...)]"
            )
        name, where, zcols = om.group(1), om.group(2), om.group(3)
        path = _require_view(name, views)
        if zcols:
            v = S.snapshot_zorder(
                spark, path, [c.strip() for c in zcols.split(",")],
                where=where,
            )
        else:
            v = S.snapshot_compact(spark, path, where=where)
        return vdf(v), name
    if head == "VACUUM":
        vm = re.match(
            rf"\s*VACUUM\s+({_IDENT})(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?"
            rf"(\s+DRY\s+RUN)?\s*$",
            q, re.IGNORECASE,
        )
        if not vm:
            raise SqlDispatchError(
                "VACUUM grammar: VACUUM <view> [RETAIN <n> VERSIONS] "
                "[DRY RUN] — the snapshot protocol's retention unit is "
                "manifest versions, not hours"
            )
        name, keep, dry = vm.group(1), vm.group(2), bool(vm.group(3))
        removed = S.snapshot_vacuum(
            _require_view(name, views),
            keep_last=int(keep) if keep else 2,
            dry_run=dry,
        )
        if dry:
            # Delta DRY RUN parity: list what WOULD be removed, touch nothing
            return (
                spark.createDataFrame(
                    [(p,) for p in removed] or [], "path string"
                ),
                None,
            )
        return (
            spark.createDataFrame(
                [(len(removed),)], "paths_removed long"
            ),
            name,
        )
    if head == "RESTORE":
        rm = re.match(
            rf"\s*RESTORE\s+(?:TABLE\s+)?({_IDENT})\s+TO\s+"
            rf"(VERSION|TIMESTAMP)\s+AS\s+OF\s+(?:(\d+)|'([^']+)')\s*$",
            q, re.IGNORECASE,
        )
        if not rm:
            raise SqlDispatchError(
                "RESTORE grammar: RESTORE [TABLE] <view> TO "
                "VERSION AS OF <n> | TIMESTAMP AS OF '<iso ts>'"
            )
        name, kind = rm.group(1), rm.group(2).upper()
        path = _require_view(name, views)
        if kind == "VERSION":
            if rm.group(3) is None:
                raise SqlDispatchError("VERSION AS OF takes an integer")
            target = int(rm.group(3))
        else:
            if rm.group(4) is None:
                raise SqlDispatchError("TIMESTAMP AS OF takes a quoted timestamp")
            import datetime as _dt

            ts = _dt.datetime.fromisoformat(rm.group(4))
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            epoch = ts.timestamp()
            eligible = [
                vv for vv in S.snapshot_versions(path)
                if (S._read_manifest(path, vv).get("committed_at") or 0) <= epoch
            ]
            if not eligible:
                raise SqlDispatchError(
                    f"RESTORE {name}: no version at or before {rm.group(4)}"
                )
            target = eligible[-1]
        return vdf(S.snapshot_rollback(path, target)), name
    if head == "DESCRIBE":
        dm = re.match(
            rf"\s*DESCRIBE\s+DETAIL\s+({_IDENT})\s*$", q, re.IGNORECASE
        )
        if dm:
            d = S.snapshot_detail(_require_view(dm.group(1), views))
            return (
                spark.createDataFrame(
                    [(
                        d["location"], d["format"], d["version"],
                        d["num_files"], d["num_rows"], d["size_bytes"],
                        d["data_dirs"], ",".join(d["constraints"]),
                        d["identity_col"],
                        ",".join(d["generated_cols"]),
                        d["column_mapping"],
                        ",".join(d["partition_cols"]),
                        float(d["created_at"] or 0),
                        float(d["last_modified"] or 0),
                        d["retained_versions"],
                        d["manifest_form"], d["checkpoint_layout"],
                        d["checkpoint_bytes"],
                        d["min_reader"], d["min_writer"],
                    )],
                    "location string, format string, version long, "
                    "num_files long, num_rows long, size_bytes long, "
                    "data_dirs long, constraints string, "
                    "identity_col string, generated_cols string, "
                    "column_mapping boolean, "
                    "partition_cols string, "
                    "created_at double, last_modified double, "
                    "retained_versions long, "
                    "manifest_form string, checkpoint_layout string, "
                    "checkpoint_bytes long, "
                    "min_reader long, min_writer long",
                ),
                None,
            )
        dm = re.match(
            rf"\s*DESCRIBE\s+HISTORY\s+({_IDENT})\s*$", q, re.IGNORECASE
        )
        if dm:
            name = dm.group(1)
            hist = S.snapshot_history(_require_view(name, views))
            rows = [
                (
                    h["version"], h["op"], float(h["committed_at"] or 0),
                    h["n_rows"], h["n_files"], h["net_rows"],
                    h["n_files_added"], h["n_files_removed"],
                    bool(h["data_change"]), h.get("commit_attempts", 1),
                )
                for h in hist
            ]
            return (
                spark.createDataFrame(
                    rows,
                    "version long, op string, committed_at double, "
                    "n_rows long, n_files long, net_rows long, "
                    "n_files_added long, n_files_removed long, "
                    "data_change boolean, commit_attempts long",
                ),
                None,
            )
        return None
    if views and _find_top(q, r"\btable_changes\b|\bsnapshot_files\b"):
        q2 = q
        if _find_top(q2, r"\bsnapshot_files\b"):
            q2 = _rewrite_snapshot_files(spark, q2, views)
        if _find_top(q2, r"\btable_changes\b"):
            q2 = _rewrite_table_changes(spark, q2, views)
        if _find_top(q2, r"\b(VERSION|TIMESTAMP)\s+AS\s+OF\b"):
            q2 = _rewrite_time_travel(spark, q2, views)
        return spark.sql(q2), None
    if views and _find_top(q, r"\b(VERSION|TIMESTAMP)\s+AS\s+OF\b"):
        return spark.sql(_rewrite_time_travel(spark, q, views)), None
    return None
