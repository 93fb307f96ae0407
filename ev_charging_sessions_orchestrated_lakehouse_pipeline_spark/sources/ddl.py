"""SQL-*text* management surface for snapshot tables.

The reference manages its lakehouse tables entirely through
``spark.sql`` DDL text (``CREATE TABLE ... USING iceberg ...
TBLPROPERTIES``, ALTER/OPTIMIZE statements —
jobs/ev_sessions_gold_etl.py:127-150), and its analysts reach the
catalog by NAME, durably, through Glue (README.md:41).  The snapshot
format's management operations have been Python-API/CLI only:
:func:`execute_sql` closes that gap by routing the standard
lakehouse-DDL statement shapes to the existing, tested snapshot
functions, and :func:`register_all_tables` gives a fresh session
Glue-like one-call durable catalog bootstrap — every snapshot table
under a warehouse root becomes addressable from ``spark.sql`` by its
directory name.

Design notes (and why this is NOT a SQL parser):

* The grammar below is the fixed, documented statement vocabulary of
  the lakehouse-management surface (Delta/Iceberg's ALTER TABLE /
  OPTIMIZE / VACUUM / RESTORE / DESCRIBE shapes).  Each statement is
  matched by an anchored regex and dispatched to the single
  authoritative implementation in :mod:`snaptable` — there is exactly
  one code path per operation, so SQL text and the Python API can
  never diverge semantically.
* Anything that is NOT a management statement falls through to
  ``spark.sql`` untouched, so one entry point serves both queries
  (over views from :func:`register_all_tables` /
  ``register_snapshot_view``) and management.
* Every statement returns a DataFrame (possibly a one-row status
  frame), matching ``spark.sql``'s contract so callers can treat the
  endpoint uniformly.

Scale: every routed operation is metadata-bounded on the driver
(manifest reads + one commit); the heavy ones (OPTIMIZE's rewrite,
ANALYZE's scan) run as normal distributed Spark jobs inside the
routed function.  Nothing here touches data on the driver.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import snaptable as st

__all__ = ["execute_sql", "register_all_tables", "resolve_table"]

#: table identifier inside a statement: `backquoted path`, 'quoted
#: path', "quoted path", or a bare [dotted] identifier resolved
#: against the warehouse root
_IDENT = r"(`[^`]+`|'[^']+'|\"[^\"]+\"|[A-Za-z_][\w.]*)"


def resolve_table(ident: str, warehouse: str | None = None) -> str:
    """Resolve a statement's table identifier to a snapshot-table
    path.  Quoted/backquoted identifiers and anything containing a
    path separator are taken as paths verbatim (the ``delta.`/path/``
    idiom without the scheme prefix); a bare name needs ``warehouse``
    and resolves to ``<warehouse>/<name>`` — the Glue-database model
    where a database IS a storage prefix."""
    t = ident.strip()
    if t[:1] in "`'\"" and t[-1:] == t[:1]:
        return t[1:-1]
    if os.sep in t:
        return t
    if warehouse is None:
        raise ValueError(
            f"bare table name {t!r} needs a warehouse root to resolve "
            "against (pass warehouse=, or quote a full path)"
        )
    return os.path.join(warehouse, t)


def _row_df(spark: SparkSession, d: dict) -> DataFrame:
    """One-row status DataFrame with stable lexicographic column
    order and JSON-encoded nested values (statement results must be
    schema-stable across runs)."""
    cols = sorted(d)
    vals = tuple(
        json.dumps(d[c], default=str) if isinstance(d[c], (dict, list)) else d[c]
        for c in cols
    )
    return spark.createDataFrame([vals], cols)


def _parse_tblproperties(body: str) -> dict[str, str]:
    """``'k'='v', k2=v2`` — quoted or bare keys/values."""
    props: dict[str, str] = {}
    for part in _split_top_level(body):
        if "=" not in part:
            raise ValueError(f"TBLPROPERTIES expects k=v pairs, got {part!r}")
        k, v = part.split("=", 1)
        props[_unquote(k)] = _unquote(v)
    return props


def _split_top_level(body: str) -> list[str]:
    """Split on commas not inside quotes or parentheses (property
    values may carry commas; UPDATE SET expressions carry function
    calls)."""
    out, cur, q, depth = [], [], None, 0
    for ch in body:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def _unquote(s: str) -> str:
    s = s.strip()
    if s[:1] in "'\"`" and s[-1:] == s[:1]:
        return s[1:-1]
    return s


def _cols_list(body: str) -> list[str]:
    return [_unquote(c) for c in body.split(",") if c.strip()]


def _parse_literal(tok: str):
    t = tok.strip()
    if t[:1] in "'\"":
        return _unquote(t)
    low = t.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return int(t)
    except ValueError:
        pass
    try:
        return float(t)
    except ValueError:
        raise ValueError(f"unsupported literal {tok!r} in WHERE clause")


#: one conjunct of the supported WHERE grammar
_CONJ = re.compile(
    r"\s*(\w+)\s*(?:"
    r"(IS\s+NOT\s+NULL)|(IS\s+NULL)"
    r"|(IN)\s*\(((?:[^()'\"]|'[^']*'|\"[^\"]*\")*)\)"
    r"|(>=|<=|!=|<>|=|>|<)\s*('[^']*'|\"[^\"]*\"|[\w.+-]+)"
    r")\s*",
    re.IGNORECASE,
)


def parse_where(clause: str) -> list[tuple]:
    """Parse a CONJUNCTIVE WHERE clause into the filter-tuple form
    the snapshot DML takes (``[(col, op, val), ...]``) — deliberately
    restricted to ``col OP literal [AND ...]`` / ``IS [NOT] NULL`` /
    ``IN (...)`` because these tuples drive the format's FILE-LEVEL
    DATA SKIPPING (snaptable._prune_files): an opaque predicate would
    force reading every file, which at 100 TB defeats the point of
    stats. Disjunctions or expressions raise with a pointer to the
    Python API (which accepts arbitrary Column predicates via
    DataFrame rewrite)."""
    out: list[tuple] = []
    rest = clause.strip()
    while rest:
        m = _CONJ.match(rest)
        if not m:
            raise ValueError(
                f"unsupported WHERE fragment {rest!r}: SQL DML supports "
                "conjunctions of col OP literal / IS [NOT] NULL / "
                "IN (...) (these drive file-level data skipping); use "
                "the Python API for arbitrary predicates"
            )
        col = m.group(1)
        if m.group(2):
            out.append((col, "notnull", None))
        elif m.group(3):
            out.append((col, "isnull", None))
        elif m.group(4):
            # quote-aware split: a quoted IN literal may carry commas
            vals = _split_top_level(m.group(5))
            if not vals:
                raise ValueError(
                    f"empty IN list for column {col!r}: matches nothing "
                    "by definition — almost certainly a statement bug"
                )
            out.append((col, "in", [_parse_literal(v) for v in vals]))
        else:
            op = "!=" if m.group(6) == "<>" else m.group(6)
            out.append((col, op, _parse_literal(m.group(7))))
        rest = rest[m.end():]
        if rest:
            am = re.match(r"AND\s+", rest, re.IGNORECASE)
            if not am:
                raise ValueError(
                    f"unsupported WHERE connective at {rest!r}: only AND "
                    "is supported (disjunctions don't prune files)"
                )
            rest = rest[am.end():]
    return out


# ---------------------------------------------------------------------------
# statement grammar — anchored, case-insensitive, whitespace-tolerant
# ---------------------------------------------------------------------------

_F = re.IGNORECASE | re.DOTALL


def _m(pattern: str, sql: str):
    return re.fullmatch(pattern, sql.strip().rstrip(";").strip(), _F)


def execute_sql(
    spark: SparkSession, statement: str, warehouse: str | None = None
) -> DataFrame:
    """Run one SQL statement against the lakehouse: management DDL
    (the Delta/Iceberg ALTER TABLE / OPTIMIZE / VACUUM / RESTORE /
    ANALYZE / DESCRIBE vocabulary, routed to :mod:`snaptable`) or —
    fallthrough — any ordinary Spark SQL over the session catalog.
    Always returns a DataFrame.  The statement shapes mirror the
    reference's SQL-first table management
    (jobs/ev_sessions_gold_etl.py:127-150):

    * ``CREATE TABLE [IF NOT EXISTS] t [USING snapshot] [PARTITIONED
      BY (c1, ...)] [CLUSTER BY (c1, ...)] [TBLPROPERTIES (...)]
      AS SELECT ...`` — the reference's CTAS shape
      (jobs/ev_sessions_gold_etl.py:127-150) + liquid declaration
    * ``INSERT INTO t SELECT ... | VALUES ...``
    * ``COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET|CSV|JSON
      [PATTERN = '<glob>'] [FORMAT_OPTIONS (...)] [COPY_OPTIONS
      ('force'='true')]`` — idempotent file ingest (loaded files skip
      on re-run)
    * ``DELETE FROM t [WHERE <conjunctive predicate>]``
    * ``UPDATE t SET c = expr [, ...] [WHERE <conjunctive predicate>]``
      — WHERE grammar is the skipping-friendly conjunctive subset
      (see :func:`parse_where`)
    * ``MERGE INTO t USING src|(<subquery>) [AS] s ON t.k = s.k [AND
      ...] WHEN MATCHED THEN UPDATE SET * | [AND c] THEN DELETE, WHEN
      NOT MATCHED THEN INSERT *, WHEN NOT MATCHED BY SOURCE [AND c]
      THEN DELETE`` — whole-row semantics (Delta's ``SET *``/
      ``INSERT *`` idiom). Conditions are allowed only on DELETE
      clauses (matched-delete conditions evaluate on SOURCE rows,
      by-source ones on TARGET rows; cross-alias references are
      rejected); conditional UPDATE/INSERT and column-level clauses
      need the Python API — filter the source subquery instead
    * ``ALTER TABLE t ADD CONSTRAINT name CHECK (expr)``
    * ``ALTER TABLE t DROP CONSTRAINT [IF EXISTS] name``
    * ``ALTER TABLE t DROP FEATURE feature-name`` (protocol downgrade)
    * ``ALTER TABLE t CLUSTER BY (c1, ...) | NONE`` (liquid clustering)
    * ``ALTER TABLE t SET TBLPROPERTIES ('k'='v', ...)``
    * ``ALTER TABLE t UNSET TBLPROPERTIES [IF EXISTS] ('k', ...)``
    * ``ALTER TABLE t RENAME COLUMN old TO new``
    * ``ALTER TABLE t DROP COLUMN c``
    * ``ALTER TABLE t ALTER COLUMN c TYPE newtype`` (type widening)
    * ``OPTIMIZE t [ZORDER BY (c1, c2)]``
    * ``VACUUM t [RETAIN n HOURS] [DRY RUN]``
    * ``RESTORE TABLE t TO VERSION AS OF n``
    * ``RESTORE TABLE t TO TIMESTAMP AS OF <unix-seconds or 'ts'>``
    * ``ANALYZE TABLE t COMPUTE STATISTICS FOR {ALL COLUMNS|COLUMNS c1, ...}``
    * ``DESCRIBE HISTORY t``
    * ``DESCRIBE DETAIL t``
    * ``SHOW TABLES [IN '<root>']`` / ``SHOW TBLPROPERTIES t``
    * ``DROP TABLE [IF EXISTS] t`` (refuses non-snapshot directories)

    ``t`` is a backquoted/quoted path or a bare name resolved against
    ``warehouse`` (see :func:`resolve_table`)."""

    def tbl(ident: str) -> str:
        return resolve_table(ident, warehouse)

    s = statement

    m = _m(
        rf"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?{_IDENT}"
        rf"(?:\s+USING\s+snapshot)?"
        # one paren nesting level so hidden-partitioning transforms
        # (days(ts), bucket(4, id)) parse
        rf"(?:\s+PARTITIONED\s+BY\s*\(((?:[^()]|\([^()]*\))+)\))?"
        rf"(?:\s+CLUSTER\s+BY\s*\(([^)]+)\))?"
        rf"(?:\s+TBLPROPERTIES\s*\(([^)]+)\))?"
        rf"\s+AS\s+(SELECT\s+.+)",
        s,
    )
    if m:
        t = tbl(m.group(2))
        if st.current_version(t) is not None:
            if m.group(1):
                return _row_df(
                    spark,
                    {
                        "operation": "create_table",
                        "version": st.current_version(t),
                        "skipped": "exists",
                    },
                )
            raise ValueError(f"{t} already exists (use IF NOT EXISTS)")
        # paren-aware split: bucket(4, id) holds a top-level-looking
        # comma inside its own parens
        pcols = (
            [p.replace(" ", "") if "(" in p else p
             for p in _split_top_level(m.group(3))]
            if m.group(3)
            else []
        )
        v = st.create_table(spark.sql(m.group(6)), t, pcols)
        if m.group(4):  # CLUSTER BY at creation (liquid tables)
            v = st.set_clustering(t, _cols_list(m.group(4)))
        if m.group(5):
            v = st.set_table_properties(t, _parse_tblproperties(m.group(5)))
        return _row_df(spark, {"operation": "create_table", "version": v})

    m = _m(
        rf"COPY\s+INTO\s+{_IDENT}\s+FROM\s+('[^']+'|\"[^\"]+\")"
        rf"\s+FILEFORMAT\s*=\s*(\w+)"
        rf"(?:\s+PATTERN\s*=\s*('[^']+'|\"[^\"]+\"))?"
        rf"(?:\s+FORMAT_OPTIONS\s*\(([^)]*)\))?"
        rf"(?:\s+COPY_OPTIONS\s*\(([^)]*)\))?",
        s,
    )
    if m:
        copts = _parse_tblproperties(m.group(6)) if m.group(6) else {}
        rep = st.copy_into(
            spark,
            tbl(m.group(1)),
            _unquote(m.group(2)),
            file_format=m.group(3).lower(),
            pattern=_unquote(m.group(4)) if m.group(4) else None,
            options=_parse_tblproperties(m.group(5)) if m.group(5) else None,
            force=str(copts.get("force", "")).lower() == "true",
        )
        if rep["version"] is None:  # nothing new: report the head
            rep["version"] = st.current_version(tbl(m.group(1)))
        return _row_df(spark, {"operation": "copy_into", **rep})

    m = _m(rf"INSERT\s+INTO\s+{_IDENT}\s+(SELECT\s+.+|VALUES\s*.+)", s)
    if m:
        t = tbl(m.group(1))
        body = m.group(2)
        if re.match(r"VALUES", body, re.IGNORECASE):
            df = spark.sql(f"SELECT * FROM ({body})")
        else:
            df = spark.sql(body)
        head = st.current_version(t)
        if head is None:
            raise ValueError(f"{t} does not exist")
        target = st.read_snapshot(spark, t).schema
        if len(df.columns) != len(target.fields):
            raise ValueError(
                f"INSERT arity mismatch: {t} has {len(target.fields)} "
                f"columns, statement supplies {len(df.columns)}"
            )
        # positional bind + implicit cast to the target types — the
        # standard SQL INSERT coercion (a VALUES literal 0 is int,
        # the table column may be bigint)
        aligned = df.toDF(*[f.name for f in target.fields]).select(
            *[F.col(f.name).cast(f.dataType) for f in target.fields]
        )
        v = st.append(aligned, t)
        return _row_df(spark, {"operation": "insert", "version": v})

    m = _m(rf"DELETE\s+FROM\s+{_IDENT}(?:\s+WHERE\s+(.+))?", s)
    if m:
        filters = parse_where(m.group(2)) if m.group(2) else []
        v = st.delete_where(spark, tbl(m.group(1)), filters)
        return _row_df(spark, {"operation": "delete", "version": v})

    m = _m(rf"UPDATE\s+{_IDENT}\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?", s)
    if m:
        set_exprs = {}
        for part in _split_top_level(m.group(2)):
            if "=" not in part:
                raise ValueError(f"UPDATE SET expects col = expr, got {part!r}")
            c, e = part.split("=", 1)
            set_exprs[c.strip()] = e.strip()
        filters = parse_where(m.group(3)) if m.group(3) else []
        v = st.update_where(spark, tbl(m.group(1)), filters, set_exprs)
        return _row_df(spark, {"operation": "update", "version": v})

    m = _m(
        rf"MERGE\s+INTO\s+{_IDENT}\s+USING\s+"
        rf"(\((?:[^()]|\([^()]*\))*\)|[A-Za-z_]\w*)"
        rf"(?:\s+AS)?\s+(\w+)\s+ON\s+(.+?)\s+(WHEN\s+.+)",
        s,
    )
    if m:
        t = tbl(m.group(1))
        src_sql, alias, on, clauses = (
            m.group(2),
            m.group(3),
            m.group(4),
            m.group(5),
        )
        src = (
            spark.sql(src_sql[1:-1])
            if src_sql.startswith("(")
            else spark.table(src_sql)
        )
        # ON: conjunction of same-named equi-joins (t.k = s.k) — the
        # form merge keys take; anything else can't drive the pruned
        # partition-rewrite path and raises
        keys = []
        target_alias = None
        for conj in re.split(r"\s+AND\s+", on, flags=_F):
            em = re.fullmatch(
                r"\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*", conj
            )
            if not em or em.group(2) != em.group(4):
                raise ValueError(
                    f"unsupported MERGE ON fragment {conj!r}: use "
                    "conjunctions of target.k = source.k with matching "
                    "column names (merge keys); arbitrary join "
                    "conditions need the Python API"
                )
            # either side may be the source alias; the other qualifier
            # names the target
            q1, q2 = em.group(1), em.group(3)
            target_alias = q1 if q2 == alias else q2
            keys.append(em.group(2))

        _LIT = r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\""

        def _sub_outside_literals(pattern: str, repl: str, text: str) -> str:
            """re.sub applied only OUTSIDE string literals — an alias
            prefix inside a quoted value is data, not a reference."""
            parts = re.split(f"({_LIT})", text)
            return "".join(
                p if p[:1] in "'\"" else re.sub(pattern, repl, p)
                for p in parts
            )

        def _unqualify(cond: str, evaluated_on: str) -> str:
            """Strip the alias the condition's frame provides (outside
            string literals); a reference to the OTHER side's alias
            cannot be evaluated there and must be rejected, not
            silently misresolved."""
            keep = alias if evaluated_on == "source" else target_alias
            other = target_alias if evaluated_on == "source" else alias
            stripped = re.sub(_LIT, "''", cond)
            if other and re.search(rf"\b{other}\.", stripped):
                raise ValueError(
                    f"MERGE condition {cond!r} references the "
                    f"{'target' if evaluated_on == 'source' else 'source'}"
                    f" alias {other!r}, but this clause is evaluated on "
                    f"the {evaluated_on} rows only; rewrite it over "
                    f"{evaluated_on} columns (alias {keep!r})"
                )
            return (
                _sub_outside_literals(rf"\b{keep}\.", "", cond)
                if keep
                else cond
            )
        delete_col = None
        nmbs: bool | str | None = None
        rest = clauses
        saw_update = saw_insert = False
        matched_closed = False  # an unconditional MATCHED clause seen
        clause_re = re.compile(
            r"WHEN\s+(NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED|MATCHED)"
            r"(?:\s+AND\s+(.+?))?\s+THEN\s+"
            r"(UPDATE\s+SET\s+\*|INSERT\s+\*|DELETE)\s*",
            _F,
        )
        while rest.strip():
            cm = clause_re.match(rest.strip())
            if not cm:
                raise ValueError(
                    f"unsupported MERGE clause at {rest.strip()[:60]!r}: "
                    "supported forms are WHEN MATCHED [AND c] THEN "
                    "UPDATE SET * | DELETE, WHEN NOT MATCHED THEN "
                    "INSERT *, WHEN NOT MATCHED BY SOURCE [AND c] THEN "
                    "DELETE (column-level clauses need the Python API)"
                )
            kind = re.sub(r"\s+", " ", cm.group(1).upper())
            cond, action = cm.group(2), cm.group(3).upper()
            action = re.sub(r"\s+", " ", action)
            # SQL MERGE clauses evaluate in order, first match wins:
            # a MATCHED clause after an UNCONDITIONAL matched clause
            # is unreachable — refuse, like Spark/Delta's analyzer
            if kind == "MATCHED":
                if matched_closed:
                    raise ValueError(
                        f"unreachable MERGE clause 'WHEN MATCHED"
                        f"{' AND ' + cond if cond else ''} THEN {action}': "
                        "an earlier unconditional WHEN MATCHED clause "
                        "already consumes every matched row (clauses "
                        "evaluate in order, first match wins)"
                    )
                if not cond:
                    matched_closed = True
            if kind == "MATCHED" and action == "UPDATE SET *":
                if cond:
                    # whole-row merge has no conditional-update form:
                    # honoring it would need per-row clause dispatch —
                    # refuse loudly instead of updating every match
                    raise ValueError(
                        "WHEN MATCHED AND <cond> THEN UPDATE SET * is "
                        "not supported (whole-row merge updates every "
                        "match); filter the SOURCE subquery instead"
                    )
                saw_update = True
            elif kind == "NOT MATCHED" and action == "INSERT *":
                if cond:
                    raise ValueError(
                        "WHEN NOT MATCHED AND <cond> THEN INSERT * is "
                        "not supported; filter the SOURCE subquery "
                        "instead"
                    )
                saw_insert = True
            elif kind == "MATCHED" and action == "DELETE":
                # a matched-delete condition rides the source as a
                # marker column (merge_into's delete_col protocol) —
                # it is evaluated on SOURCE rows
                delete_col = "__merge_sql_delete"
                pred = (
                    F.expr(_unqualify(cond, "source"))
                    if cond
                    else F.lit(True)
                )
                src = src.withColumn(delete_col, F.coalesce(pred, F.lit(False)))
            elif kind == "NOT MATCHED BY SOURCE" and action == "DELETE":
                # evaluated on the TARGET rows the source did not match
                nmbs = _unqualify(cond, "target") if cond else True
            else:
                raise ValueError(
                    f"unsupported MERGE combination: WHEN {kind} THEN "
                    f"{action}"
                )
            rest = rest.strip()[cm.end():]
        if not (saw_update and saw_insert):
            # merge_into is an upsert: matched rows update and
            # unmatched source rows insert UNCONDITIONALLY, so a
            # statement omitting either clause would still get both
            # behaviors — refuse rather than silently exceed the text
            raise ValueError(
                "MERGE needs BOTH WHEN MATCHED THEN UPDATE SET * and "
                "WHEN NOT MATCHED THEN INSERT * (whole-row upsert "
                "semantics; delete clauses are optional additions)"
            )
        # source columns the target schema doesn't carry are batch
        # plumbing (CDC flags, sequence numbers) — drop them before
        # the whole-row merge, keeping the delete marker
        target_cols = set(st.read_snapshot(spark, t).columns)
        extra = [
            c for c in src.columns if c not in target_cols and c != delete_col
        ]
        if extra:
            src = src.drop(*extra)
        v = st.merge_into(
            spark,
            t,
            src,
            keys,
            delete_col=delete_col,
            not_matched_by_source_delete=nmbs,
        )
        return _row_df(spark, {"operation": "merge", "version": v})

    m = _m(
        rf"ALTER\s+TABLE\s+{_IDENT}\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)",
        s,
    )
    if m:
        v = st.add_constraint(spark, tbl(m.group(1)), m.group(2), m.group(3).strip())
        return _row_df(spark, {"operation": "add_constraint", "version": v})

    m = _m(
        rf"ALTER\s+TABLE\s+{_IDENT}\s+DROP\s+CONSTRAINT\s+(IF\s+EXISTS\s+)?(\w+)",
        s,
    )
    if m:
        v = st.drop_constraint(tbl(m.group(1)), m.group(3), if_exists=bool(m.group(2)))
        return _row_df(spark, {"operation": "drop_constraint", "version": v})

    m = _m(rf"ALTER\s+TABLE\s+{_IDENT}\s+SET\s+TBLPROPERTIES\s*\((.+)\)", s)
    if m:
        t = tbl(m.group(1))
        v = st.set_table_properties(t, _parse_tblproperties(m.group(2)))
        return _row_df(
            spark,
            {
                "operation": "set_properties",
                "version": v,
                "properties": st.table_properties(t),
            },
        )

    m = _m(
        rf"ALTER\s+TABLE\s+{_IDENT}\s+UNSET\s+TBLPROPERTIES\s*"
        rf"(IF\s+EXISTS\s+)?\((.+)\)",
        s,
    )
    if m:
        t = tbl(m.group(1))
        v = st.unset_table_properties(
            t, _cols_list(m.group(3)), if_exists=bool(m.group(2))
        )
        return _row_df(
            spark,
            {
                "operation": "unset_properties",
                "version": v,
                "properties": st.table_properties(t),
            },
        )

    m = _m(
        rf"ALTER\s+TABLE\s+{_IDENT}\s+CLUSTER\s+BY\s+(?:NONE|\(([^)]+)\))", s
    )
    if m:
        cols = _cols_list(m.group(2)) if m.group(2) else None
        v = st.set_clustering(tbl(m.group(1)), cols)
        return _row_df(spark, {"operation": "cluster_by", "version": v})

    m = _m(rf"ALTER\s+TABLE\s+{_IDENT}\s+DROP\s+FEATURE\s+([\w-]+)", s)
    if m:
        v = st.drop_feature(tbl(m.group(1)), m.group(2))
        return _row_df(spark, {"operation": "drop_feature", "version": v})

    m = _m(rf"ALTER\s+TABLE\s+{_IDENT}\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)", s)
    if m:
        v = st.rename_column(tbl(m.group(1)), m.group(2), m.group(3))
        return _row_df(spark, {"operation": "rename_column", "version": v})

    m = _m(rf"ALTER\s+TABLE\s+{_IDENT}\s+DROP\s+COLUMN\s+(\w+)", s)
    if m:
        v = st.drop_column(tbl(m.group(1)), m.group(2))
        return _row_df(spark, {"operation": "drop_column", "version": v})

    m = _m(
        rf"ALTER\s+TABLE\s+{_IDENT}\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+([\w(),\s]+)",
        s,
    )
    if m:
        v = st.widen_column(tbl(m.group(1)), m.group(2), m.group(3).strip().lower())
        return _row_df(spark, {"operation": "widen_column", "version": v})

    m = _m(rf"OPTIMIZE\s+{_IDENT}(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?", s)
    if m:
        zcols = _cols_list(m.group(2)) if m.group(2) else None
        v = st.optimize(
            spark, tbl(m.group(1)), cluster_by=zcols, zorder=bool(zcols)
        )
        return _row_df(spark, {"operation": "optimize", "version": v})

    m = _m(
        rf"VACUUM\s+{_IDENT}"
        rf"(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?(\s+DRY\s+RUN)?",
        s,
    )
    if m:
        # RETAIN n HOURS is Delta's retention window: it bounds BOTH
        # time travel (age-based manifest expiry) and the unreferenced-
        # file grace (files younger than the window survive the sweep)
        hours = float(m.group(2)) if m.group(2) else None
        rep = st.vacuum(
            tbl(m.group(1)),
            dry_run=bool(m.group(3)),
            grace_seconds=hours * 3600.0 if hours is not None else None,
            retain_hours=hours,
        )
        return _row_df(spark, {"operation": "vacuum", **rep})

    m = _m(rf"RESTORE\s+TABLE\s+{_IDENT}\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)", s)
    if m:
        v = st.rollback(tbl(m.group(1)), int(m.group(2)))
        return _row_df(spark, {"operation": "restore", "version": v})

    m = _m(
        rf"RESTORE\s+TABLE\s+{_IDENT}\s+TO\s+TIMESTAMP\s+AS\s+OF\s+"
        rf"('[^']+'|\d+(?:\.\d+)?)",
        s,
    )
    if m:
        raw = m.group(2)
        ts: object
        if raw.startswith("'"):
            import datetime

            ts = datetime.datetime.fromisoformat(_unquote(raw))
        else:
            ts = float(raw)
        v = st.restore_to_timestamp(tbl(m.group(1)), ts)
        return _row_df(spark, {"operation": "restore", "version": v})

    m = _m(
        rf"ANALYZE\s+TABLE\s+{_IDENT}\s+COMPUTE\s+STATISTICS\s+FOR\s+"
        rf"(ALL\s+COLUMNS|COLUMNS\s+.+)",
        s,
    )
    if m:
        spec = m.group(2)
        cols = (
            None
            if re.fullmatch(r"ALL\s+COLUMNS", spec, _F)
            else _cols_list(re.sub(r"^COLUMNS\s+", "", spec, flags=_F))
        )
        v = st.analyze_table(spark, tbl(m.group(1)), columns=cols)
        return _row_df(spark, {"operation": "analyze", "version": v})

    m = _m(r"SHOW\s+TABLES(?:\s+IN\s+(\S+))?", s)
    if m:
        root = _unquote(m.group(1)) if m.group(1) else warehouse
        if root is None:
            raise ValueError("SHOW TABLES needs a warehouse (IN '<root>')")
        rows = []
        for entry in sorted(os.listdir(root)) if os.path.isdir(root) else []:
            path = os.path.join(root, entry)
            if _is_snapshot_table(path):
                rows.append((entry, path, st.current_version(path)))
        return spark.createDataFrame(
            rows, "tableName string, location string, version int"
        )

    m = _m(rf"SHOW\s+TBLPROPERTIES\s+{_IDENT}", s)
    if m:
        props = st.table_properties(tbl(m.group(1)))
        return spark.createDataFrame(
            sorted(props.items()) or [], "key string, value string"
        )

    m = _m(rf"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?{_IDENT}", s)
    if m:
        t = tbl(m.group(2))
        if st.current_version(t) is None:
            if m.group(1):
                return _row_df(
                    spark, {"operation": "drop_table", "skipped": "absent"}
                )
            raise ValueError(f"{t} does not exist (or is not a snapshot table)")
        # refuses anything that isn't a snapshot table: the manifest
        # check above is the guard against rm -rf'ing an arbitrary dir
        import shutil

        shutil.rmtree(t)
        return _row_df(spark, {"operation": "drop_table", "location": t})

    m = _m(rf"DESCRIBE\s+HISTORY\s+{_IDENT}", s)
    if m:
        hist = st.history(tbl(m.group(1)))
        return spark.createDataFrame(
            [
                (
                    h["version"],
                    h["parent"],
                    h["operation"],
                    float(h["committed_at"]),
                    h["n_files"],
                    h["n_partitions"],
                    json.dumps(h.get("metrics"), sort_keys=True)
                    if h.get("metrics")
                    else None,
                )
                for h in hist
            ],
            "version int, parent int, operation string, committed_at double, "
            "n_files int, n_partitions int, metrics string",
        )

    m = _m(rf"DESCRIBE\s+DETAIL\s+{_IDENT}", s)
    if m:
        t = tbl(m.group(1))
        head = st.current_version(t)
        if head is None:
            raise ValueError(f"{t} does not exist")
        man = st._read_manifest(t, head)
        return _row_df(
            spark,
            {
                "location": t,
                "version": head,
                "n_files": len(man["files"]),
                "partition_cols": man["partition_cols"],
                "properties": man.get("properties") or {},
                "constraints": man.get("constraints") or {},
                "reader_features": sorted(man.get("reader_features") or []),
                "writer_features": sorted(man.get("writer_features") or []),
            },
        )

    # not a management statement: ordinary Spark SQL over the session
    # catalog (snapshot views registered via register_all_tables /
    # register_snapshot_view, temp views, built-in functions, ...)
    return spark.sql(statement)


def _is_snapshot_table(path: str) -> bool:
    d = os.path.join(path, st.SNAPSHOT_DIR)
    if not os.path.isdir(d):
        return False
    return any(re.fullmatch(r"v\d{8}\.json", f) for f in os.listdir(d))


def register_all_tables(
    spark: SparkSession,
    warehouse_root: str,
    global_views: bool = False,
    prefix: str = "",
) -> dict[str, str]:
    """Glue-catalog-style session bootstrap: scan ``warehouse_root``
    for snapshot tables (any direct subdirectory holding a manifest
    log) and register each at its HEAD as a SQL view named after its
    directory — one call and a FRESH session reaches every table by
    name from ``spark.sql``, the durability the reference gets from
    the Glue catalog (README.md:41; Terraform-provisioned database).

    Returns ``{table_name: registered_view_name}``.  Metadata-only:
    one manifest read per table, no data touched.  ``global_views``
    registers ``global_temp`` views (visible to every session of the
    same Spark application — the closest in-process analogue of a
    shared catalog); ``prefix`` namespaces the view names
    (``prefix="gold_"`` → ``gold_ev_sessions``).  Views pin the head
    AT REGISTRATION (snapshot isolation); call again to advance, like
    re-running a query in Delta."""
    if not os.path.isdir(warehouse_root):
        raise ValueError(f"warehouse root {warehouse_root!r} does not exist")
    out: dict[str, str] = {}
    for entry in sorted(os.listdir(warehouse_root)):
        path = os.path.join(warehouse_root, entry)
        if not _is_snapshot_table(path):
            continue
        name = prefix + re.sub(r"\W", "_", entry)
        out[entry] = st.register_snapshot_view(
            spark, path, name, global_view=global_views
        )
    return out
