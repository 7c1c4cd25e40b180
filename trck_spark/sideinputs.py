"""Side inputs: pre-scan CNF event filter, per-uuid time windows, uuid
exclude lists.

Reference semantics:
- filter (src/traildb_filter.c:9-103): JSON ``{"clauses": [[{field, value,
  op: equal|notequal}, ...], ...]}`` — outer list AND, inner list OR,
  missing field compares as "".
- window file (src/window_set.c:30-127, src/ctx.c:39-64): CSV
  ``uuid_hex,start,end[,id_hex]`` — keep events ``start <= ts < end`` for
  listed uuids, *skip trails not listed*; when the 4th column is present it
  replaces the cookie for output purposes.
- exclude file (src/exclude_set.c): one uuid hex per line; listed trails
  are skipped.

Each has a row-level form (used by the local fixture runner and the
applyInPandas worker) and a Catalyst form (used by the Spark engine so the
predicate pushes down to the parquet scan).
"""

from __future__ import annotations


def cnf_predicate(filter_spec: dict | None):
    """-> callable(get_value: field -> str) -> bool, or None."""
    if not filter_spec or not filter_spec.get("clauses"):
        return None
    clauses = [
        [
            (t["field"], str(t["value"]), t.get("op", "equal"))
            for t in clause
        ]
        for clause in filter_spec["clauses"]
    ]

    def pred(get_value) -> bool:
        for clause in clauses:
            ok = False
            for field, value, op in clause:
                v = get_value(field)
                hit = (v == value) if op == "equal" else (v != value)
                if hit:
                    ok = True
                    break
            if not ok:
                return False
        return True

    return pred


def cnf_to_spark_condition(filter_spec: dict | None, df_columns: list[str]):
    """CNF -> a Catalyst Column (push-down friendly), or None.

    Missing fields (not in df_columns, or NULL) compare as "".
    """
    if not filter_spec or not filter_spec.get("clauses"):
        return None
    from pyspark.sql import functions as F

    cond = None
    for clause in filter_spec["clauses"]:
        inner = None
        for t in clause:
            field, value, op = t["field"], str(t["value"]), t.get("op", "equal")
            if field in df_columns:
                col = F.col(field)
                # NULL reads as "": express with null-safe predicates that
                # still push down to the parquet scan (EqualNullSafe /
                # Or(Not(EqualTo), IsNull)), unlike a coalesce() wrapper
                if value == "":
                    eq = col.isNull() | (col == "")
                else:
                    eq = col.eqNullSafe(F.lit(value))
                term = eq if op == "equal" else ~eq
            else:
                # referenced field absent from the schema: constant ""
                hit = value == ""
                term = F.lit(hit if op == "equal" else not hit)
            inner = term if inner is None else (inner | term)
        cond = inner if cond is None else (cond & inner)
    return cond


def parse_window_csv(text: str) -> list[tuple[str, int, int, str | None]]:
    """-> [(uuid_hex, start, end, replacement_id_hex or None), ...].

    A list, not a map: with the 4th id column the same uuid may appear on
    several lines, and each line is an *independent evaluation* of that
    trail with its own window and effective cookie (reference:
    match_traildb.c:521-549 iterates window entries, not trails)."""
    out: list[tuple[str, int, int, str | None]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        parts = line.split(",")
        uuid_hex = parts[0].strip().lower()
        start = int(parts[1])
        end = int(parts[2])
        repl = parts[3].strip().lower() if len(parts) > 3 else None
        out.append((uuid_hex, start, end, repl))
    return out


def parse_exclude(text: str) -> set[str]:
    return {
        line.strip().lower()
        for line in text.splitlines()
        if line.strip()
    }
