"""Event-table I/O utilities.

Spark-first analogs of the reference's tooling:
- ``trails_json_to_df``: bin/json2tdb — fixture trails -> events DataFrame
- ``df_to_trails_json``: bin/tdb2json — events DataFrame -> trails dict
- ``extract_trail``: src/gettrail.c — one uuid's merged, ordered trail
"""

from __future__ import annotations

from trck_spark.runner import cookie_to_bytes

RESERVED = {"timestamp"}


def trails_json_to_df(spark, trails_dbs: list[dict]):
    """[{cookie: [event...]}, ...] (one dict per source file) -> DataFrame
    (uuid, db, seq, timestamp, <dynamic string fields...>).

    uuids are stored in 32-hex cookie form.
    """
    from pyspark.sql import functions as F

    all_fields = sorted(
        {
            k
            for db in trails_dbs
            for evs in db.values()
            for e in evs
            for k in e
            if k not in RESERVED
        }
    )
    rows = []
    for db_index, db in enumerate(trails_dbs):
        for cookie, events in db.items():
            uuid_hex = cookie_to_bytes(cookie).hex()
            for seq, e in enumerate(events):
                rows.append(
                    (uuid_hex, db_index, seq, int(e["timestamp"]))
                    + tuple(
                        str(e[f]) if f in e else None for f in all_fields
                    )
                )
    schema = "uuid string, db int, seq long, timestamp long" + "".join(
        f", `{f}` string" for f in all_fields
    )
    df = spark.createDataFrame(rows, schema)
    del F
    return df


def df_to_trails_json(
    df,
    uuid_col: str = "uuid",
    ts_col: str = "timestamp",
    field_cols: list[str] | None = None,
) -> dict:
    """Collect a (small) events DataFrame back into the fixture trail
    format {cookie_hex: [event...]} — the tdb2json analog."""
    from pyspark.sql import functions as F

    if field_cols is None:
        field_cols = [
            c for c in df.columns if c not in (uuid_col, ts_col, "db", "seq")
        ]
    order = [ts_col] + (["seq"] if "seq" in df.columns else [])
    out: dict = {}
    for row in df.orderBy(uuid_col, *order).collect():
        e = {"timestamp": int(row[ts_col])}
        for f in field_cols:
            v = row[f]
            if v is not None:
                e[f] = v
        out.setdefault(row[uuid_col], []).append(e)
    del F
    return out


def extract_trail(
    df,
    uuid: str,
    uuid_col: str = "uuid",
    ts_col: str = "timestamp",
) -> list[dict]:
    """One uuid's merged trail, timestamp-ordered — the gettrail analog.
    Accepts either the raw uuid value or its 32-hex cookie form."""
    from pyspark.sql import functions as F

    hex_form = cookie_to_bytes(uuid).hex()
    sub = df.filter(
        (F.col(uuid_col) == uuid) | (F.col(uuid_col) == hex_form)
    )
    trails = df_to_trails_json(sub, uuid_col=uuid_col, ts_col=ts_col)
    merged: list[dict] = []
    for evs in trails.values():
        merged.extend(evs)
    merged.sort(key=lambda e: e["timestamp"])
    return merged
