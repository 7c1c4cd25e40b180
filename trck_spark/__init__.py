"""trck_spark — a PySpark-native analytics engine with traildb/trck query
capabilities.

A trck query is a finite state machine evaluated independently over each
user's timestamp-ordered event trail, producing monoid aggregates (counters,
sets, multisets, HyperLogLog sketches).  This package re-expresses that model
Spark-first:

    events DataFrame
      -> Catalyst filters (CNF pre-scan filter, window/exclude side inputs)
      -> groupBy(uuid) + in-group timestamp sort        (one shuffle)
      -> per-trail FSM evaluation x parameter grid      (applyInPandas)
      -> partial monoid rows                            (tiny per trail)
      -> Spark partial/final aggregation                (sum / max)
      -> densified per-parameter-tuple results

Reference semantics: /root/reference (traildb/trck).  Behavior was derived
from the reference's documentation, generated-code semantics and golden test
fixtures; no reference code is reused.
"""

__version__ = "0.1.0"
