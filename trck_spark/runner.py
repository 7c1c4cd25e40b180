"""Local (Spark-free) query evaluation.

Runs a trck program over in-memory trails — the execution semantics are
identical to the Spark engine's per-group path (the Spark engine calls the
same eval/aggregation code inside applyInPandas); this path exists so the
~46 reference golden fixtures run in milliseconds, and as the single-trail
building block the distributed engine composes.

Trail assembly order replicates the reference: source files ("DBs") are
processed in order; within one file events are timestamp-ordered with
insertion order as tiebreaker; consecutive duplicate events are dropped
per file (reference: src/ctx.c:106-134 — the duplicate check never spans
file boundaries).
"""

from __future__ import annotations

from trck_spark.dsl import compile_tr
from trck_spark.fsm.interpreter import (
    CompiledProgram,
    Results,
    dedup_consecutive,
    eval_trail,
)
from trck_spark.ir import Program
from trck_spark.output import format_output
from trck_spark.params import (
    base_env,
    env_for_tuple,
    foreach_tuples,
    projection_key,
)
from trck_spark.sideinputs import cnf_predicate


def cookie_to_bytes(cookie: str) -> bytes:
    """Fixture cookie string -> 16 raw bytes (reference: bin/json2tdb:36-38
    zero-pads short plain strings; 32-char hex strings decode as hex)."""
    if len(cookie) == 32:
        try:
            return bytes.fromhex(cookie)
        except ValueError:
            pass
    return cookie.encode().ljust(16, b"\0")[:16]


class TrckQuery:
    """A compiled trck program plus parameter/side-input bindings."""

    def __init__(
        self,
        program_text_or_ir,
        params: dict | None = None,
        event_filter: dict | None = None,
        window_set: dict | None = None,
        exclude: set | None = None,
        fn_registry: dict | None = None,
    ):
        if isinstance(program_text_or_ir, str):
            ir = compile_tr(program_text_or_ir)
        else:
            ir = program_text_or_ir
        self.program = Program(ir)
        self.compiled = CompiledProgram(self.program, fn_registry)
        self.fn_registry = fn_registry
        self.params = params or {}
        # TRCK_SPARK_NO_GRID_PRUNE is read at CONSTRUCTION time (driver
        # side); the Spark engine ships it to executors inside spec_json
        # because executor worker processes don't see driver env changes
        import os as _os

        self.no_grid_prune = (
            _os.environ.get("TRCK_SPARK_NO_GRID_PRUNE") == "1"
        )
        self.base_env = base_env(params)
        self.event_filter = event_filter
        self.window_set = window_set  # uuid_hex -> (start, end, id_hex|None)
        self.exclude = exclude or set()

    # ------- per-trail evaluation (shared by local and Spark paths) -------

    def trail_results(
        self,
        events: list,
        cookie: bytes,
        tuples: list[tuple] | None,
        win_start: int = 0,
        win_end: int = 0,
        stats: dict | None = None,
    ) -> dict[int, Results]:
        """events: [(ts, vals)] already filtered/deduped/sorted.

        Returns {tuple_index: Results} with param-grid pruning: tuples
        whose values can't be distinguished by this trail share one FSM run
        (reference: match_traildb.c:596-744).

        ``stats`` (optional dict) accumulates run telemetry in place:
        ``fsm_runs`` = eval_trail invocations ("match calls" in the
        reference's per-DB log, match_traildb.c:854-870), ``grid_shared``
        = trails where one param-independent run served the whole grid
        (the early-break counter).

        TRCK_SPARK_NO_GRID_PRUNE=1 (read when the query is constructed)
        disables BOTH pruning optimizations (the projection-key run
        cache and the param-independence early-break) and evaluates
        every grid tuple with its own FSM run — they are
        correctness-relevant optimizations, and the differential fuzz
        runs each drawn foreach program both ways and asserts identical
        results (VERDICT r06 item 6)."""
        program = self.program
        if stats is None:
            stats = {}
        prune = not self.no_grid_prune
        if tuples is None:
            stats["fsm_runs"] = stats.get("fsm_runs", 0) + 1
            res = eval_trail(
                self.compiled, events, cookie, self.base_env,
                win_start, win_end,
            )
            return {0: res} if not res.is_zero() else {}

        need_fields = {
            program.var_fields[v]
            for v in program.groupby_vars
            if program.var_fields.get(v) not in (None, "timestamp")
        }
        trail_distinct: dict[str, set] = {}
        if need_fields:
            findex = self.compiled.findex
            for f in need_fields:
                idx = findex.get(f)
                if idx is not None:
                    trail_distinct[f] = {e[1][idx] for e in events}
                else:
                    trail_distinct[f] = set()

        out: dict[int, Results] = {}
        cache: dict[tuple, Results] = {}
        # dynamic param-independence (reference GROUPBY_USED,
        # match_traildb.c:596-652): if a run never evaluates a
        # param-dependent predicate, every tuple takes identical branches
        # — one run serves the entire grid.  Param-yield terms disqualify
        # (their output depends on the binding even without predicates).
        can_share = prune and not program.param_yield_vars
        for ti, tup in enumerate(tuples):
            pkey = projection_key(program, tup, trail_distinct)
            res = cache.get(pkey) if prune else None
            if res is None:
                env = env_for_tuple(program, self.base_env, tup)
                env["__used"] = False
                stats["fsm_runs"] = stats.get("fsm_runs", 0) + 1
                res = eval_trail(
                    self.compiled, events, cookie, env, win_start, win_end
                )
                if can_share and ti == 0 and not env["__used"]:
                    stats["grid_shared"] = stats.get("grid_shared", 0) + 1
                    # no param predicate was evaluated; execution up to a
                    # first param evaluation is env-independent, so the
                    # first run's flag decides for the whole grid — one
                    # run serves every tuple
                    if not res.is_zero():
                        return {t: res for t in range(len(tuples))}
                    return {}
                cache[pkey] = res
            if not res.is_zero():
                out[ti] = res
        return out

    # ------- local end-to-end -------

    def run_local(self, trails_dbs: list[dict]) -> dict | list:
        """trails_dbs: list (one per source file) of {cookie: [event...]}
        where event = {"timestamp": int, field: str, ...}.
        Returns trck-shaped JSON (dict, or list for foreach programs).

        The reserved fn_registry entries ``initialize`` / ``finalize``
        run before/after the query, mirroring the reference's weak-symbol
        user hooks around run_query (match_traildb.c:1221-1256)."""
        program = self.program
        fields = self.compiled.fields
        pred = cnf_predicate(self.event_filter)
        hooks = self.fn_registry or {}
        if "initialize" in hooks:
            hooks["initialize"]()

        # assemble trails: cookie -> per-db event lists
        cookies: dict[str, list[list]] = {}
        for db_index, db in enumerate(trails_dbs):
            for cookie, events in db.items():
                per_db = cookies.setdefault(cookie, [[] for _ in trails_dbs])
                for seq, e in enumerate(events):
                    per_db[db_index].append((int(e["timestamp"]), seq, e))

        tuples = foreach_tuples(
            program,
            self.params,
            lexicon_values=self._local_lexicon(trails_dbs)
            if program.implicit_foreach
            else None,
        )

        # evaluation units: without a window file, one per trail; with one,
        # one per window *entry* (same trail may run several times, each
        # with its own window and effective cookie)
        units: list[tuple[str, bytes, int, int, bool]] = []
        if self.window_set is not None:
            hex_to_key = {
                cookie_to_bytes(c).hex(): c for c in cookies
            }
            for uuid_hex, start, end, repl in self.window_set:
                key = hex_to_key.get(uuid_hex)
                if key is None or uuid_hex in self.exclude:
                    continue
                eff = bytes.fromhex(repl) if repl else bytes.fromhex(uuid_hex)
                units.append((key, eff, start, end, True))
        else:
            for c in sorted(cookies):
                if cookie_to_bytes(c).hex() in self.exclude:
                    continue
                units.append((c, cookie_to_bytes(c), 0, 0, False))

        agg: dict[int, Results] = {}
        for cookie, effective_cookie, win_start, win_end, windowed in units:
            events: list = []
            for db_events in cookies[cookie]:
                db_events.sort(key=lambda t: (t[0], t[1]))
                rows = []
                for ts, _seq, e in db_events:
                    if windowed and not (win_start <= ts < win_end):
                        continue
                    if pred is not None and not pred(
                        lambda f, e=e: str(e.get(f, ""))
                    ):
                        continue
                    vals = tuple(str(e.get(f, "")) for f in fields)
                    # keep full event dict identity for dedup parity
                    rows.append((ts, vals, tuple(sorted(
                        (k, str(v)) for k, v in e.items() if k != "timestamp"
                    ))))
                rows = dedup_consecutive(rows)
                events.extend((ts, vals) for ts, vals, _full in rows)
            per_tuple = self.trail_results(
                events, effective_cookie, tuples, win_start, win_end
            )
            for ti, res in per_tuple.items():
                if ti in agg:
                    agg[ti].merge(res)
                else:
                    copy = Results()
                    copy.merge(res)
                    agg[ti] = copy

        out = format_output(program, agg, tuples)
        if "finalize" in hooks:
            hooks["finalize"]()
        return out

    def _local_lexicon(self, trails_dbs: list[dict]) -> list[str]:
        var = self.program.groupby_vars[0]
        field = self.program.var_fields.get(var)
        values: set[str] = set()
        if field is None:
            return []
        for db in trails_dbs:
            for events in db.values():
                for e in events:
                    v = str(e.get(field, ""))
                    if v:
                        values.add(v)
        return sorted(values)


def run_program(
    program_text_or_ir,
    trails_dbs: list[dict],
    params: dict | None = None,
    event_filter: dict | None = None,
    window_set: dict | None = None,
    exclude: set | None = None,
    fn_registry: dict | None = None,
) -> dict | list:
    q = TrckQuery(
        program_text_or_ir,
        params=params,
        event_filter=event_filter,
        window_set=window_set,
        exclude=exclude,
        fn_registry=fn_registry,
    )
    return q.run_local(trails_dbs)
