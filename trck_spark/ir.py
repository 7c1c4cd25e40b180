"""IR model for compiled trck programs.

The flat JSON IR (produced by trck_spark.dsl.compile_tr, or supplied directly
— the reference accepts the same IR as ``prog.json``) is wrapped in a
``Program`` that precomputes everything the evaluator needs:

- static window nesting (which ``window`` rules each rule sits inside)
- yield variable inventory per monoid kind
- fields/values referenced (for column pruning and pre-binding)
- parameter "typing": a param compared against field F is of type F
  (reference: src/fsm2c.py:530-594 preprocess, README.md:244-246)

Action strings are parsed once into (kind, target) pairs.
"""

from __future__ import annotations

import re

EXPIRES_NEVER = 2**64 - 1
MAX_TIMESTAMP = 2**64 - 2  # finalization sentinel (reference: match_traildb.c:45)

# action kinds
A_REPEAT = 0
A_QUIT = 1
A_NEXT = 2  # restart-from-next(n): consume event, continue in rule n
A_HERE = 3  # restart-from-here(n): re-examine current event in rule n
A_BREAK = 4  # fall to next rule, consuming event (JSON IR only)

_ACTION_RE = re.compile(
    r"(?P<type>(restart-from-(here|next|start))|break|repeat|stop|quit)"
    r"(\((?P<label>\w+)\))?"
)


class IRError(Exception):
    pass


def parse_action(s: str | None) -> tuple[int, int | None]:
    if s is None:
        s = "restart-from-here"
    m = _ACTION_RE.match(s)
    if not m:
        raise IRError(f"Unknown action: {s}")
    t = m.group("type")
    label = m.group("label")
    label_i = int(label) if label is not None else None
    if t == "repeat":
        return A_REPEAT, None
    if t in ("quit", "stop"):
        return A_QUIT, None
    if t == "restart-from-next":
        return A_NEXT, label_i if label_i is not None else 0
    if t == "restart-from-here":
        return A_HERE, label_i if label_i is not None else 0
    if t == "break":
        return A_BREAK, None
    raise IRError(f"Unsupported action: {s}")


def var_kind(name: str) -> str:
    c = name[0]
    if c == "$":
        return "counter"
    if c == "#":
        return "set"
    if c == "&":
        return "multiset"
    if c == "^":
        return "hll"
    if c == "%":
        return "scalar"
    if c == "@":
        return "array"
    raise IRError(f"Bad variable name: {name}")


def is_param(expr: str) -> bool:
    return bool(expr) and expr[0] in "#&%$@"


class Program:
    """Preprocessed trck program."""

    def __init__(self, ir: dict):
        self.ir = ir
        self.rules: list[dict] = ir["rules"]
        self.groupby: dict | None = ir.get("groupby")

        self.window_rule_ids: list[int] = []
        self.rule_windows: dict[int, list[int]] = {}
        self.yield_counters: list[str] = []
        self.yield_sets: list[str] = []
        self.yield_multisets: list[str] = []
        self.yield_hlls: list[str] = []
        self.external_functions: list[tuple[str, int]] = []
        self.kvs: dict[str, set[str]] = {}
        self.var_fields: dict[str, str] = {}
        self.param_yield_vars: set[str] = set()
        self.vars: list[str] = []
        self.entrypoint_id = 0
        self._by_name: dict[str, int] = {}
        self._preprocess()

    # -- derived info --

    def rule_name(self, ri: int) -> str:
        return self.rules[ri].get("name", str(ri))

    def rule_id(self, name: str) -> int:
        if name not in self._by_name:
            raise IRError(f"Rule not found: {name}")
        return self._by_name[name]

    def window_duration(self, ri: int) -> int | None:
        return self.rules[ri].get("window")

    def window_stack_pos(self, ri: int, window_ri: int) -> int:
        for i, wi in enumerate(self.rule_windows[ri]):
            if wi == window_ri:
                return i
        raise IRError(
            "No enclosing window block named %s for rule %s"
            % (self.rule_name(window_ri), self.rule_name(ri))
        )

    @property
    def merge_results(self) -> bool:
        return bool(self.groupby and self.groupby.get("merge_results"))

    @property
    def groupby_vars(self) -> list[str]:
        return list(self.groupby.get("vars", [])) if self.groupby else []

    @property
    def implicit_foreach(self) -> bool:
        return bool(self.groupby) and "values" not in self.groupby

    def all_yield_vars(self) -> list[str]:
        return (
            self.yield_counters
            + self.yield_sets
            + self.yield_multisets
            + self.yield_hlls
        )

    # -- preprocessing --

    def _add_yield_vars(self, ylist: list[dict]) -> None:
        for y in ylist:
            dst = y["dst"]
            kind = var_kind(dst)
            target = {
                "counter": self.yield_counters,
                "set": self.yield_sets,
                "multiset": self.yield_multisets,
                "hll": self.yield_hlls,
            }.get(kind)
            if target is None:
                raise IRError(f"Bad yield destination: {dst}")
            if dst not in target:
                target.append(dst)
            for term in y.get("src", []):
                self._walk_yield_term(term)

    def _walk_yield_term(self, term: dict) -> None:
        k = term.get("_k")
        if k == "field":
            name = term["name"]
            if name not in (
                "cookie",
                "timestamp",
                "cookie_timestamp_filter_start",
                "cookie_timestamp_filter_end",
            ):
                self.kvs.setdefault(name, set())
        elif k == "param":
            self.param_yield_vars.add(term["name"])
        elif k == "fcall":
            self.external_functions.append(
                (term["name"], len(term["args"]))
            )
            for a in term["args"]:
                self._walk_yield_term(a)

    def _preprocess(self) -> None:
        # window nesting from 'outer' back-pointers (reference preprocess):
        # a rule with 'outer' = N is a window block covering rules up to N-1
        window_stack: list[int] = []
        ends: list[int] = []
        i = 0
        for i, r in enumerate(self.rules):
            while ends and ends[-1] <= i:
                window_stack.pop()
                ends.pop()
            self.rule_windows[i] = window_stack[:]
            if r.get("outer"):
                self.window_rule_ids.append(i)
                window_stack.append(i)
                ends.append(r["outer"])

        cond_vars: set[str] = set()
        for ri, r in enumerate(self.rules):
            self._by_name[self.rule_name(ri)] = ri
            if r.get("entrypoint"):
                self.entrypoint_id = ri
            for c in r.get("clauses", []):
                if "yield" in c:
                    self._add_yield_vars(c["yield"])
                for field, conditions in c.get("attrs", {}).items():
                    for expr in conditions:
                        bare = expr.lstrip("<=>")
                        if field != "timestamp":
                            self.kvs.setdefault(field, set())
                        if is_param(bare):
                            cond_vars.add(bare)
                            self.var_fields[bare] = field
                        elif field != "timestamp":
                            self.kvs[field].add(bare)
            if "after" in r and "yield" in r["after"]:
                self._add_yield_vars(r["after"]["yield"])

        self.vars = sorted(cond_vars | set(self.groupby_vars))
        self.has_window_rules = bool(self.window_rule_ids)

        # parse actions once
        for ri, r in enumerate(self.rules):
            for c in r.get("clauses", []):
                c["_action"] = parse_action(c.get("action"))
            if "after" in r:
                r["after"]["_action"] = parse_action(
                    r["after"].get("action")
                )
            else:
                r["_default_after"] = (A_HERE, 0)

        self._validate()

    def _validate(self) -> None:
        for ri, r in enumerate(self.rules):
            for c in list(r.get("clauses", [])) + (
                [r["after"]] if "after" in r else []
            ):
                kind, target = c["_action"]
                if kind in (A_NEXT, A_HERE) and target is not None:
                    if not (0 <= target < len(self.rules)):
                        raise IRError(
                            f"Transition target out of range: {target}"
                        )
                    # inner -> outer jumps legal; outer -> inner illegal
                    src_w = self.rule_windows[ri]
                    dst_w = self.rule_windows[target]
                    if len(src_w) < len(dst_w) or src_w[: len(dst_w)] != dst_w:
                        raise IRError(
                            "Invalid transition: jumping between unrelated "
                            "window blocks %s->%s"
                            % (self.rule_name(ri), self.rule_name(target))
                        )

    def fields_used(self) -> list[str]:
        """Event field columns the program reads (for column pruning)."""
        return sorted(self.kvs.keys())
