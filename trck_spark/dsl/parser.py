"""Parser for the trck matching-rule DSL (``.tr`` files).

Produces the same flat JSON IR as the reference front-end
(reference: src/trparser.py) so that the reference's IR-level test fixtures
(test/json/*.json) run through the same back half of the engine:

    {"rules": [{"name", "n", "clauses": [{"attrs", "action", "yield"}],
                "window"?, "after"?, "outer"?}, ...],
     "groupby": {"vars": [...], "values"?: "@arr", "merge_results"?: true}}

Clause actions in the flat IR are ``repeat`` / ``quit`` /
``restart-from-next(N)`` (consume current event, go to rule N) /
``restart-from-here(N)`` (re-examine current event in rule N — used by
``after`` timeout edges).

This is a hand-written indentation-aware lexer + recursive-descent parser
(the reference uses PLY; the grammar is small enough that generator
machinery isn't worth it).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone


class ParseError(Exception):
    pass


RESERVED = {
    "after", "receive", "yield", "quit", "window", "repeat", "in",
    "foreach", "to", "merged", "results", "start_timestamp",
}

_TIME_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}

_TOKEN_RE = re.compile(
    r"""
      (?P<COMMENT>--[^\n]*)
    | (?P<TIMESTAMP>'\d{4}-\d{2}-\d{2}')
    | (?P<TIMEDELTA>\d+[smhd])
    | (?P<NUMBER>\d+)
    | (?P<STRING>"(?:\\"|[^"])*"|'(?:\\'|[^'])*')
    | (?P<ID>[a-zA-Z_][a-zA-Z_0-9]*)
    | (?P<SCALAR>%[a-zA-Z_][a-zA-Z_0-9]*)
    | (?P<HASH>\#[a-zA-Z_][a-zA-Z_0-9]*)
    | (?P<MULTISET>&[a-zA-Z_][a-zA-Z_0-9]*)
    | (?P<HLL>\^[a-zA-Z_][a-zA-Z_0-9]*)
    | (?P<ARRAY>@[a-zA-Z_][a-zA-Z_0-9]*)
    | (?P<SCALAR_RESULT>\$[a-zA-Z_][a-zA-Z_0-9]*)
    | (?P<ARROW>->)
    | (?P<LTE><=)
    | (?P<GTE>>=)
    | (?P<LT><)
    | (?P<GT>>)
    | (?P<EQ>=)
    | (?P<COMMA>,)
    | (?P<WILDCARD>\*)
    | (?P<LBRACKET>\[)
    | (?P<RBRACKET>\])
    | (?P<LPAREN>\()
    | (?P<RPAREN>\))
    | (?P<WS>[ \t]+)
    """,
    re.VERBOSE,
)


class Tok:
    __slots__ = ("type", "value", "line")

    def __init__(self, type_: str, value, line: int):
        self.type = type_
        self.value = value
        self.line = line

    def __repr__(self):
        return f"Tok({self.type},{self.value!r},l{self.line})"


def tokenize(text: str) -> list[Tok]:
    """Lex into a flat token stream with INDENT/DEDENT/NEWLINE synthesis
    (off-side rule, tabs count as 4 spaces)."""
    lines = text.replace("\\\n", " ").split("\n")
    toks: list[Tok] = []
    indent_stack = [0]
    started = False
    for lineno, raw in enumerate(lines, 1):
        line_toks: list[Tok] = []
        pos = 0
        indent_ws = 0
        while pos < len(raw):
            m = _TOKEN_RE.match(raw, pos)
            if not m:
                raise ParseError(
                    f"Lexer error at line {lineno} col {pos}: {raw[pos:pos+20]!r}"
                )
            kind = m.lastgroup
            val = m.group()
            pos = m.end()
            if kind == "COMMENT":
                break
            if kind == "WS":
                if not line_toks:
                    indent_ws = len(val.replace("\t", "    "))
                continue
            if kind == "TIMEDELTA":
                tok = Tok(kind, (int(val[:-1]), val[-1]), lineno)
            elif kind == "NUMBER":
                tok = Tok(kind, int(val), lineno)
            elif kind == "TIMESTAMP":
                dt = datetime.strptime(val.strip("'"), "%Y-%m-%d")
                tok = Tok(
                    kind,
                    int(dt.replace(tzinfo=timezone.utc).timestamp()),
                    lineno,
                )
            elif kind == "STRING":
                tok = Tok(kind, val[1:-1], lineno)
            elif kind == "ID" and val in RESERVED:
                tok = Tok(val.upper(), val, lineno)
            else:
                tok = Tok(kind, val, lineno)
            line_toks.append(tok)
        if not line_toks:
            continue  # blank/comment-only line
        if not started:
            started = True
            indent_stack = [indent_ws]
        else:
            level = indent_ws
            if level == indent_stack[-1]:
                toks.append(Tok("NEWLINE", None, lineno))
            elif level > indent_stack[-1]:
                indent_stack.append(level)
                toks.append(Tok("INDENT", None, lineno))
            else:
                while indent_stack and indent_stack[-1] > level:
                    indent_stack.pop()
                    toks.append(Tok("DEDENT", None, lineno))
                if not indent_stack or indent_stack[-1] != level:
                    raise ParseError(
                        f"Indent level mismatch at line {lineno}"
                    )
        toks.append(line_toks[0])
        toks.extend(line_toks[1:])
    while len(indent_stack) > 1:
        indent_stack.pop()
        toks.append(Tok("DEDENT", None, -1))
    toks.append(Tok("EOF", None, -1))
    return toks


class _Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    @property
    def cur(self) -> Tok:
        return self.toks[self.i]

    def peek(self, k: int = 1) -> Tok:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def eat(self, type_: str) -> Tok:
        t = self.cur
        if t.type != type_:
            raise ParseError(
                f"Syntax error at line {t.line}: expected {type_}, got "
                f"{t.type} {t.value!r}"
            )
        self.i += 1
        return t

    def accept(self, type_: str) -> Tok | None:
        if self.cur.type == type_:
            return self.eat(type_)
        return None

    def skip_newlines(self) -> None:
        while self.cur.type == "NEWLINE":
            self.i += 1

    # --- grammar ---

    def program(self) -> dict:
        self.skip_newlines()
        result: dict = {}
        if self.cur.type == "FOREACH":
            result["groupby"] = self.foreach_expr()
            self.eat("INDENT")
            result["rules"] = self.rules()
            self.eat("DEDENT")
        else:
            result["rules"] = self.rules()
        self.skip_newlines()
        self.eat("EOF")
        return result

    def foreach_expr(self) -> dict:
        self.eat("FOREACH")
        first = self.cur
        if first.type == "SCALAR" and self.peek().type != "IN" and self.peek().type != "COMMA":
            # implicit foreach: values come from the field's distinct values
            var = self.eat("SCALAR").value
            gb = {"vars": [var], "lineno": first.line}
        else:
            gvars = [self.var()]
            while self.accept("COMMA"):
                gvars.append(self.var())
            self.eat("IN")
            gb = {
                "vars": gvars,
                "values": self.eat("ARRAY").value,
                "lineno": first.line,
            }
        if self.accept("MERGED"):
            self.accept("RESULTS")
            gb["merge_results"] = True
        return gb

    def var(self) -> str:
        if self.cur.type in ("SCALAR", "HASH"):
            t = self.cur
            self.i += 1
            return t.value
        raise ParseError(
            f"Syntax error at line {self.cur.line}: expected %var or #var"
        )

    def rules(self) -> list[dict]:
        out = [self.rule()]
        while True:
            self.skip_newlines()
            if self.cur.type == "ID" and self.peek().type == "ARROW":
                out.append(self.rule())
            else:
                break
        return out

    def rule(self) -> dict:
        self.skip_newlines()
        name = self.eat("ID").value
        self.eat("ARROW")
        self.eat("INDENT")
        body = self.rule_body()
        self.eat("DEDENT")
        return {"name": name, **body}

    def rule_body(self) -> dict:
        if self.cur.type == "WINDOW":
            return self.window_stmt()
        return self.receive_stmt()

    def window_stmt(self) -> dict:
        self.eat("WINDOW")
        self.eat("INDENT")
        inner = self.rules()
        self.eat("DEDENT")
        self.skip_newlines()
        self.eat("AFTER")
        n, unit = self.eat("TIMEDELTA").value
        self.eat("ARROW")
        acts = self.actions()
        return {"rules": inner, "after": acts, "window": n * _TIME_UNITS[unit]}

    def receive_stmt(self) -> dict:
        self.eat("RECEIVE")
        self.eat("INDENT")
        clauses = [self.match_clause()]
        while self.accept("NEWLINE"):
            self.skip_newlines()
            if self.cur.type in ("DEDENT", "EOF"):
                break
            clauses.append(self.match_clause())
        self.eat("DEDENT")
        out: dict = {"clauses": clauses}
        self.skip_newlines()
        if self.cur.type == "AFTER":
            self.eat("AFTER")
            if self.cur.type == "TIMEDELTA":
                n, unit = self.eat("TIMEDELTA").value
                out["window"] = n * _TIME_UNITS[unit]
            self.eat("ARROW")
            out["after"] = self.actions()
        return out

    def match_clause(self) -> dict:
        line = self.cur.line
        if self.accept("WILDCARD"):
            attrs: dict = {}
        else:
            attrs = self.conditions()
        self.eat("ARROW")
        acts = self.actions()
        return {"attrs": attrs, "lineno": line, **acts}

    def conditions(self) -> dict:
        conds: list[tuple[str, str]] = [self.condition()]
        while self.accept("COMMA"):
            conds.append(self.condition())
        attrs: dict[str, list[str]] = {}
        for field, expr in sorted(conds):
            attrs.setdefault(field, []).append(expr)
        return attrs

    def condition(self) -> tuple[str, str]:
        field = self.eat("ID").value
        t = self.cur
        if t.type == "EQ":
            self.eat("EQ")
            if self.cur.type == "STRING":
                return field, self.eat("STRING").value
            if self.cur.type == "SCALAR":
                return field, self.eat("SCALAR").value
            raise ParseError(
                f"Syntax error at line {t.line}: expected string or %param "
                f"after '='"
            )
        if t.type == "IN":
            self.eat("IN")
            return field, self.eat("HASH").value
        if t.type in ("LT", "GT", "LTE", "GTE"):
            op = {"LT": "<", "GT": ">", "LTE": "<=", "GTE": ">="}[t.type]
            self.i += 1
            v = self.cur
            if v.type in ("TIMESTAMP", "NUMBER", "SCALAR"):
                self.i += 1
                return field, op + str(v.value)
            raise ParseError(
                f"Syntax error at line {v.line}: bad comparison operand"
            )
        raise ParseError(
            f"Syntax error at line {t.line}: bad condition on field {field!r}"
        )

    def actions(self) -> dict:
        out: dict = {}
        yields = []
        while self.cur.type == "YIELD":
            self.eat("YIELD")
            yields.append(self.yield_var())
            if self.cur.type == "COMMA":
                self.eat("COMMA")
                continue
            break
        if yields:
            out["yield"] = yields
            if self.cur.type in ("ID", "QUIT", "REPEAT"):
                out["action"] = self.transition()
        else:
            out["action"] = self.transition()
        return out

    def yield_var(self) -> dict:
        if self.cur.type == "SCALAR_RESULT":
            return {"dst": self.eat("SCALAR_RESULT").value}
        src = [self.yieldable()]
        while self.cur.type == "COMMA" and self.peek().type in (
            "ID", "START_TIMESTAMP",
        ) and self.peek(2).type != "ARROW":
            # lookahead: "a, b to #s" vs "yield $x, transition"
            save = self.i
            self.eat("COMMA")
            try:
                src.append(self.yieldable())
            except ParseError:
                self.i = save
                break
            if self.cur.type not in ("COMMA", "TO"):
                self.i = save
                break
        self.eat("TO")
        t = self.cur
        if t.type in ("HASH", "MULTISET", "HLL"):
            self.i += 1
            return {"dst": t.value, "src": src}
        raise ParseError(
            f"Syntax error at line {t.line}: expected #set/&multiset/^hll "
            f"after 'to'"
        )

    def yieldable(self) -> dict:
        t = self.cur
        if t.type == "START_TIMESTAMP":
            self.eat("START_TIMESTAMP")
            if self.accept("LBRACKET"):
                ref = self.eat("ID").value
                self.eat("RBRACKET")
                return {"_k": "window_ref", "ref": ref}
            return {"_k": "window_ref"}
        if t.type == "ID":
            if self.peek().type == "LPAREN":
                return self.fcall()
            return {"_k": "field", "name": self.eat("ID").value}
        raise ParseError(
            f"Syntax error at line {t.line}: bad yieldable {t.value!r}"
        )

    def fcall(self) -> dict:
        name = self.eat("ID").value
        self.eat("LPAREN")
        args = [self.arg()]
        while self.accept("COMMA"):
            args.append(self.arg())
        self.eat("RPAREN")
        return {"_k": "fcall", "name": name, "args": args}

    def arg(self) -> dict:
        t = self.cur
        if t.type == "SCALAR":
            self.i += 1
            return {"_k": "param", "name": t.value}
        if t.type == "START_TIMESTAMP":
            self.eat("START_TIMESTAMP")
            self.eat("LBRACKET")
            ref = self.eat("ID").value
            self.eat("RBRACKET")
            return {"_k": "window_ref", "ref": ref}
        if t.type == "ID":
            if self.peek().type == "LPAREN":
                return self.fcall()
            self.i += 1
            return {"_k": "field", "name": t.value}
        if t.type in ("STRING", "NUMBER"):
            self.i += 1
            return {"_k": "literal", "value": t.value}
        raise ParseError(f"Syntax error at line {t.line}: bad fcall arg")

    def transition(self) -> str:
        t = self.cur
        if t.type in ("ID", "QUIT", "REPEAT"):
            self.i += 1
            return t.value
        raise ParseError(
            f"Syntax error at line {t.line}: expected transition, got "
            f"{t.type} {t.value!r}"
        )


# --- lowering: nested window rules -> flat numbered rule list ---

def _assign_numeric_labels(rules: list[dict], n: int = 0) -> int:
    for r in rules:
        r["n"] = n
        n += 1
        if "rules" in r:
            n = _assign_numeric_labels(r["rules"], n)
            r["outer"] = n
    return n


def _flatten_rules(rules: list[dict]):
    for r in rules:
        nested = r.pop("rules", None)
        yield r
        if nested:
            yield from _flatten_rules(nested)


_RESERVED_ACTIONS = ("repeat", "quit")


def _convert_transitions(rules: list[dict]) -> None:
    numeric = {r["name"]: r["n"] for r in rules}
    for r in rules:
        if "after" in r:
            action = r["after"].get("action")
            if action is None:
                r["after"]["action"] = "restart-from-here"
            elif action not in _RESERVED_ACTIONS:
                if action not in numeric:
                    raise ParseError(f"Label not found: {action}")
                r["after"]["action"] = "restart-from-here(%d)" % numeric[action]
        for c in r.get("clauses", []):
            action = c.get("action")
            if action is None:
                if r["n"] >= 1:
                    raise ParseError(
                        "Missing transition in clause of rule %r (consider "
                        "adding repeat)" % r["name"]
                    )
                c["action"] = "repeat"
            elif action not in _RESERVED_ACTIONS:
                if action not in numeric:
                    raise ParseError(f"Label not found: {action}")
                c["action"] = "restart-from-next(%d)" % numeric[action]


def compile_tr(text: str) -> dict:
    """.tr program text -> flat JSON IR (same shape as the reference IR)."""
    p = _Parser(tokenize(text))
    result = p.program()
    _assign_numeric_labels(result["rules"])
    flat = list(_flatten_rules(result["rules"]))
    _convert_transitions(flat)
    out = {"rules": flat}
    if "groupby" in result:
        out["groupby"] = result["groupby"]
    return out
