"""Parameter binding: params JSON -> base environment + foreach tuple grid.

Reference semantics (README.md:231-292, src/match_traildb.c:86-159,
955-1065): scalar params ``%x`` bind a string, set params ``#x`` bind a
set of strings, ``@arr`` binds the foreach grid — a list of tuples whose
items are strings (for ``%`` vars) or lists of strings (for ``#`` vars).
An implicit foreach (``foreach %x`` with no array) ranges over the union
of the bound field's distinct values in the data, with the empty string
prepended (reference: match_traildb.c:184-236 get_lexicon).
"""

from __future__ import annotations

from trck_spark.ir import IRError, Program


def base_env(params: dict | None) -> dict:
    """Free (non-foreach) parameters -> environment entries."""
    env: dict = {}
    if not params:
        return env
    for k, v in params.items():
        if k.startswith("%"):
            env[k] = str(v)
        elif k.startswith("#"):
            env[k] = frozenset(str(x) for x in v)
    return env


def foreach_tuples(
    program: Program,
    params: dict | None,
    lexicon_values: list[str] | None = None,
) -> list[tuple] | None:
    """The foreach grid as a list of value tuples (aligned to
    program.groupby_vars), or None for non-foreach programs.

    lexicon_values: distinct field values for implicit foreach (the engine
    computes them from the data with ``select(field).distinct()``).
    """
    gb = program.groupby
    if not gb:
        return None
    gvars = program.groupby_vars
    if "values" in gb:
        arr_name = gb["values"]
        if not params or arr_name not in params:
            raise IRError(f"Parameter not set: {arr_name}")
        tuples = []
        for row in params[arr_name]:
            if len(gvars) == 1 and not isinstance(row, list):
                row = [row]
            if len(row) != len(gvars):
                raise IRError(
                    f"foreach tuple arity mismatch: {row!r} vs {gvars}"
                )
            items = []
            for var, item in zip(gvars, row):
                if var.startswith("#"):
                    if not isinstance(item, list):
                        raise IRError(
                            f"set-valued foreach var {var} needs a list, "
                            f"got {item!r}"
                        )
                    # ordered tuple (hashable); env binding converts to set
                    items.append(tuple(str(x) for x in item))
                else:
                    items.append(str(item))
            tuples.append(tuple(items))
        return tuples
    # implicit foreach: empty string first, then the data's distinct values
    if lexicon_values is None:
        raise IRError("implicit foreach requires lexicon_values")
    vals = sorted({v for v in lexicon_values if v != ""})
    return [("",)] + [(v,) for v in vals]


def env_for_tuple(
    program: Program, base: dict, values: tuple | None
) -> dict:
    env = dict(base)
    if values is not None:
        for var, val in zip(program.groupby_vars, values):
            env[var] = frozenset(val) if isinstance(val, tuple) else val
    return env


def projection_key(
    program: Program,
    values: tuple,
    trail_distinct: dict[str, set],
) -> tuple:
    """Collapse a foreach tuple onto the values that can influence this
    trail (reference idea: match_traildb.c:653-744 distinct-value
    memoization — per trail, only param values that occur in the trail can
    produce distinct outcomes).

    Values of vars bound to field F are kept verbatim iff they occur in the
    trail's distinct value set for F; all non-occurring values collapse to
    one sentinel.  Timestamp-typed vars, unbound vars and vars yielded as
    fcall args never collapse.
    """
    key = []
    for var, val in zip(program.groupby_vars, values):
        field = program.var_fields.get(var)
        if (
            field is None
            or field == "timestamp"
            or var in program.param_yield_vars
        ):
            key.append(("v", val))
            continue
        occurring = trail_distinct.get(field, ())
        if isinstance(val, (tuple, frozenset)):
            key.append(("s", frozenset(v for v in val if v in occurring)))
        elif val in occurring:
            key.append(("v", val))
        else:
            key.append(("absent",))
    return tuple(key)
