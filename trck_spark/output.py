"""Result shaping: aggregated monoid values -> trck-shaped JSON objects.

Reference formats (src/results_json.c:233-295):
- non-foreach or ``merged results``: one object
  ``{"$counter": int, "#set": [str...], "&mset": {str: int}, "^hll": hex}``
- foreach: a list with one object per parameter tuple, the tuple's bindings
  included as ``{"%var": "value", "#setvar": [values...]}``; every tuple is
  present even when all-zero (densification: counters 0, sets [], msets {},
  hll "0e00").

Set members are rendered in encoded-tuple byte order (the reference's Judy
iteration order).
"""

from __future__ import annotations

from trck_spark.fsm.hll import EMPTY_HLL_HEX, Hll
from trck_spark.fsm.interpreter import Results
from trck_spark.fsm.tuples import tuple_to_display
from trck_spark.ir import Program


def results_to_dict(program: Program, res: Results | None) -> dict:
    out: dict = {}
    r = res or Results()
    for var in program.yield_counters:
        out[var] = r.counters.get(var, 0)
    for var in program.yield_sets:
        keys = sorted(r.sets.get(var, {}))
        out[var] = [tuple_to_display(k) for k in keys]
    for var in program.yield_multisets:
        d = r.sets.get(var, {})
        out[var] = {tuple_to_display(k): n for k, n in sorted(d.items())}
    for var in program.yield_hlls:
        regs = r.hlls.get(var)
        # hex-backed register maps (engine._HexRegs, the manifest
        # rollup tier) already ARE the wire form — the rebuild below is
        # the identity on them (monoid round-trip, golden-tested)
        hx = getattr(regs, "hex", None)
        if hx is not None:
            out[var] = hx
        elif not regs:
            out[var] = EMPTY_HLL_HEX
        else:
            sketch = Hll()
            for idx, rank in regs.items():
                sketch.set_register(idx, rank)
            out[var] = sketch.to_hex()
    return out


def format_output(
    program: Program,
    per_tuple: dict[int, Results],
    raw_tuples: list[tuple] | None,
) -> dict | list:
    """per_tuple: tuple_index -> merged Results (missing = all-zero).

    raw_tuples: original foreach tuples (strings / lists of strings) for
    binding output; None for non-foreach programs.
    """
    if raw_tuples is None or program.merge_results or not program.groupby:
        merged = Results()
        for r in per_tuple.values():
            merged.merge(r)
        return results_to_dict(program, merged)
    rows = []
    gvars = program.groupby_vars
    for i, tup in enumerate(raw_tuples):
        row = results_to_dict(program, per_tuple.get(i))
        for var, val in zip(gvars, tup):
            row[var] = list(val) if isinstance(val, (list, tuple, frozenset)) else val
        rows.append(row)
    return rows
