"""Model-based trail generation for trck programs.

The reference ships `trick` (trick/trick.py:1-371), a combinatorial
test-case generator: a spec describes the event sequence a machine is
supposed to match as alternating event templates and time gaps, and the
tool expands it into trails that probe the machine from every side —
the full grid of gap durations, versions where selected events are
replaced by near-misses (one field mutated away from its bound value),
and near-miss filler events inside the gaps that must never match.

This is that idea rebuilt for the Spark engine's test harness: the
generator is engine-agnostic (it emits plain trail dicts + param
bindings), and `tests/test_trick.py` drives the generated corpus
differentially through the FSM interpreter, the generated matcher, and
the distributed engine.

Spec vocabulary:

    ev({"event_type": "view"})          an event the machine matches
    ev({"t": "%p"}, must_change=["t"])  param-bound field; near-misses
                                        must mutate a listed field
    between(0, 3600, steps=4)           time-gap grid between events

Expansion (generate):
    - one trail per (gap-grid point x negativity mask); mask bit i set
      => event step i is emitted as a near-miss instead of a match
    - `fillers` near-miss events are spread through every non-zero gap
      (they must not advance the machine)
    - %param fields bind to a fresh value per trail; the binding is
      returned with the trail
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import product

MINUTE = 60
HOUR = 60 * MINUTE
DAY = 24 * HOUR


@dataclass(frozen=True)
class EventStep:
    fields: dict
    must_change: tuple = ()


@dataclass(frozen=True)
class GapStep:
    lo: int
    hi: int
    steps: int = 4

    def grid(self) -> list[int]:
        if self.steps <= 1 or self.hi <= self.lo:
            return [self.lo]
        span = self.hi - self.lo
        return [
            self.lo + (span * k) // self.steps for k in range(self.steps)
        ]


def ev(fields: dict, must_change=()) -> EventStep:
    return EventStep(dict(fields), tuple(must_change))


def between(lo: int, hi: int, steps: int = 4) -> GapStep:
    return GapStep(lo, hi, steps)


@dataclass
class Case:
    """One generated trail: `trail` is a list of event dicts (with
    `timestamp`), `params` the %-bindings used, `mask` which event steps
    were negated (0 = all positive), `gaps` the gap values chosen."""

    trail: list
    params: dict
    mask: int
    gaps: tuple
    _counter: int = field(default=0, repr=False)


def _bound_values(spec) -> dict:
    out: dict[str, set] = {}
    for step in spec:
        if isinstance(step, EventStep):
            for k, v in step.fields.items():
                if not v.startswith("%"):
                    out.setdefault(k, set()).add(v)
    return out


def _near_miss(step: EventStep, ts: int, binding: dict, bound: dict,
               case: Case, adversarial: bool) -> dict:
    """An event that looks like `step` but must NOT match it: one field
    (preferring must_change) is mutated.

    adversarial=True mutates to a DIFFERENT bound value when one exists
    (reference trick `negate` behavior) — such events can legitimately
    match *other* steps of the machine, so results have no simple closed
    form; use for differential comparisons.  adversarial=False mutates
    to a fresh out-of-vocabulary value, guaranteed to match no literal
    clause — closed-form expectations hold."""
    e = _positive(step, ts, binding)
    flds = list(step.must_change) if step.must_change else [
        k for k in step.fields
    ]
    f = flds[case._counter % len(flds)]
    case._counter += 1
    cur = e[f]
    others = sorted(bound.get(f, set()) - {cur}) if adversarial else []
    e[f] = (
        others[case._counter % len(others)]
        if others
        else f"{cur}_X{case._counter}"
    )
    return e


def _positive(step: EventStep, ts: int, binding: dict) -> dict:
    e = {"timestamp": ts}
    for k, v in step.fields.items():
        e[k] = binding[v] if v.startswith("%") else v
    return e


def generate(spec, negatives: bool = True, fillers: int = 2,
             adversarial: bool = False) -> list[Case]:
    """Expand a spec into its combinatorial trail corpus."""
    events = [s for s in spec if isinstance(s, EventStep)]
    gaps = [s for s in spec if isinstance(s, GapStep)]
    bound = _bound_values(spec)
    param_names = sorted(
        {
            v
            for s in events
            for v in s.fields.values()
            if v.startswith("%")
        }
    )
    masks = range(1 << len(events)) if negatives else (0,)

    cases: list[Case] = []
    trail_no = 0
    for mask in masks:
        for gap_choice in product(*[g.grid() for g in gaps]):
            binding = {
                p: f"{p[1:]}{trail_no}" for p in param_names
            }
            case = Case([], binding, mask, tuple(gap_choice))
            trail_no += 1
            t = 0
            gi = 0
            eidx = 0
            for step in spec:
                if isinstance(step, GapStep):
                    dt = gap_choice[gi]
                    gi += 1
                    # near-miss fillers inside the gap: never at the
                    # endpoints (t and t+dt belong to real steps)
                    for k in range(fillers):
                        ft = t + (dt * (k + 1)) // (fillers + 1)
                        if t < ft < t + dt:
                            case.trail.append(
                                _near_miss(
                                    events[min(eidx, len(events) - 1)],
                                    ft, binding, bound, case, adversarial,
                                )
                            )
                    t += dt
                else:
                    if (mask >> eidx) & 1:
                        case.trail.append(
                            _near_miss(
                                step, t, binding, bound, case, adversarial
                            )
                        )
                    else:
                        case.trail.append(_positive(step, t, binding))
                    eidx += 1
            cases.append(case)
    return cases
