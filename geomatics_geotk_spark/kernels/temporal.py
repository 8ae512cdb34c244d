"""ISO 19108 temporal kernels, vectorized (numpy datetime64).

Re-expresses the reference's temporal machinery:

- the 13 interval relations between Instant/Period
  (``TemporalUtils.java:36-66``; ISO 19108 RelativePosition) — here as
  vectorized boolean masks over (begin, end) arrays where an *instant* is a
  degenerate period with begin == end (end NULL in table form);
- ``temporalExtent`` — min begin / max end over a set, padded ±1 hour
  (``TemporalUtils.java:97-125``);
- ``add`` — instant ± amount·unit (``TemporalUtils.java:134-140``);
- ``splitInterval`` — period → n contiguous equal sub-periods, each MEETS
  the next (``TemporalUtils.java:150-164``);
- ``TemporalComparator`` total order (``time/TemporalComparator.java:13-40``).

The Spark operator layer expresses the same relations as Column
expressions (built-in, JVM-side); these kernels are the single source of
truth for semantics and feed the kernel unit tests.
"""

from __future__ import annotations

import numpy as np

HOUR = np.timedelta64(1, "h")

# Relation names follow ISO 19108 / TemporalUtils.java:36-51.
RELATIONS = (
    "Before", "After", "Begins", "Ends", "During", "Equals", "Contains",
    "Overlaps", "Meets", "OverlappedBy", "MetBy", "BegunBy", "EndedBy",
)


def _norm(begin, end):
    b = np.asarray(begin, dtype="datetime64[us]")
    e = np.asarray(end, dtype="datetime64[us]")
    e = np.where(np.isnat(e), b, e)  # instant = degenerate period
    return b, e


def relation_mask(rel: str, b1, e1, b2, e2):
    """Vectorized boolean mask: does (b1,e1) stand in ``rel`` to (b2,e2)?

    Allen-style semantics matching ISO 19108 as dispatched by
    ``TemporalUtils.assertTemporalRelation`` (``TemporalUtils.java:57-66``).
    """
    b1, e1 = _norm(b1, e1)
    b2, e2 = _norm(b2, e2)
    if rel == "Before":
        return e1 < b2
    if rel == "After":
        return b1 > e2
    if rel == "Meets":
        return e1 == b2
    if rel == "MetBy":
        return b1 == e2
    if rel == "Begins":
        return (b1 == b2) & (e1 < e2)
    if rel == "BegunBy":
        return (b1 == b2) & (e1 > e2)
    if rel == "Ends":
        return (e1 == e2) & (b1 > b2)
    if rel == "EndedBy":
        return (e1 == e2) & (b1 < b2)
    if rel == "During":
        return (b1 > b2) & (e1 < e2)
    if rel == "Contains":
        return (b1 < b2) & (e1 > e2)
    if rel == "Equals":
        return (b1 == b2) & (e1 == e2)
    if rel == "Overlaps":
        return (b1 < b2) & (e1 > b2) & (e1 < e2)
    if rel == "OverlappedBy":
        return (b1 > b2) & (b1 < e2) & (e1 > e2)
    raise ValueError(f"Unknown temporal relation: {rel}")


def temporal_extent(begins, ends):
    """min(begin) − 1h, max(end) + 1h over a collection.

    Ref: ``TemporalUtils.java:97-125``.  The reference's TreeSet discards
    DURING/EQUALS members (comparator returns 0,
    ``TemporalComparator.java:13-40``), but a discarded member never
    extends the extent, so plain min/max reproduces the output exactly.
    """
    b, e = _norm(begins, ends)
    return b.min() - HOUR, e.max() + HOUR


def add(instant, amount: int, unit: str):
    """instant ± amount·unit.  Ref: ``TemporalUtils.java:134-140``."""
    code = {"hours": "h", "minutes": "m", "seconds": "s", "days": "D"}[unit]
    return np.asarray(instant, dtype="datetime64[us]") + np.timedelta64(amount, code)


def split_interval(begin, end, n: int):
    """Period → n contiguous equal sub-periods (each MEETS the next).

    Ref: ``TemporalUtils.java:150-164``.  Returns list of (begin, end).
    """
    b = np.datetime64(begin, "us")
    e = np.datetime64(end, "us")
    step = (e - b) / n
    cuts = [b + step * i for i in range(n)] + [e]
    return [(cuts[i], cuts[i + 1]) for i in range(n)]


def comparator_key(begin, end):
    """Sort key reproducing ``TemporalComparator`` order (begin, then end).

    The reference comparator returns 0 for DURING/EQUALS (making TreeSet
    discard them) and orders the rest by begin; sorting by (begin, end)
    yields the same sequence for retained elements.
    """
    b, e = _norm(begin, end)
    return np.lexsort((e, b))
