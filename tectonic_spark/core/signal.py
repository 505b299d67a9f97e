"""Pushdown/control signals returned by Plate consumers.

Semantics match the reference (``core/src/main/scala/tectonic/Signal.scala:21-43``):

* ``CONTINUE``    — keep producing events.
* ``SKIP_COLUMN`` — producer may raw-skip the *current column's* value
  (projection pushdown; honored from nest_map/nest_arr).
* ``SKIP_ROW``    — producer may skip to end of row, still emitting
  finish_row (filter pushdown; the reference declares but never acts on
  this — we DO act on it in our JSON parser).
* ``TERMINATE``   — halt the parse.
* ``BREAK_BATCH`` — consumer asks for an early batch cut (backpressure);
  parser checkpoints and returns a partial result.

``signal_and`` merges two consumers' signals (MultiplexingPlate): equal
signals pass through; SKIP_COLUMN ∧ SKIP_ROW = SKIP_COLUMN (the ordinal-sum
trick: 2 + (−2) = 0); any other disagreement = CONTINUE — i.e. data is
skipped only when *both* consumers skip (truth table:
``test/src/test/scala/tectonic/SignalSpecs.scala:26-93``).
"""

from __future__ import annotations

from enum import IntEnum


class Signal(IntEnum):
    CONTINUE = 1
    SKIP_COLUMN = 2
    SKIP_ROW = -2
    TERMINATE = 3
    BREAK_BATCH = 4


def signal_and(s1: Signal, s2: Signal) -> Signal:
    if s1 == s2:
        return s1
    if s1 + s2 == 0:
        return Signal.SKIP_COLUMN
    return Signal.CONTINUE
