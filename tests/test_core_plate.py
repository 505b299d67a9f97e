"""L1 event-model tests: Signal truth table (SignalSpecs.scala:26-93
parity), plate combinator conformance, reify/replay round-trip."""

from __future__ import annotations

import pytest

from tectonic_spark.core import (
    DelegatingPlate,
    MultiplexingPlate,
    NullPlate,
    Plate,
    ReifiedPlate,
    RowCountPlate,
    Signal,
    replay,
    signal_and,
)

C, SC, SR, T, BB = (
    Signal.CONTINUE,
    Signal.SKIP_COLUMN,
    Signal.SKIP_ROW,
    Signal.TERMINATE,
    Signal.BREAK_BATCH,
)


@pytest.mark.parametrize(
    ("s1", "s2", "expected"),
    [
        (C, C, C), (C, SC, C), (C, SR, C), (C, T, C),
        (SC, C, C), (SC, SC, SC), (SC, SR, SC), (SC, T, C),
        (SR, C, C), (SR, SC, SC), (SR, SR, SR), (SR, T, C),
        (T, C, C), (T, SC, C), (T, SR, C), (T, T, T),
        (BB, BB, BB), (BB, C, C), (C, BB, C), (BB, SC, C),
    ],
)
def test_signal_and_truth_table(s1, s2, expected):
    assert signal_and(s1, s2) == expected


SAMPLE_EVENTS = [
    ("nest_map", "a"),
    ("num", "123", -1, -1),
    ("unnest",),
    ("nest_map", "b"),
    ("fls",),
    ("unnest",),
    ("finish_row",),
    ("nest_arr",),
    ("str", "hi"),
    ("unnest",),
    ("nest_arr",),
    ("num", "3.14", 1, -1),
    ("unnest",),
    ("finish_row",),
    ("map",),
    ("finish_row",),
    ("skipped", 7),
]


def test_reify_replay_round_trip():
    p1 = ReifiedPlate()
    replay(SAMPLE_EVENTS, p1)
    out = p1.finish_batch(True)
    assert out == SAMPLE_EVENTS


def test_reified_batches_are_disjoint():
    p = ReifiedPlate()
    p.nul()
    first = p.finish_batch(False)
    p.tru()
    second = p.finish_batch(True)
    assert first == [("nul",)]
    assert second == [("tru",)]


def test_row_count_plate():
    p = RowCountPlate()
    replay(SAMPLE_EVENTS, p)
    assert p.finish_batch(False) == 3
    assert p.finish_batch(True) == 0  # counter resets per batch


def test_delegating_plate_is_identity():
    inner = ReifiedPlate()
    wrapped = DelegatingPlate(inner)
    replay(SAMPLE_EVENTS, wrapped)
    assert wrapped.finish_batch(True) == SAMPLE_EVENTS


class _SkipAll(Plate[None]):
    def nest_map(self, key):
        return Signal.SKIP_COLUMN

    def str(self, s):
        return Signal.SKIP_ROW

    def finish_batch(self, terminal):
        return None


def test_multiplexing_merges_signals_and_tees():
    main = ReifiedPlate()
    side = _SkipAll()
    mux = MultiplexingPlate(main, side)
    # main says CONTINUE, side says SKIP_COLUMN → merged CONTINUE
    assert mux.nest_map("a") == Signal.CONTINUE
    assert mux.str("x") == Signal.CONTINUE
    mux.finish_row()
    assert mux.finish_batch(True) == [("nest_map", "a"), ("str", "x"), ("finish_row",)]


class _SkipColumnPlate(Plate[None]):
    def nest_map(self, key):
        return Signal.SKIP_COLUMN

    def finish_batch(self, terminal):
        return None


def test_multiplexing_skips_only_when_both_skip():
    mux = MultiplexingPlate(_SkipColumnPlate(), _SkipAll())
    assert mux.nest_map("a") == Signal.SKIP_COLUMN


def test_null_plate():
    p = NullPlate()
    replay(SAMPLE_EVENTS, p)
    assert p.finish_batch(True) is None
