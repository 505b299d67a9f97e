"""Parse results and errors (reference ``ParseResult.scala:135-137``,
``exceptions.scala:24``): Complete | Partial | Failure, and a ParseException
carrying absolute index + line/column."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Generic, TypeVar

A = TypeVar("A")


class ParseException(Exception):
    def __init__(self, message: str, index: int, line: int, col: int):
        super().__init__(f"{message} (line {line}, column {col})")
        self.message = message
        self.index = index
        self.line = line
        self.col = col

    def __repr__(self) -> str:  # pragma: no cover
        return f"ParseException({self.message!r}, {self.index}, {self.line}, {self.col})"


@dataclass
class Complete(Generic[A]):
    """The absorbed input parsed fully; ``value`` is this batch's output."""

    value: A


@dataclass
class Partial(Generic[A]):
    """Consumer signalled BREAK_BATCH: ``value`` is the early-cut batch;
    call ``parser.resume()`` to keep parsing already-absorbed input."""

    value: A


@dataclass
class Failure:
    error: ParseException
