"""L1: pure-Python columnar parser core — NO Spark imports anywhere in this
package (mirrors the reference's ``core/`` module boundary; the Spark
binding lives in :mod:`tectonic_spark.sources`).

The unit of data is a columnar *event stream* over rows (SURVEY.md §1.1):
a producer (parser) drives a consumer (:class:`Plate`) with scalar events
(nul/fls/tru/map/arr/num/str), nesting events (nest_map/nest_arr/nest_meta/
unnest), and row/batch boundaries (finish_row/finish_batch). Consumers
return a :class:`Signal` from each event to push projection/filter decisions
*into the parse* (Mison-style byte skipping).
"""

from tectonic_spark.core.signal import Signal, signal_and
from tectonic_spark.core.plate import (
    DelegatingPlate,
    MultiplexingPlate,
    NullPlate,
    Plate,
    ReifiedPlate,
    RowCountPlate,
    replay,
)

__all__ = [
    "Signal",
    "signal_and",
    "Plate",
    "DelegatingPlate",
    "MultiplexingPlate",
    "NullPlate",
    "ReifiedPlate",
    "RowCountPlate",
    "replay",
]
