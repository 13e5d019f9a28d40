"""Scalar-function surface (SURVEY.md §2.7).

The reference's claimed function set (reference README.md:1114-1122)
is ``= <> >= <= > <``, ``+ - * /``, ``concat``, ``nvl``,
``is [not] null``, ``sum count max min avg distinct``, ``or/and``,
``to_date``, ``date_sub`` — plus pass-through of *unknown* functions
(README.md:471-487 renders any ``fun(args)`` without breaking), which
is its de-facto UDF surface.

Spark provides every one natively; this package pins the mapping, adds
the engine's own registered helpers, and keeps the UDF registration
discipline in one place.
"""

from hadoop__spark.functions.compat import (
    REFERENCE_FUNCTIONS,
    register_engine_udfs,
)

__all__ = ["REFERENCE_FUNCTIONS", "register_engine_udfs"]
