"""Plan-inspection helpers (used by tests to assert pushdown/broadcast)."""

from whisper_pandas_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
)

__all__ = ["formatted_plan", "pushed_filters", "has_broadcast_join"]
