"""Plan inspection utilities: programmatic access to Catalyst physical
plans so tests can assert scan pruning, filter pushdown, broadcast joins,
and codegen coverage instead of hoping for them."""

from automotive_big_data_analysis_spark.plans.explain import (
    broadcast_join_count,
    physical_plan,
    plan_report,
    pushed_filters,
    read_schemas,
    shuffle_count,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schemas",
    "broadcast_join_count",
    "shuffle_count",
    "plan_report",
]
