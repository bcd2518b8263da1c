"""Plan-inspection helpers: assert the physical plan the optimizer
produced is the plan we designed for (pushdown reached the scan, small
sides broadcast, top-k stayed TakeOrdered, no accidental cartesians).

The reference has no optimizer to inspect (its single pass is the
sampling-config injection, physical_planner.rs:359-429); here the plan
IS the performance contract, so it gets tested like behavior.
"""

from chapterhousedb_spark.plans.inspect import (
    formatted_plan,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "formatted_plan",
    "physical_plan",
    "pushed_filters",
    "read_schema_columns",
]
