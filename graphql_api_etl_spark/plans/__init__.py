from graphql_api_etl_spark.plans.inspect import (
    executed_plan,
    has_broadcast_join,
    has_python_eval,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "has_python_eval",
    "pushed_filters",
    "read_schema_columns",
]
