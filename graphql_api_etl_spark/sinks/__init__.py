"""Sinks and validation gates (reference K1–K5, V1–V5)."""

from graphql_api_etl_spark.sinks.reports import write_csv_report
from graphql_api_etl_spark.sinks.mutations import MutationSink, MockMutationClient
from graphql_api_etl_spark.sinks.gates import require_nonempty, require_empty, warn_if_nonempty

__all__ = [
    "write_csv_report",
    "MutationSink",
    "MockMutationClient",
    "require_nonempty",
    "require_empty",
    "warn_if_nonempty",
]
