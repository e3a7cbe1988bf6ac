"""Source layer: schema registry, file loaders, paginated connection
source, nested-JSON flattening."""

from graphql_api_etl_spark.sources.registry import STAR_TABLES, load_table, load_tables, register_views
from graphql_api_etl_spark.sources.flatten import flatten

__all__ = ["STAR_TABLES", "load_table", "load_tables", "register_views", "flatten"]
