"""Operator library: joins with provenance, transforms, aggregates,
dedup, similarity search, text analysis, multimodal plumbing."""

from graphql_api_etl_spark.operators.join import outer_merge, anti, semi, cross, MERGE_BOTH, MERGE_LEFT, MERGE_RIGHT

__all__ = ["outer_merge", "anti", "semi", "cross", "MERGE_BOTH", "MERGE_LEFT", "MERGE_RIGHT"]
