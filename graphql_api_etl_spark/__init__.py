"""graphql_api_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
ETL pipeline (``Alchem1s7/graphQL-api-ETL``, a single-file pandas
extract–transform–load-with-reconciliation job) as an idiomatic Spark
engine: declarative DataFrame/SQL plans optimized by Catalyst, with
library operators for the reference's signature patterns (full-outer
join with per-row provenance, hierarchy dedup, paginated connection
sources, reconciliation gates) plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, tuned shuffles)
- ``sources``    schema registry, loaders, paginated Relay-style source,
                 nested-JSON flattening
- ``operators``  joins w/ provenance, transforms, aggregates, dedup,
                 similarity, text analysis, multimodal plumbing
- ``functions``  scalar expression helpers (all native, no Python UDFs
                 in hot paths)
- ``plans``      explain/plan-assertion helpers (pushdown, broadcast)
- ``sinks``      CSV report sink, batched mutation sink, validation gates
- ``streaming``  structured-streaming variants (paginated source as a
                 micro-batch stream, windowed aggs)
- ``pipelines``  reference-parity end-to-end pipeline assembly
"""

__version__ = "0.1.0"
