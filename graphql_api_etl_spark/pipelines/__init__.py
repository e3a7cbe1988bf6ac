from graphql_api_etl_spark.pipelines.weekly_alignments import (
    PipelineContext,
    SyncReport,
    run_weekly_sync,
)

__all__ = ["PipelineContext", "SyncReport", "run_weekly_sync"]
