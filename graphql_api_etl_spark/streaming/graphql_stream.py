"""Structured-Streaming variant of the paginated GraphQL connection
source (reference S3, ETL:178–221 — ``ETL:NNN`` ≡
``/root/reference/weekly alignments GQL API.py``).

The reference walks the Relay cursor chain once per weekly run and
re-extracts EVERYTHING (then hard-deletes and reloads, ETL:20–22). The
streaming-native evolution: the cursor is a checkpointed offset, each
micro-batch reads only pages that appeared since the last committed
offset, and downstream reconciliation runs incrementally. This turns
the reference's full-truncate-reload into an append stream with
exactly-once page consumption (offsets commit atomically with the
batch via the checkpoint log).

Wire format matches sources/graphql.py: each row is one node's JSON in
a single ``value`` string column — parse with ``from_json`` + the
sources.flatten helper. Pages are landed as ``page-*.json`` files in a
directory (the thin HTTP adapter's job is exactly that: walk the live
cursor chain and land pages; the engine consumes landed pages with
full parallelism — SURVEY §7 hard part 4 isolates the serial walk).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

try:  # Python DataSource streaming API (Spark 4)
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    @dataclass
    class _PageRange(InputPartition):
        directory: str
        start: int
        end: int

    def _page_index(fname: str) -> int:
        stem = fname[len("page-") : -len(".json")]
        if not stem.isdigit():
            raise ValueError(
                f"non-numeric page file name {fname!r}: the checkpointed offset "
                "indexes pages by their numeric suffix; rename to page-<int>.json"
            )
        return int(stem)

    def _page_files(directory: str) -> list[str]:
        # Sort by the NUMERIC page index, not lexicographically:
        # page-10 sorts before page-2 as a string, which would shift
        # already-committed offsets when new pages land (duplicated /
        # dropped pages, breaking exactly-once).
        return sorted(
            (f for f in os.listdir(directory) if f.startswith("page-") and f.endswith(".json")),
            key=_page_index,
        )

    class _ConnStreamReader(DataSourceStreamReader):
        """Offset = number of fully-consumed pages (the cursor chain's
        position, serialized into the streaming checkpoint)."""

        def __init__(self, options):
            self.directory = options.get("path")
            if not self.directory:
                raise ValueError("option 'path' (page directory) is required")

        def initialOffset(self) -> dict:
            return {"pages": 0}

        def latestOffset(self) -> dict:
            return {"pages": len(_page_files(self.directory))}

        def partitions(self, start: dict, end: dict):
            # One partition per page: landed pages parse in parallel
            # even though the original HTTP walk was serial.
            return [
                _PageRange(self.directory, i, i + 1)
                for i in range(start["pages"], end["pages"])
            ] or [_PageRange(self.directory, 0, 0)]

        def read(self, partition: _PageRange):
            files = _page_files(partition.directory)
            for fname in files[partition.start : partition.end]:
                with open(os.path.join(partition.directory, fname)) as f:
                    page = json.load(f)
                for edge in page.get("edges", []):
                    yield (json.dumps(edge["node"]),)

        def commit(self, end: dict) -> None:
            pass  # page files are immutable; nothing to release

    class GraphQLStreamDataSource(DataSource):
        """``spark.readStream.format("graphql_connection_stream")
        .option("path", dir)`` → unbounded ``value string`` of node
        JSON, one micro-batch per batch of newly-landed pages."""

        @classmethod
        def name(cls) -> str:
            return "graphql_connection_stream"

        def schema(self) -> str:
            return "value string"

        def streamReader(self, schema) -> DataSourceStreamReader:
            return _ConnStreamReader(self.options)

    def register_graphql_stream_source(spark: SparkSession) -> None:
        spark.dataSource.register(GraphQLStreamDataSource)

except ImportError:  # pragma: no cover

    def register_graphql_stream_source(spark: SparkSession) -> None:  # type: ignore[misc]
        raise NotImplementedError("Python DataSource streaming API unavailable")
