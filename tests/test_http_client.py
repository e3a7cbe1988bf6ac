"""HTTP transport tests: the real-wire implementation of the
reference's ``gql_api.post`` contract (ETL:169–175) driven against a
local fixture server — pagination, executor-side mutation batches,
retry-on-failure, and K4 timeout tolerance (ETL:224–246)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from graphql_api_etl_spark.net import (
    GraphQLReadTimeout,
    GraphQLTransportError,
    HttpClientFactory,
    HttpConnectionClient,
    HttpGQLApi,
    HttpMutationClient,
)
from graphql_api_etl_spark.sinks.mutations import MutationSink
from graphql_api_etl_spark.sources.graphql import fetch_connection, walk_pages
from tests.fixture_gql_server import FixtureGQLServer, make_pages

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField(
            "address", T.StructType([T.StructField("state", T.StringType())])
        ),
    ]
)


def _conn_client(server, **kw):
    return HttpConnectionClient(
        HttpGQLApi(server.url, timeout=5),
        query="query fetchThings($after: String) { things { ... } }",
        operation_name="fetchThings",
        conn_type="things",
        **kw,
    )


def test_post_roundtrip_and_error_envelope():
    with FixtureGQLServer(make_pages(1, 2)) as server:
        api = HttpGQLApi(server.url, timeout=5)
        payload = api.post("query fetchThings { }", "fetchThings", {})
        assert payload["data"]["things"]["edges"][0]["node"]["id"] == "L0"
        server.fail_next["fetchThings"] = 1
        with pytest.raises(GraphQLTransportError):
            api.post("query fetchThings { }", "fetchThings", {})


def test_http_cursor_walk_matches_fixture():
    with FixtureGQLServer(make_pages(3, 4)) as server:
        nodes = walk_pages(_conn_client(server))
        assert [n["id"] for n in nodes] == [f"L{i}" for i in range(12)]


def test_fetch_connection_over_http_flattens(spark):
    with FixtureGQLServer(make_pages(2, 3)) as server:
        df = fetch_connection(spark, _conn_client(server), NODE_SCHEMA)
        # S4 flatten keeps the reference's json_normalize naming: the
        # node struct flattens to node_* / node_parent_child columns.
        rows = {r["node_id"]: r for r in df.collect()}
        assert len(rows) == 6
        assert rows["L1"]["node_address_state"] == "TX"


def test_mutation_sink_posts_batches_from_executors(spark):
    with FixtureGQLServer() as server:
        df = spark.createDataFrame(
            [(f"L{i}", f"g{i % 3}") for i in range(17)], "location string, grp string"
        ).repartition(4)
        sink = MutationSink(
            HttpClientFactory(server.url, query="mutation locationAdd { }"),
            operation="locationAdd",
            batch_size=5,
        )
        status = sink.write(df)
        ok = status.filter("success").count()
        assert ok == 17
        posted = [
            r
            for body in server.mutations
            for r in body["variables"]["input"]["records"]
        ]
        assert sorted(r["location"] for r in posted) == sorted(f"L{i}" for i in range(17))
        # batching respected: no request carried more than batch_size
        assert all(
            len(body["variables"]["input"]["records"]) <= 5 for body in server.mutations
        )


def test_mutation_retry_recovers_from_transient_failure(spark):
    with FixtureGQLServer() as server:
        server.fail_next["userAddNewToAccount"] = 1  # first POST fails, retry wins
        df = spark.createDataFrame([("u1",), ("u2",)], "user string").coalesce(1)
        sink = MutationSink(
            HttpClientFactory(server.url, query="mutation userAddNewToAccount { }"),
            operation="userAddNewToAccount",
            batch_size=10,
            max_retries=2,
        )
        status = sink.write(df)
        assert status.filter("success").count() == 2


def test_per_record_server_rejection_lands_in_status(spark):
    with FixtureGQLServer() as server:
        server.fail_record_when = lambda r: r.get("grp") == "bad"
        df = spark.createDataFrame(
            [("a", "ok"), ("b", "bad"), ("c", "ok")], "location string, grp string"
        ).coalesce(1)
        sink = MutationSink(
            HttpClientFactory(server.url, query="mutation hierarchyGroupPermissionAdd { }"),
            operation="hierarchyGroupPermissionAdd",
        )
        status = sink.write(df)
        assert status.filter("success").count() == 2
        assert status.filter("NOT success").count() == 1


def test_delete_timeout_tolerated_marks_complete():
    # K4 (ETL:224-246): the reference swallows httpx.ReadTimeout on
    # delete because the server may have finished the operation.
    with FixtureGQLServer() as server:
        server.slow_ops["droppingExistingHierarchyGroups"] = 2.0
        api = HttpGQLApi(server.url, timeout=0.3)
        tolerant = HttpMutationClient(
            api, query="mutation droppingExistingHierarchyGroups { }", tolerate_timeout=True
        )
        out = tolerant.post_batch("droppingExistingHierarchyGroups", [{"id": "hg1"}])
        assert out[0][1] is True and "timeout tolerated" in out[0][2]
        strict = HttpMutationClient(
            api, query="mutation droppingExistingHierarchyGroups { }", tolerate_timeout=False
        )
        with pytest.raises(GraphQLReadTimeout):
            strict.post_batch("droppingExistingHierarchyGroups", [{"id": "hg1"}])


def test_keepalive_one_connection_across_posts():
    """One client = one TCP connection no matter how many POSTs: real
    endpoints throttle per-connection (r3 VERDICT ask #7)."""
    with FixtureGQLServer(make_pages(8, 2)) as server:
        client = _conn_client(server)
        nodes = walk_pages(client)  # 8 pages + terminal empty page = 9 POSTs
        assert len(nodes) == 16
        assert server.requests >= 8
        assert server.connections == 1


def test_keepalive_reopens_stale_connection():
    """A server that dropped the idle keep-alive socket must not fail
    the next post — the client reconnects exactly once."""
    with FixtureGQLServer(make_pages(1, 1)) as server:
        api = HttpGQLApi(server.url, timeout=5)
        api.post("query fetchThings { }", "fetchThings", {})
        api._conn.close()  # simulate server-side idle drop
        payload = api.post("query fetchThings { }", "fetchThings", {})
        assert payload["data"]["things"]["edges"]


def test_mutation_sink_one_connection_per_partition(spark):
    """The sink's batching contract end-to-end: 4 partitions x many
    batches -> at most one connection per partition task."""
    with FixtureGQLServer() as server:
        df = spark.createDataFrame(
            [(f"L{i}",) for i in range(40)], "location string"
        ).repartition(4)
        sink = MutationSink(
            HttpClientFactory(server.url, query="mutation locationAdd { }"),
            operation="locationAdd",
            batch_size=2,  # forces ~5 POSTs per partition
        )
        status = sink.write(df)
        assert status.filter("success").count() == 40
        assert len(server.mutations) >= 10  # many batches...
        assert server.connections <= 4  # ...but ≤1 connection per partition


def test_server_initiated_close_falls_back_per_request():
    """An endpoint that refuses keep-alive (Connection: close on every
    response) must still work — the client reconnects per request
    instead of failing on the dropped socket."""
    with FixtureGQLServer(make_pages(4, 2)) as server:
        server.close_each = True
        nodes = walk_pages(_conn_client(server))
        assert len(nodes) == 8
        assert server.connections >= 4  # no reuse possible, one per request


def test_account_scoping_travels_as_headers():
    with FixtureGQLServer(make_pages(1, 1)) as server:
        client = _conn_client(server, current_account_id="acct-1", account_ids=["acct-1", "acct-2"])
        client.fetch_page(None)  # would raise on transport error
