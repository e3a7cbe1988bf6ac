"""Source-registry extras: CSV scan with column normalization and
directory file discovery (reference S2/S5)."""

from __future__ import annotations


def test_read_csv_normalizes_headers(spark, tmp_path):
    from graphql_api_etl_spark.sources.registry import read_csv

    p = tmp_path / "managers.csv"
    p.write_text("Corporate Managers\nA@x.com\nB@x.com\n")
    df = read_csv(spark, str(p))
    assert df.columns == ["corporate_managers"]
    assert df.count() == 2


def test_discover_input_files(tmp_path):
    from graphql_api_etl_spark.sources.registry import discover_input_files

    (tmp_path / "b.xlsx").write_text("")
    (tmp_path / "a.xlsx").write_text("")
    (tmp_path / "z.csv").write_text("")
    found = discover_input_files(str(tmp_path))
    # deterministic: first by sorted name (reference: first listed wins)
    assert found["xlsx"].endswith("a.xlsx")
    assert found["csv"].endswith("z.csv")


def test_discover_handles_missing_kinds(tmp_path):
    from graphql_api_etl_spark.sources.registry import discover_input_files

    found = discover_input_files(str(tmp_path))
    assert found == {"xlsx": None, "csv": None}
