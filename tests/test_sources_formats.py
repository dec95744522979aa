"""Multi-format batch IO (`sources/formats.py`): ORC/CSV/JSON round
trips with type fidelity, poison-row capture that can't fail the job,
and the `convert` front door. Generalizes the reference's per-message
JsonSyntaxException catch (ImportDatabaseOrTable.java:129-132) to bulk
text ingestion."""

from __future__ import annotations

import pytest

from aws_glue_data_catalog_replication_utility_spark.sources.formats import (
    CORRUPT_COL,
    convert_table,
    read_table,
    split_corrupt_rows,
    write_table,
)

SF = "/root/testdata/sf0.001"
ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_orc_round_trip_preserves_schema_and_rows(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/orders.parquet")
    dst = str(tmp_path / "orders_orc")
    write_table(src, dst, "orc")
    back = read_table(spark, dst, "orc")
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_csv_round_trip_with_schema(spark, tmp_path):
    """CSV drops types on disk; the schema'd read restores them —
    bigint/double/timestamp all survive the round trip bit-for-bit."""
    src = spark.read.parquet(f"{SF}/orders.parquet")
    dst = str(tmp_path / "orders_csv")
    write_table(src, dst, "csv")  # header=true default
    back = read_table(
        spark, dst, "csv", schema=ORDERS_DDL, options={"header": "true"}
    )
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        f.dataType.simpleString() for f in src.schema.fields
    ]
    assert _rows(back) == _rows(src)


def test_json_round_trip_with_schema(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/orders.parquet")
    dst = str(tmp_path / "orders_json")
    write_table(src, dst, "json")
    back = read_table(spark, dst, "json", schema=ORDERS_DDL)
    assert _rows(back) == _rows(src)


def test_csv_corrupt_capture_routes_poison_rows(spark, tmp_path):
    """A type-mismatched row lands in the corrupt column with its RAW
    line (never fails the job); the exact header line is filtered; good
    rows parse fully."""
    p = tmp_path / "in.csv"
    p.write_text(
        "a,b\n"
        "1,foo\n"
        "oops,bar\n"
        "2,baz\n"
    )
    df = read_table(
        spark,
        str(p),
        "csv",
        schema="a int, b string",
        options={"header": "true"},
        corrupt_capture=True,
    )
    good, bad = split_corrupt_rows(df)
    assert _rows(good) == [(1, "foo"), (2, "baz")]
    assert [r[0] for r in bad.collect()] == ["oops,bar"]
    assert bad.columns == [CORRUPT_COL]


def test_json_corrupt_capture_routes_poison_rows(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text(
        '{"a": 1, "b": "foo"}\n'
        "{broken\n"
        '{"a": 2, "b": "baz"}\n'
    )
    df = read_table(
        spark, str(p), "json", schema="a int, b string", corrupt_capture=True
    )
    good, bad = split_corrupt_rows(df)
    assert _rows(good) == [(1, "foo"), (2, "baz")]
    assert [r[0] for r in bad.collect()] == ["{broken"]


def test_corrupt_capture_dlq_branch_survives_column_pruning(spark, tmp_path):
    """The whole reason for the text-scan lane: selecting ONLY the
    corrupt column (what a DLQ branch prunes to) must work — the native
    csv/json readers raise QUERY_ONLY_CORRUPT_RECORD_COLUMN here."""
    p = tmp_path / "in.json"
    p.write_text('{"a": 1}\n{nope\n')
    df = read_table(
        spark, str(p), "json", schema="a int", corrupt_capture=True
    )
    only = df.select(CORRUPT_COL).where(
        df[CORRUPT_COL].isNotNull()
    )
    assert [r[0] for r in only.collect()] == ["{nope"]


def test_convert_table_csv_to_parquet_with_dlq(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("1,foo\nbad,bar\n2,baz\n3,qux\n")
    out = str(tmp_path / "out_parquet")
    dlq = str(tmp_path / "dlq")
    rep = convert_table(
        spark,
        str(p),
        out,
        "csv",
        "parquet",
        schema="a int, b string",
        bad_out=dlq,
    )
    assert rep == {"good": 3, "bad": 1}
    assert _rows(spark.read.parquet(out)) == [(1, "foo"), (2, "baz"), (3, "qux")]
    assert [r[0] for r in spark.read.parquet(dlq).collect()] == ["bad,bar"]


def test_convert_table_parquet_to_orc_partitioned(spark, tmp_path):
    import os

    out = str(tmp_path / "orders_orc")
    rep = convert_table(
        spark,
        f"{SF}/orders.parquet",
        out,
        "parquet",
        "orc",
        partition_by=["o_orderpriority"],
    )
    src = spark.read.parquet(f"{SF}/orders.parquet")
    assert rep["bad"] == 0 and rep["good"] == src.count()
    assert sorted(
        n for n in os.listdir(out) if n.startswith("o_orderpriority=")
    )
    back = read_table(spark, out, "orc")
    assert _rows(back.select(*src.columns)) == _rows(src)


def test_read_table_rejects_bad_usage(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, "/tmp/x", "avro")
    with pytest.raises(ValueError, match="corrupt_capture applies"):
        read_table(spark, "/tmp/x", "parquet", schema="a int",
                   corrupt_capture=True)
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, "/tmp/x", "json", corrupt_capture=True)
