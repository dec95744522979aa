"""Persistent table constraints (versioned.add_table_constraint):
CHECK invariants stored IN the commit log and enforced by every write
path — library appends/overwrites/merges Spark-side, the vstore
format's batch and stream writers Arrow-side in session-less workers.
The grammar is registration-gated to what BOTH enforcers can run, so
the two can never drift; semantics are SQL CHECK (violation only when
the expression IS FALSE — NULL passes)."""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark import versioned as V
from aws_glue_data_catalog_replication_utility_spark.versioned import (
    ConstraintViolation,
    _parse_constraint,
)


@pytest.fixture()
def store(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(
        spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b")], "id int, score double, s string"
        ),
        root,
    )
    return root


def test_constraint_grammar_gate():
    assert _parse_constraint("a > 0") == [("a", ">", 0)]
    assert _parse_constraint("a IS NOT NULL AND a > 0 AND s = 'x'") == [
        ("notnull", "a"), ("a", ">", 0), ("s", "=", "x")
    ]
    assert _parse_constraint("`odd col` is not null") == [
        ("notnull", "odd col")
    ]
    for bad in ("upper(a) = 'X'", "a > b", "a IS NULL", "a > 0 OR a < -5"):
        with pytest.raises(ValueError, match="unsupported constraint"):
            _parse_constraint(bad)


def test_add_validates_existing_rows(spark, store):
    with pytest.raises(ConstraintViolation):
        V.add_table_constraint(spark, store, "pos", "id > 1")
    assert V.table_constraints(store) == {}  # nothing committed
    v = V.add_table_constraint(spark, store, "pos", "id > 0")
    assert v == 2
    assert V.table_constraints(store) == {"pos": "id > 0"}
    with pytest.raises(ValueError, match="already exists"):
        V.add_table_constraint(spark, store, "pos", "id > 0")


def test_library_paths_enforce(spark, store):
    V.add_table_constraint(spark, store, "pos", "id > 0")
    V.add_table_constraint(spark, store, "has_s", "s IS NOT NULL")
    good = spark.createDataFrame(
        [(3, None, "c")], "id int, score double, s string"
    )
    bad = spark.createDataFrame(
        [(0, 1.0, None)], "id int, score double, s string"
    )
    V.append(good, store)  # NULL score passes: no constraint on it
    n_before = V.read_versioned(spark, store).count()
    for op in (
        lambda: V.append(bad, store),
        lambda: V.overwrite(bad, store),
        lambda: V.append_with_retry(bad, store),
        lambda: V.merge_into(spark, store, bad, ["id"]),
        lambda: V.overwrite_where(spark, store, "id = 0", bad),
    ):
        with pytest.raises(ConstraintViolation) as ei:
            op()
        names = {r["check"] for r in ei.value.report}
        assert names == {"pos", "has_s"}
    assert V.read_versioned(spark, store).count() == n_before

    # NULL passes a comparison constraint (SQL CHECK semantics)
    V.append(
        spark.createDataFrame(
            [(None, 1.0, "z")], "id int, score double, s string"
        ),
        store,
    )


def test_drop_and_time_scoped_constraints(spark, store):
    v_add = V.add_table_constraint(spark, store, "pos", "id > 0")
    v_drop = V.drop_table_constraint(store, "pos")
    assert V.table_constraints(store) == {}
    assert V.table_constraints(store, version=v_add) == {"pos": "id > 0"}
    assert V.table_constraints(store, version=v_drop) == {}
    with pytest.raises(ValueError, match="no constraint"):
        V.drop_table_constraint(store, "pos")
    # enforcement really disarmed
    V.append(
        spark.createDataFrame(
            [(0, 0.0, "x")], "id int, score double, s string"
        ),
        store,
    )
    hist = [h["action"] for h in V.history(store)]
    assert hist == ["append", "set_constraint", "drop_constraint", "append"]


def test_constraints_survive_checkpoint_compaction(spark, store):
    V.add_table_constraint(spark, store, "pos", "id > 0")
    V.append(
        spark.createDataFrame(
            [(5, 1.0, "e")], "id int, score double, s string"
        ),
        store,
    )
    V.checkpoint(store)
    # simulate aggressive log cleanup: delete every pre-checkpoint
    # manifest (incl. the set_constraint one)
    log = os.path.join(store, "_txlog")
    for n in sorted(os.listdir(log)):
        if n.startswith("v"):
            os.unlink(os.path.join(log, n))
    assert V.table_constraints(store) == {"pos": "id > 0"}
    with pytest.raises(ConstraintViolation):
        V.append(
            spark.createDataFrame(
                [(-1, 1.0, "x")], "id int, score double, s string"
            ),
            store,
        )


def test_missing_column_semantics(spark, store):
    """An evolved writer that predates a column: comparisons pass
    (NULL), IS NOT NULL fails every row — both enforcers agree."""
    V.add_table_constraint(spark, store, "score_ok", "score >= 0")
    V.add_table_constraint(spark, store, "has_s", "s IS NOT NULL")
    old_shape = spark.createDataFrame([(7,)], "id int")
    with pytest.raises(ConstraintViolation) as ei:
        V.append(old_shape, store)
    assert {r["check"] for r in ei.value.report} == {"has_s"}


def test_format_batch_writer_enforces(spark, store, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        register_vstore_source,
    )

    register_vstore_source(spark)
    V.add_table_constraint(spark, store, "pos", "id > 0")
    V.add_table_constraint(spark, store, "has_s", "s IS NOT NULL")
    ok = spark.createDataFrame(
        [(9, 9.0, "i")], "id int, score double, s string"
    )
    ok.write.format("vstore").mode("append").save(store)
    n = V.read_versioned(spark, store).count()
    bad = spark.createDataFrame(
        [(9, 9.0, "i"), (-1, 0.0, "j")], "id int, score double, s string"
    )
    with pytest.raises(Exception, match="constraint violations: pos"):
        bad.coalesce(1).write.format("vstore").mode("append").save(store)
    # nothing committed, no staged debris left live
    assert V.read_versioned(spark, store).count() == n


def test_format_stream_writer_enforces(spark, store, tmp_path):
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        register_vstore_source,
    )

    register_vstore_source(spark)
    V.add_table_constraint(spark, store, "pos", "id > 0")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(-3, 0.0, "x")], "id int, score double, s string"
    ).write.parquet(src)
    q = (
        spark.readStream.schema("id int, score double, s string")
        .parquet(src)
        .writeStream.format("vstore")
        .option("path", store)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="constraint violations: pos"):
        q.awaitTermination(180)
        q.processAllAvailable()
    n_versions = len(V.history(store))
    assert V.history(store)[-1]["action"] == "set_constraint"
    assert n_versions == 2  # append + set_constraint; no stream commit


def test_cli_constraint_ops(spark, store, capsys):
    from aws_glue_data_catalog_replication_utility_spark.cli import main

    def run(argv):
        assert main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    rep = run(["vstore", "--root", store, "--op", "add-constraint",
               "--name", "pos", "--expr", "id > 0"])
    assert rep["action"] == "set_constraint"
    assert run(["vstore", "--root", store, "--op", "constraints"]) == {
        "pos": "id > 0"
    }
    rep = run(["vstore", "--root", store, "--op", "drop-constraint",
               "--name", "pos"])
    assert rep["action"] == "drop_constraint"
    assert run(["vstore", "--root", store, "--op", "constraints"]) == {}


def test_describe_detail_metadata_only(spark, store):
    """DESCRIBE DETAIL from metadata alone: version, files, bytes,
    log-recorded rows, constraints, txn state, bloom/checkpoint
    presence — consistent with the heavier per-surface calls."""
    V.add_table_constraint(spark, store, "pos", "id > 0")
    V.append(
        spark.createDataFrame(
            [(4, 1.0, "d")], "id int, score double, s string"
        ),
        store,
        txn_app_id="job",
        txn_version=7,
    )
    V.checkpoint(store)
    d = V.describe_detail(store)
    assert d["version"] == len(V.history(store))
    assert d["num_files"] >= 2 and d["size_bytes"] > 0
    assert d["num_rows"] == V.count_versioned(spark, store)[0] == 3
    assert d["schema_generations"] == 1
    assert d["constraints"] == {"pos": "id > 0"}
    assert d["txns"] == {"job": 7}
    assert d["checkpoint_version"] == d["version"]
    assert d["bloom_columns"] is None
    assert d["ts"] is not None

    # CLI surface
    import json as _json

    from aws_glue_data_catalog_replication_utility_spark.cli import main
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["vstore", "--root", store, "--op", "detail"]) == 0
    rep = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["num_files"] == d["num_files"]


def test_add_constraint_rejects_arrow_unenforceable_literals(spark, store):
    """The cross-enforcer drift guard: a literal Spark would happily
    implicit-cast (string '5' on the int column) must be refused at
    REGISTRATION — otherwise the Spark gate passes batches the Arrow
    gate crashes on, and the two enforcers disagree."""
    with pytest.raises(ValueError, match="Arrow-enforceable"):
        V.add_table_constraint(spark, store, "bad", "id = '5'")
    assert V.table_constraints(store) == {}
    # while a correctly-typed literal on every lane registers fine
    V.add_table_constraint(spark, store, "s_ok", "s >= 'a'")
    V.add_table_constraint(spark, store, "sc_ok", "score >= 0.0")
    assert set(V.table_constraints(store)) == {"s_ok", "sc_ok"}


def test_in_list_constraint_both_enforcers(spark, store, tmp_path):
    """`split IN ('train','eval')`-style membership constraints run on
    BOTH enforcers: Spark rejects a violating library append, the
    Arrow path rejects a violating format write."""
    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        register_vstore_source,
    )

    register_vstore_source(spark)
    V.add_table_constraint(spark, store, "s_member", "s IN ('a', 'b', 'c')")
    ok = spark.createDataFrame(
        [(5, 1.0, "c")], "id int, score double, s string"
    )
    V.append(ok, store)
    ok.write.format("vstore").mode("append").save(store)
    bad = spark.createDataFrame(
        [(6, 1.0, "zz")], "id int, score double, s string"
    )
    with pytest.raises(ConstraintViolation):
        V.append(bad, store)
    with pytest.raises(Exception, match="constraint violations: s_member"):
        bad.coalesce(1).write.format("vstore").mode("append").save(store)
    # NULL membership passes (SQL IN is NULL on NULL input, not FALSE)
    V.append(
        spark.createDataFrame(
            [(7, 1.0, None)], "id int, score double, s string"
        ),
        store,
    )
    # ...and through the FORMAT writer too: pyarrow's is_in yields
    # FALSE (not null) for a NULL input, so the Arrow enforcer must
    # validity-gate the mask or it rejects batches the Spark enforcer
    # accepts — the exact divergence the registration gate exists to
    # prevent
    spark.createDataFrame(
        [(8, 1.0, None)], "id int, score double, s string"
    ).coalesce(1).write.format("vstore").mode("append").save(store)
    assert V.read_versioned(spark, store).where("s IS NULL").count() == 2
    # direct unit on the Arrow mask: NULL passes, real violations count
    import pyarrow as pa

    from aws_glue_data_catalog_replication_utility_spark.sources.vstore_source import (
        _arrow_batch_violations,
    )

    batch = pa.RecordBatch.from_pydict({"s": ["a", None, "zz", None]})
    got = _arrow_batch_violations(
        batch, {"m": V._parse_constraint("s IN ('a', 'b')")}
    )
    assert got == ["m(1)"]  # only 'zz'; the NULLs pass
