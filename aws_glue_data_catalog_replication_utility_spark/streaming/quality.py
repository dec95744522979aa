"""Streaming data-quality gate.

The fifth streaming loop: micro-batches run the SAME declarative
checks as the batch plane (`functions/expectations.py`) inside
foreachBatch — clean rows flow to the sink, violating rows land in a
quarantine directory with the name of every check they failed, and a
per-batch report row records the counts. Nothing re-implemented: a
micro-batch is a bounded DataFrame, so `_row_local_ok` compiles to the
identical one-scan conditional-sum aggregate the batch gate uses
(ROW-LOCAL checks only — `unique`/`foreign_key` need cross-batch
state, which is the batch gate's job over the landed store).

Operational contract, same as the other four loops:
- a poison row never kills the query: it is DATA (quarantined with its
  failed-check list), not an exception;
- replay is idempotent: each batch OVERWRITES its own `batch_id=N`
  directory under clean/, quarantine/, and report/ — at-least-once
  redelivery converges without coordination;
- map-only: the split is two filters over one scan plus one
  #checks-column aggregate; no shuffle, linear scale-out.

Reference anchor: this is the event plane's malformed-JSON DLQ
(ImportDatabaseOrTable.java:129-132; DLQ re-drive plans/redrive.py)
generalized from "does it parse" to "does it satisfy the declared
contract".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.expectations import ROW_LOCAL, _row_local_ok


def start_quality_gate_stream(
    spark: SparkSession,
    in_path: str | None = None,
    schema: str | None = None,
    checks: list[dict] | None = None,
    out_root: str = "",
    checkpoint_path: str = "",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    source=None,
):
    """Gate a parquet stream through row-local expectation checks.
    Rows passing EVERY check land under `{out_root}/clean/batch_id=N`;
    violators land under `{out_root}/quarantine/batch_id=N` with a
    `failed_checks array<string>` column; `{out_root}/report` gets one
    row per (batch, check) with violation counts."""
    checks = list(checks or [])
    bad_kinds = [c["kind"] for c in checks if c["kind"] not in ROW_LOCAL]
    if bad_kinds:
        raise ValueError(
            f"streaming gate takes row-local checks only ({ROW_LOCAL}); "
            f"got {bad_kinds} — run unique/foreign_key as the batch gate "
            f"over the landed store"
        )
    if not checks:
        raise ValueError("need at least one check")

    if source is not None:
        stream = source.load(spark)
    else:
        if in_path is None or schema is None:
            raise ValueError("pass in_path+schema or a source adapter")
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        stream = reader.parquet(in_path)

    ok_cols = [
        F.coalesce(_row_local_ok(c), F.lit(False)) for c in checks
    ]
    names = [c["name"] for c in checks]

    def gate_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        flagged = batch_df.withColumn(
            "failed_checks",
            F.filter(
                F.array(*[
                    F.when(~ok, F.lit(n))
                    for ok, n in zip(ok_cols, names)
                ]),
                lambda x: x.isNotNull(),
            ),
        )
        clean = flagged.where(F.size("failed_checks") == 0).drop(
            "failed_checks"
        )
        clean.write.mode("overwrite").parquet(
            f"{out_root}/clean/batch_id={batch_id}"
        )
        quarantine = flagged.where(F.size("failed_checks") > 0)
        quarantine.write.mode("overwrite").parquet(
            f"{out_root}/quarantine/batch_id={batch_id}"
        )
        # per-batch counts: the identical one-scan aggregate shape as
        # the batch gate
        agg = batch_df.agg(
            F.count(F.lit(1)).alias("__total"),
            *[
                F.sum((~ok).cast("long")).alias(f"__c{i}")
                for i, ok in enumerate(ok_cols)
            ],
        ).collect()[0]
        report = spark.createDataFrame(
            [
                (int(batch_id), n, int(agg[f"__c{i}"] or 0),
                 int(agg["__total"]))
                for i, n in enumerate(names)
            ],
            "batch_id bigint, check string, violations bigint, "
            "total bigint",
        )
        report.coalesce(1).write.mode("overwrite").parquet(
            f"{out_root}/report/batch_id={batch_id}"
        )

    writer = stream.writeStream.foreachBatch(gate_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_gate_outputs(
    spark: SparkSession, out_root: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean, quarantine, report) across all batches."""
    def rd(sub: str) -> DataFrame:
        root = f"{out_root}/{sub}"
        return spark.read.option("basePath", root).parquet(root)

    return rd("clean"), rd("quarantine"), rd("report")
