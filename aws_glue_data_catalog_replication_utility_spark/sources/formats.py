"""Multi-format batch IO: parquet / ORC / CSV / JSON / text, one door.

The reference's data plane is JSON-message-shaped (S3Util.java:201-236
reads ndjson line-by-line; ImportDatabaseOrTable.java:129-132 catches
JsonSyntaxException per message); this module generalizes that posture
to every columnar/text format Spark ships built-in, so the engine can
ingest a customer's existing ORC/CSV/JSON estate and export to it —
without a poison row ever failing a 100 TB job.

Design rules, all scale-driven:
- Schema'd reads only for text formats in production: CSV/JSON schema
  INFERENCE is an extra full scan of the input before the real one —
  fine at a notebook, catastrophic at 100 TB. `read_table` accepts an
  explicit schema (DDL string or StructType); inference is available
  but the convert path asks for DDL.
- Corrupt capture via text-scan + `from_json`/`from_csv`, NOT the
  native reader's PERMISSIVE mode: the csv/json file sources forbid
  plans referencing only the corrupt-record column
  (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — exactly what a DLQ branch
  becomes after column pruning. The text lane has no such restriction
  (same trick as `sources/ndjson.py`), parses each line ONCE, and the
  split is two filters over one scan.
- Binary formats (parquet/ORC) have footers and typed pages — corrupt
  capture doesn't apply; a bad file is an IO error, not a bad row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT_COL = "_corrupt_record"

BINARY_FORMATS = ("parquet", "orc")
TEXT_FORMATS = ("csv", "json")
SUPPORTED = BINARY_FORMATS + TEXT_FORMATS + ("text",)


def _ddl(schema) -> str:
    """Schema as a DDL string (what the from_csv/from_json lanes take)."""
    if isinstance(schema, str):
        return schema
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    options: dict | None = None,
    corrupt_capture: bool = False,
) -> DataFrame:
    """Read `path` as `fmt`. With `corrupt_capture` (csv/json only,
    schema required) the result carries a `_corrupt_record` column:
    NULL for parsed rows, the raw line for poison rows — feed it to
    `split_corrupt_rows`. CSV corrupt capture handles `header` by
    filtering the exact header line (the text scan has no header
    notion); multiline JSON records are out of scope for the capture
    lane (line = record, the ndjson contract)."""
    opts = dict(options or {})
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED}")
    if not corrupt_capture:
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.options(**opts).format(fmt).load(path)

    if fmt not in TEXT_FORMATS:
        raise ValueError(f"corrupt_capture applies to {TEXT_FORMATS}, not {fmt!r}")
    if schema is None:
        raise ValueError("corrupt_capture needs an explicit schema")
    ddl = _ddl(schema)
    parse_opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **{k: v for k, v in opts.items() if k != "header"},
    }
    raw = spark.read.text(path)
    if fmt == "csv" and str(opts.get("header", "")).lower() == "true":
        sep = opts.get("sep", ",")
        names = [s.split()[0] for s in ddl.split(",")]
        raw = raw.where(F.col("value") != F.lit(sep.join(names)))
    parser = F.from_csv if fmt == "csv" else F.from_json
    ddl_with_corrupt = f"{ddl}, {CORRUPT_COL} string"
    return raw.select(
        parser(F.col("value"), ddl_with_corrupt, parse_opts).alias("r")
    ).select("r.*")


def split_corrupt_rows(
    df: DataFrame, context_cols: tuple[str, ...] = ()
) -> tuple[DataFrame, DataFrame]:
    """(good_without_corrupt_col, bad) from a corrupt-capture read.
    `bad` keeps the raw line plus any `context_cols` so the DLQ can say
    which row of which input went wrong."""
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        *context_cols, CORRUPT_COL
    )
    return good, bad


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict | None = None,
) -> None:
    """Write `df` as `fmt`. CSV defaults header=true (self-describing
    exports); partition_by gives the hive layout every format
    supports."""
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED}")
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
    w = df.write.mode(mode).options(**opts).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def convert_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    in_format: str,
    out_format: str = "parquet",
    schema=None,
    bad_out: str | None = None,
    in_options: dict | None = None,
    out_options: dict | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Format conversion front door: read `in_path`, write `out_path`;
    with `bad_out` (+ schema, text formats) poison rows land there as
    (raw line) parquet instead of failing the job — the reference's
    per-message JsonSyntaxException catch generalized to a bulk lane.
    One parse pass; good/bad counts come from the WRITTEN outputs'
    footers (metadata-only counts, no second scan of the input)."""
    capture = bad_out is not None
    df = read_table(
        spark, in_path, in_format, schema=schema,
        options=in_options, corrupt_capture=capture,
    )
    reread_opts = dict(out_options or {})
    if out_format == "csv":
        reread_opts.setdefault("header", "true")  # the write default
    if capture:
        good, bad = split_corrupt_rows(df)
        bad.write.mode("overwrite").parquet(bad_out)
        write_table(good, out_path, out_format, partition_by=partition_by,
                    options=out_options)
        return {
            "good": spark.read.format(out_format).options(
                **reread_opts).load(out_path).count(),
            "bad": spark.read.parquet(bad_out).count(),
        }
    write_table(df, out_path, out_format, partition_by=partition_by,
                options=out_options)
    return {
        "good": spark.read.format(out_format).options(
            **reread_opts).load(out_path).count(),
        "bad": 0,
    }
