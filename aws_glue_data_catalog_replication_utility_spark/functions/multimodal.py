"""Multimodal columns: opaque binary blobs + typed metadata.

Generalizes the reference's S3 side-channel for oversized payloads
(S3Util.java:44-71 create / 201-236 read-back: data too big for the
message plane rides in an object store, addressed by (bucket, key) —
ExportLargeTable.java:97-116) to a first-class column model: a row
carries either an inline `blob` (small objects) or a `source_path`
pointer (large objects), mirroring the reference's inline-vs-side-channel
routing at its partition threshold.

Feature extraction runs as Arrow-batched `mapInPandas` — the pattern for
any decode/resize/frame-sample stage. The byte-level featurizer below is
real and oracle-checkable (length / md5 / magic prefix); the actual
image/audio decoders are STUBS (`decode_image`) because codec libraries
aren't available here — the Spark-side plumbing (schema, batch shape,
partitioning) is what this module proves.

Scale: blobs stay columnar (parquet binary); featurization is
embarrassingly parallel per Arrow batch with no shuffle; inline-vs-path
routing keeps row size bounded so `spark.sql.files.maxPartitionBytes`
sizing stays valid at 100 TB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

# metadata carried with every blob column (the typed side of the
# otherwise-opaque binary), mirroring the reference's s3ObjectKey /
# s3BucketName envelope fields (LargeTable.java:14-21)
BLOB_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("source_path", T.StringType()),  # None when inline
        T.StructField("byte_length", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_length", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("magic_hex", T.StringType()),
    ]
)

INLINE_THRESHOLD = 256 * 1024  # bytes; larger blobs should ride a path
# (the reference's partition threshold analogue, ExportDatabaseWithTables.java:73)


def attach_blob(
    df: DataFrame, text_col: str = "text", mime: str = "text/plain"
) -> DataFrame:
    """Materialize a binary `blob` column (UTF-8 bytes of `text_col`)
    plus its `meta` struct — the multimodal row shape. Real pipelines
    ingest bytes from files; the testdata has no binary column, so the
    document text doubles as a deterministic payload."""
    blob = F.col(text_col).cast("binary")
    return df.withColumn("blob", blob).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.when(F.octet_length(blob) > INLINE_THRESHOLD,
                   F.concat(F.lit("blob://"), F.col("doc_id").cast("string")))
            .otherwise(F.lit(None).cast("string"))
            .alias("source_path"),
            F.octet_length(blob).cast("long").alias("byte_length"),
        ),
    )


def blob_features(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """Byte-level featurizer over Arrow batches: length, md5 hex digest,
    and the 4-byte magic prefix (the 'what format is this' probe every
    decoder front-ends). mapInPandas = the decode-stage harness; swap the
    body for image decode / frame sampling when codecs are available."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_length": blobs.map(len).astype("int64"),
                    "content_md5": blobs.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "magic_hex": blobs.map(lambda b: bytes(b)[:4].hex().upper()),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """STUB — image decoding needs a codec library not present in this
    environment. The contract: input rows with a binary `blob`; output
    adds (width, height, channels) and a decoded array column, computed
    per Arrow batch exactly like `blob_features`. Deliberately
    unimplemented rather than faked."""
    raise NotImplementedError(
        "image decode requires a codec library (e.g. Pillow); "
        "use blob_features for the byte-level plumbing, or inject a "
        "decoder with the same mapInPandas shape"
    )
