"""Streaming event-source adapters for the import plane.

The reference's event bus is SNS+SQS (SNSUtil.java / SQSUtil.java); the
sandbox analogue is a directory of ndjson message files (drop a file ->
it becomes a micro-batch). A production deployment's first ask is a
Kafka-shaped bus, so the source is an ADAPTER: anything with a
`load(spark) -> streaming DataFrame[MESSAGE]` method plugs into
`start_event_stream`, and the rest of the pipeline (dispatch, MERGE,
audit, DLQ) is source-agnostic.

Both adapters emit the SAME event envelope (model.MESSAGE): the message
attributes the reference carries as SNS/SQS metadata (message_type,
source_catalog_id, export_batch_id, bucket/region for large tables —
SNSUtil.java:64-67,143-146) are first-class columns, and `payload` is
the entity JSON exactly as the reference's Gson body.

KafkaEventSource maps the envelope onto Kafka's wire model:
  key   = event_id (partition affinity: one entity's events stay
          ordered within a partition — the analogue of SQS batch-size-1
          per-entity ordering, ExportLargeTable.java template BatchSize 1)
  value = JSON of the full envelope (decode_kafka_events parses it back
          with from_json on the MESSAGE schema; corrupt values keep a
          null-fielded row whose raw value lands in `payload` for the
          DLQ lane, mirroring the file source's PERMISSIVE read).

The Kafka connector jar (spark-sql-kafka) is not bundled in this
sandbox; `KafkaEventSource.load` raises Spark's DATA_SOURCE_NOT_FOUND
at stream-build time there, and `decode_kafka_events` — the entire
engine-side contract — is unit-tested on batch frames shaped like the
connector's output (key/value binary columns).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..model import MESSAGE


@dataclass
class FileEventSource:
    """Directory-of-ndjson source (the SNS sandbox analogue): each file
    dropped into `path` becomes (part of) a micro-batch."""

    path: str
    max_files_per_trigger: int | None = None

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.schema(MESSAGE)
        if self.max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(self.max_files_per_trigger)
            )
        return reader.json(self.path)


@dataclass
class FileStreamSource:
    """Generic TYPED directory file-stream source — the doc/blob/record
    plane's analogue of FileEventSource (which is pinned to the import
    MESSAGE envelope): any schema, any format Spark's readStream
    supports. Every streaming loop (embed, near-dedup, sem-dedup,
    media, quality gate, score) takes one of these via `source=`, so
    swapping the sandbox's file bus for Kafka is ONE constructor change
    per deployment, not an edit per loop — the same bus-agnostic
    dispatch shape the reference gets from SNS fan-out
    (ExportDatabaseWithTables.java:140-142)."""

    path: str
    schema: str
    format: str = "json"
    max_files_per_trigger: int | None = None
    options: dict[str, str] = field(default_factory=dict)

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.schema(self.schema)
        if self.max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(self.max_files_per_trigger)
            )
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.format(self.format).load(self.path)


def decode_kafka_events(raw: DataFrame) -> DataFrame:
    """Kafka records -> MESSAGE envelope. `raw` has the connector's
    schema (key binary, value binary, topic, partition, offset, ...).

    A value that fails to parse still yields a row: event_id falls back
    to topic/partition/offset (a stable redelivery-safe id), and the
    raw value is preserved in `payload` with a null message_type — the
    import dispatch routes exactly that shape to the DLQ
    (importer.parse_events bad-type lane), so a poison record is
    dead-lettered instead of dropped, same as the file source's
    corrupt-line handling.

    The raw-value fallback is gated on PARSE FAILURE (the poison shape:
    from_json yields a null struct, or an envelope naming neither
    event_id nor message_type), never on payload nullness — a valid
    envelope whose payload is legitimately null keeps its null payload
    instead of having the whole envelope JSON substituted (ADVICE
    r04)."""
    parsed = raw.select(
        F.col("value").cast("string").alias("__v"),
        F.from_json(F.col("value").cast("string"), MESSAGE).alias("m"),
        F.concat_ws(
            "/", F.col("topic"), F.col("partition"), F.col("offset")
        ).alias("__addr"),
    )
    poison = F.col("m").isNull() | (
        F.col("m.event_id").isNull() & F.col("m.message_type").isNull()
    )
    return parsed.select(
        F.coalesce(F.col("m.event_id"), F.col("__addr")).alias("event_id"),
        F.col("m.message_type").alias("message_type"),
        F.col("m.source_catalog_id").alias("source_catalog_id"),
        F.col("m.export_batch_id").alias("export_batch_id"),
        F.when(poison, F.col("__v")).otherwise(F.col("m.payload")).alias("payload"),
        F.col("m.bucket_name").alias("bucket_name"),
        F.col("m.region_name").alias("region_name"),
    )


@dataclass
class KafkaEventSource:
    """Kafka topic source. Requires the spark-sql-kafka connector on the
    classpath (not bundled in the sandbox — load() then raises Spark's
    DATA_SOURCE_NOT_FOUND; the decode contract stays unit-tested)."""

    bootstrap_servers: str
    topic: str
    starting_offsets: str = "earliest"
    fail_on_data_loss: bool = False
    extra_options: dict[str, str] = field(default_factory=dict)

    def load(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("subscribe", self.topic)
            .option("startingOffsets", self.starting_offsets)
            .option("failOnDataLoss", str(self.fail_on_data_loss).lower())
        )
        for k, v in self.extra_options.items():
            reader = reader.option(k, v)
        return decode_kafka_events(reader.load())


def encode_kafka_events(events: DataFrame) -> DataFrame:
    """MESSAGE envelope -> Kafka producer frame (key/value strings): the
    export side of the bus. `df.write.format('kafka')` consumes exactly
    this shape."""
    return events.select(
        F.col("event_id").alias("key"),
        F.to_json(
            F.struct(
                "event_id",
                "message_type",
                "source_catalog_id",
                "export_batch_id",
                "payload",
                "bucket_name",
                "region_name",
            )
        ).alias("value"),
    )
