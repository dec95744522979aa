"""PySpark-native catalog-replication + data-pipeline engine.

A brand-new engine with the query and data-processing capabilities of
aws-samples/aws-glue-data-catalog-replication-utility (reference studied
read-only at /root/reference), re-expressed Spark-first:

- the catalog dataflow (snapshot scan -> prefix filter -> threshold
  routing -> diff-driven upsert -> partition full-refresh -> audit)
  becomes declarative DataFrame plans over catalog-snapshot tables;
- the SNS/SQS event plane becomes Structured Streaming + foreachBatch
  idempotent apply;
- on top, the relational operator surface and LLM-data-pipeline
  extensions (dedup, similarity search, text analysis, multimodal
  columns) needed to run these pipelines at 100 TB scale.

Nothing here is a translation of the reference's Java/Lambda topology:
process boundaries become shuffle boundaries, retry loops become
idempotent MERGE, pagination becomes a partitioned scan.
"""

__version__ = "0.1.0"
