"""Job entry points — the reference's Lambda handlers as Spark jobs.

    python -m aws_glue_data_catalog_replication_utility_spark.cli <job> ...

Jobs (mirroring SURVEY.md §3):
  plan     databases snapshot -> prefix-scoped db messages + export audit
  export   db messages + tables + partitions -> table/largeTable messages,
           ndjson side-channel, export audit
  import   events + target snapshots -> new target snapshots + audit + dlq
  redrive  dlq + target snapshots -> re-applied import (fixpoint retry)
  stream   continuous import: readStream events dir -> versioned state
  stream-dedup  incremental near-dedup: micro-batches of docs checked
           against the persisted keeper signature store (MinHash/LSH)
  stream-sem-dedup  incremental semantic dedup: embed -> ANN-probe the
           keeper index -> exact-cosine verdicts -> keepers append
  stream-media  streaming multimodal feature extraction over binary
           blob micro-batches (image/audio/frames/stats lanes)
  stream-gate  streaming data-quality gate: clean/quarantine split
           with per-row failed-check lists + per-batch reports
  dedup-compact  merge a stopped stream-dedup state's cold signature
           tail into one partition; coalesce decision-log files
  clean    LLM-corpus cleaning: paragraph boilerplate removal ->
           quality-filter verdicts -> exact dedup, with a why-dropped audit
  sem-dedup  semantic dedup: embedding clusters -> intra-cluster exact
           cosine -> greedy min-id keepers (SemDeDup)
  zorder   re-lay a parquet store along a multi-column Z-curve for
           footer-based file pruning on every z-ordered column
  bucket   re-lay a parquet store as a hash-bucketed sorted table so
           equi-joins on the key never shuffle again
  compact  bin-pack a store's small files to ~target size in place,
           per hive partition (streaming ingest tail hygiene)
  delete   targeted row deletion (GDPR/retention): rewrite only the
           files containing matching rows, remove fully-matching ones
  convert  parquet/orc/csv/json format conversion with schema'd text
           reads and a poison-row DLQ lane
  expect   data-quality gate: declarative constraint checks with a
           violation report + sampled violating rows; nonzero exit
           on failure (the CI/pipeline contract)
  union    UNION ALL BY NAME across parquet generations: schema merge
           along the widening lattice, lossy casts refused
  split    leakage-safe train/eval/test assignment keyed on dedup
           clusters (near-dups never straddle splits)
  stats    distributed parquet-footer observability: totals, size
           spread, per-column stats coverage, maintenance advice
  corpus-build  the whole pipeline in one command: clean ->
           near-dedup -> leakage-safe split, with per-stage audits
  reduce   PCA embedding reduction to the top-k components (MLlib,
           one distributed pass), unit-renormalized for cosine/ANN
  near-dedup  fuzzy dedup: MinHash/LSH candidates -> exact verify ->
           connected components -> one keeper per duplicate cluster
  embed    text -> vector: signed feature-hashing embeddings feeding
           the index job (no model, map-only, deterministic)
  index    build a persistent IVF-PQ ANN index (cluster-partitioned)
  index-append  add vectors to an existing index (stored-codebook assign)
  index-delete  remove vectors by id (rewrites only affected clusters)
  index-compact re-cluster a drifted index (Lloyd from stored centroids)
  index-recover finish/roll back a crashed index-compact swap (idempotent)
  index-stats   per-cluster counts + balance factor; --verify integrity gate
  search   ADC top-k over a built index, nprobe directory pruning

All inputs/outputs are parquet directories (the engine's catalog-snapshot
interchange), except the events dir for `stream` (ndjson message files,
one file per micro-batch). Run ids / batch ids / run dates are explicit
arguments, never wall-clock (SNSUtil.java:91-92 used currentTimeMillis;
we keep runs reproducible).
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession


def _spark(args) -> SparkSession:
    from .session import get_spark

    return get_spark(app_name=f"gdc-replication-{args.job}")


def _read(spark, path, schema=None):
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def _write(df, path):
    df.write.mode("overwrite").parquet(path)


def _write_all(outputs, root):
    """Write a set of result plans whose INPUTS may live under `root`
    (in-place state update). Every plan is fully materialized into a
    staging directory first, then swapped in — so a later plan can never
    scan a path an earlier overwrite already clobbered. Local-FS rename;
    an object-store deployment would stage to a new version prefix
    instead (see streaming.ingest.write_small_planes)."""
    import shutil

    staging = f"{root}/.staging"
    shutil.rmtree(staging, ignore_errors=True)
    for name, df in outputs:
        _write(df, f"{staging}/{name}")
    for name, _ in outputs:
        final = f"{root}/{name}"
        shutil.rmtree(final, ignore_errors=True)
        os.replace(f"{staging}/{name}", final)
    shutil.rmtree(staging, ignore_errors=True)


def _parse_preds(specs: list[str]) -> list[tuple[str, str, object]]:
    """'col OP value' strings -> skipindex predicate triples (OP in
    < <= = >= >), plus 'col in v1,v2,...' membership lists; values
    coerced int -> float -> quoted-string (per list item too)."""
    import re as _re

    def coerce(raw: str) -> object:
        try:
            return int(raw)
        except ValueError:
            try:
                return float(raw)
            except ValueError:
                return raw.strip("'\"")

    preds: list[tuple[str, str, object]] = []
    for p in specs:
        mi = _re.match(r"^\s*(\w+)\s+(?i:in)\s+(.+?)\s*$", p)
        if mi:
            col, items = mi.groups()
            vals = tuple(
                coerce(x.strip()) for x in items.split(",") if x.strip()
            )
            if not vals:
                raise SystemExit(f"bad --pred {p!r}: empty IN list")
            preds.append((col, "in", vals))
            continue
        m = _re.match(r"^\s*(\w+)\s*(<=|>=|<|>|=)\s*(.+?)\s*$", p)
        if not m:
            raise SystemExit(
                f"bad --pred {p!r}: want 'col OP value' or 'col in v1,v2'"
            )
        col, op, raw = m.groups()
        preds.append((col, op, coerce(raw)))
    return preds


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gdc-replication")
    sub = ap.add_subparsers(dest="job", required=True)

    p = sub.add_parser("plan")
    p.add_argument("--databases", required=True)
    p.add_argument("--prefixes", default="")
    p.add_argument("--separator", default=",")
    p.add_argument("--run-id", type=int, default=0)
    p.add_argument("--batch-id", default="0")
    p.add_argument("--messages-out", required=True)
    p.add_argument("--audit-out", required=True)

    e = sub.add_parser("export")
    e.add_argument("--db-messages", required=True)
    e.add_argument("--tables", required=True)
    e.add_argument("--partitions", required=True)
    e.add_argument("--threshold", type=int, default=10)
    e.add_argument("--run-id", type=int, default=0)
    e.add_argument("--batch-id", default="0")
    e.add_argument("--run-date", default="2024-01-01")
    e.add_argument("--side-channel", default=None)
    e.add_argument("--messages-out", required=True)
    e.add_argument("--audit-out", required=True)

    i = sub.add_parser("import")
    i.add_argument("--events", required=True)
    i.add_argument("--target-databases", required=True)
    i.add_argument("--target-tables", required=True)
    i.add_argument("--target-partitions", required=True)
    i.add_argument("--target-catalog-id", default="999999999999")
    i.add_argument("--side-channel", default=None)
    i.add_argument("--run-id", type=int, default=0)
    i.add_argument("--out-root", required=True)

    r = sub.add_parser("redrive")
    r.add_argument("--dlq", required=True)
    r.add_argument("--target-databases", required=True)
    r.add_argument("--target-tables", required=True)
    r.add_argument("--target-partitions", required=True)
    r.add_argument("--target-catalog-id", default="999999999999")
    r.add_argument("--side-channel", default=None)
    r.add_argument("--run-id", type=int, default=0)
    r.add_argument("--out-root", required=True)

    s = sub.add_parser("stream")
    s.add_argument("--events-dir", required=True)
    s.add_argument("--state-root", required=True)
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--target-catalog-id", default="999999999999")
    s.add_argument("--side-channel", default=None)
    s.add_argument("--available-now", action="store_true",
                   help="drain what's present then stop (default: run forever)")
    s.add_argument("--retain-versions", type=int, default=None,
                   help="keep only the newest N state snapshots; 1 = "
                        "skipArchive semantics (default: archive all)")

    snd = sub.add_parser(
        "stream-dedup",
        help="incremental near-dedup: each micro-batch of docs is "
             "MinHash/LSH-checked against the persisted keeper "
             "signature store; per-doc verdicts land under "
             "state-root/decisions",
    )
    snd.add_argument("--docs-dir", required=True)
    snd.add_argument("--state-root", required=True)
    snd.add_argument("--checkpoint", required=True)
    snd.add_argument("--threshold", type=float, default=0.7)
    snd.add_argument("--num-hashes", type=int, default=12)
    snd.add_argument("--bands", type=int, default=4)
    snd.add_argument("--normalize", action="store_true")
    snd.add_argument("--max-files-per-trigger", type=int, default=None,
                     help="cap files per micro-batch (bounds batch size "
                          "and the within-batch self-join)")
    snd.add_argument("--available-now", action="store_true",
                     help="drain what's present then stop (default: run forever)")
    snd.add_argument("--close-every", type=int, default=None,
                     help="run the transitive-closure pass inline after "
                          "every Nth micro-batch (see dedup-close)")

    ssd = sub.add_parser(
        "stream-sem-dedup",
        help="incremental semantic dedup: each micro-batch embeds, "
             "probes the persistent ANN index (the keeper store), and "
             "exact-cosine-verified duplicates are flagged on arrival; "
             "keepers append to the index",
    )
    ssd.add_argument("--docs-dir", required=True)
    ssd.add_argument("--index-root", required=True,
                     help="existing ANN index (build it from the seed corpus)")
    ssd.add_argument("--state-root", required=True)
    ssd.add_argument("--checkpoint", required=True)
    ssd.add_argument("--threshold", type=float, default=0.9)
    ssd.add_argument("--k", type=int, default=3)
    ssd.add_argument("--nprobe", type=int, default=2)
    ssd.add_argument("--normalize", action="store_true")
    ssd.add_argument("--max-files-per-trigger", type=int, default=None)
    ssd.add_argument("--available-now", action="store_true",
                     help="drain what's present then stop (default: run forever)")
    ssd.add_argument("--close-every", type=int, default=None,
                     help="run the transitive-closure pass inline after "
                          "every Nth micro-batch (see semdedup-close)")

    sm = sub.add_parser(
        "stream-media",
        help="streaming multimodal feature extraction: micro-batches of "
             "(doc_id, blob) rows run the Arrow decode lanes "
             "(image/audio/frames/stats); garbage blobs survive as "
             "error rows, replays overwrite their own batch dir",
    )
    sm.add_argument("--blobs-dir", required=True,
                    help="streaming parquet dir of (doc_id long, blob binary)")
    sm.add_argument("--out-root", required=True)
    sm.add_argument("--checkpoint", required=True)
    sm.add_argument("--kind", choices=("image", "audio", "frames", "stats"),
                    default="image")
    sm.add_argument("--every", type=int, default=2,
                    help="frame sampling stride (kind=frames)")
    sm.add_argument("--max-files-per-trigger", type=int, default=None)
    sm.add_argument("--available-now", action="store_true",
                    help="drain what's present then stop (default: run forever)")

    sg = sub.add_parser(
        "stream-gate",
        help="streaming data-quality gate: micro-batches split into "
             "clean/ and quarantine/ (failed_checks per row) with a "
             "per-batch violation report; row-local checks only",
    )
    sg.add_argument("--in", dest="in_path", required=True,
                    help="streaming parquet input dir")
    sg.add_argument("--schema-ddl", required=True)
    sg.add_argument("--checks", required=True,
                    help="JSON file of row-local check objects "
                         "(same spec as the expect job)")
    sg.add_argument("--out-root", required=True)
    sg.add_argument("--checkpoint", required=True)
    sg.add_argument("--max-files-per-trigger", type=int, default=None)
    sg.add_argument("--available-now", action="store_true",
                    help="drain what's present then stop (default: run forever)")

    sdc = sub.add_parser(
        "dedup-compact",
        help="compact a STOPPED stream-dedup state: merge the cold "
             "signature-store tail into one partition and coalesce the "
             "decision logs; verdicts and history are unchanged",
    )
    sdc.add_argument("--state-root", required=True)
    sdc.add_argument("--keep-last", type=int, default=1,
                     help="newest N batch dirs left untouched (default 1: "
                          "the only batch a restart can re-deliver)")
    sdc.add_argument("--rows-per-file", type=int, default=4_000_000)

    ncl = sub.add_parser(
        "dedup-close",
        help="transitive closure over a STOPPED stream-dedup state: "
             "connected components across every accumulated signature "
             "(keepers + dropped docs) so greedy chains A~B~C converge "
             "to one keeper; rewrites only the affected decision and "
             "signature directories",
    )
    ncl.add_argument("--state-root", required=True)
    ncl.add_argument("--threshold", type=float, default=0.7)
    ncl.add_argument("--num-hashes", type=int, default=12)
    ncl.add_argument(
        "--mode", choices=["auto", "full", "incremental"], default="auto",
        help="auto = incremental when a compatible close watermark "
             "exists (pair regeneration scoped to bands touched since "
             "the last pass), full = complete re-fold",
    )

    scl = sub.add_parser(
        "semdedup-close",
        help="transitive closure over a STOPPED stream-sem-dedup "
             "state: connected components across every accumulated "
             "embedding (index keepers + dropped docs' cold vectors); "
             "demoted keepers leave the ANN index, promoted ones join",
    )
    scl.add_argument("--state-root", required=True)
    scl.add_argument("--index-root", required=True)
    scl.add_argument("--threshold", type=float, default=0.9)
    scl.add_argument("--pair-blocks", type=int, default=8)
    scl.add_argument(
        "--mode", choices=["auto", "full", "incremental"], default="auto",
        help="auto = incremental when a compatible close watermark "
             "exists (pair regeneration scoped to clusters touched "
             "since the last pass), full = complete re-fold",
    )

    c = sub.add_parser(
        "clean",
        help="LLM-corpus cleaning: boilerplate paragraph removal -> "
             "quality-filter verdicts -> exact dedup; writes the cleaned "
             "corpus plus a why-dropped audit",
    )
    c.add_argument("--documents", required=True, help="input parquet (doc_id, text, ...)")
    c.add_argument("--out", required=True, help="cleaned corpus parquet dir")
    c.add_argument("--audit-out", required=True,
                   help="per-document verdict audit parquet dir")
    c.add_argument("--paragraph-max-df", type=int, default=1,
                   help="a paragraph in more than this many docs is boilerplate")
    c.add_argument("--keep-singletons-only", action="store_true",
                   help="drop ALL copies of exact duplicates instead of keeping one")
    c.add_argument("--min-avg-logprob", type=float, default=None,
                   help="perplexity-style cut: drop docs whose corpus-unigram "
                        "avg log-prob is below this (gibberish scores low); "
                        "applied after the heuristic verdicts, audited as "
                        "'low_unigram_logprob'")
    c.add_argument("--span-dedup-n", type=int, default=None,
                   help="cross-document substring-span dedup (Lee et al. "
                        "2022): cut duplicated runs of >= this many tokens "
                        "(keep-one) from the boilerplate-free text before "
                        "quality verdicts; audited as n_span_tokens_removed")

    nd = sub.add_parser(
        "near-dedup",
        help="fuzzy document dedup: MinHash signatures -> LSH band "
             "candidates -> exact-Jaccard verify -> connected components "
             "-> keep the min doc_id per duplicate cluster",
    )
    nd.add_argument("--documents", required=True, help="parquet (doc_id, text, ...)")
    nd.add_argument("--out", required=True, help="surviving docs parquet dir")
    nd.add_argument("--audit-out", required=True,
                    help="per-doc cluster audit parquet dir")
    nd.add_argument("--shingle-n", type=int, default=5)
    nd.add_argument("--num-hashes", type=int, default=12)
    nd.add_argument("--bands", type=int, default=4)
    nd.add_argument("--threshold", type=float, default=0.8,
                    help="exact-Jaccard cutoff applied to LSH candidates")
    nd.add_argument("--normalize", action="store_true",
                    help="casefold/strip-punct/collapse-digits before shingling")

    sd = sub.add_parser(
        "sem-dedup",
        help="semantic dedup (SemDeDup): cluster the embedding space, "
             "drop docs whose exact cosine against a smaller-id doc in "
             "the same cluster clears the threshold",
    )
    sd.add_argument("--embeddings", required=True,
                    help="parquet (vec_id, embedding array)")
    sd.add_argument("--out", required=True, help="surviving rows parquet dir")
    sd.add_argument("--audit-out", required=True,
                    help="per-vector verdict parquet dir "
                         "(vec_id, cluster, keep, dup_of, cosine)")
    sd.add_argument("--threshold", type=float, default=0.9)
    sd.add_argument("--n-seeds", type=int, default=8,
                    help="cluster count: fewer -> higher recall, more "
                         "intra-cluster pairs")
    sd.add_argument("--pair-blocks", type=int, default=8,
                    help="triangle-join blocking factor for giant clusters")

    zo = sub.add_parser(
        "zorder",
        help="re-lay a parquet store along the Z-curve of the given "
             "columns so range predicates on ANY of them prune files "
             "(lakehouse OPTIMIZE ZORDER equivalent)",
    )
    zo.add_argument("--in", dest="in_path", required=True)
    zo.add_argument("--out", required=True)
    zo.add_argument("--cols", required=True,
                    help="comma-separated numeric columns, e.g. a,b")
    zo.add_argument("--n-files", type=int, default=64)
    zo.add_argument("--bits", type=int, default=8)

    bk = sub.add_parser(
        "bucket",
        help="re-lay a parquet store as a hash-bucketed (+ per-bucket "
             "sorted) table so equi-joins/aggs on the bucket key run "
             "with zero shuffle exchanges forever after",
    )
    bk.add_argument("--in", dest="in_path", required=True)
    bk.add_argument("--table", required=True, help="catalog table name to create")
    bk.add_argument("--path", required=True,
                    help="external location for the bucketed files")
    bk.add_argument("--cols", required=True, help="comma-separated bucket columns")
    bk.add_argument("--n-buckets", type=int, default=64)
    bk.add_argument("--sort-cols", default=None,
                    help="comma-separated per-bucket sort columns "
                         "(default: the bucket columns)")

    cp = sub.add_parser(
        "compact",
        help="bin-pack a parquet store's small files in place to "
             "~target-sized files (per hive partition; untouched "
             "partitions stay byte-identical)",
    )
    cp.add_argument("--path", required=True, help="parquet store directory")
    cp.add_argument("--target-mb", type=int, default=128,
                    help="target output file size in MiB")
    cp.add_argument("--where", default=None,
                    help="SQL predicate over partition columns scoping "
                         "the rewrite (e.g. \"dt = '2026-01-01'\")")
    cp.add_argument("--sort-cols", default=None,
                    help="comma-separated columns to re-sort rows "
                         "within each output file")
    cp.add_argument("--max-parallel", type=int, default=4)

    dl = sub.add_parser(
        "delete",
        help="targeted row deletion from a parquet store (GDPR / "
             "retention purge): only files containing matching rows "
             "are rewritten; fully-matching files are removed",
    )
    dl.add_argument("--path", required=True, help="parquet store directory")
    dl.add_argument("--where", required=True,
                    help="SQL predicate selecting the rows to DELETE")
    dl.add_argument("--max-parallel", type=int, default=4)

    rd = sub.add_parser(
        "reduce",
        help="PCA embedding reduction: project array<float> vectors "
             "onto the top-k principal components (unit-renormalized "
             "for the cosine/ANN lanes); prints explained variance",
    )
    rd.add_argument("--in", dest="in_path", required=True,
                    help="embeddings parquet (vec_id, embedding, ...)")
    rd.add_argument("--out", required=True)
    rd.add_argument("--k", type=int, required=True)
    rd.add_argument("--id-col", default="vec_id")
    rd.add_argument("--vec-col", default="embedding")
    rd.add_argument("--no-renormalize", action="store_true")

    cb = sub.add_parser(
        "corpus-build",
        help="end-to-end corpus construction in one command: clean "
             "(boilerplate/quality/exact-dedup) -> near-dedup "
             "(MinHash/LSH -> verify -> clusters) -> leakage-safe "
             "train/eval split; intermediates + audits in --work-dir",
    )
    cb.add_argument("--documents", required=True)
    cb.add_argument("--out", required=True,
                    help="final corpus parquet, hive-partitioned by split")
    cb.add_argument("--work-dir", required=True,
                    help="intermediates: cleaned/, deduped/, audits, labels")
    cb.add_argument("--splits", default="train=95,eval=5")
    cb.add_argument("--paragraph-max-df", type=int, default=1)
    cb.add_argument("--min-avg-logprob", type=float, default=None)
    cb.add_argument("--span-dedup-n", type=int, default=None)
    cb.add_argument("--threshold", type=float, default=0.8)
    cb.add_argument("--normalize", action="store_true")
    cb.add_argument("--dsir-target", default=None,
                    help="also DSIR-select toward this target corpus "
                         "after near-dedup (importance resampling; "
                         "requires --dsir-k)")
    cb.add_argument("--dsir-k", type=int, default=None,
                    help="number of docs DSIR keeps")
    cb.add_argument("--dsir-temperature", type=float, default=1.0)
    cb.add_argument("--dsir-seed", default="0")
    cb.add_argument("--mix-alpha", type=float, default=None,
                    help="also temperature-mix the TRAIN split by "
                         "source (p ~ tokens^alpha) before sharding")
    cb.add_argument("--shuffle-shards", type=int, default=None,
                    help="also write the train split as N seeded "
                         "shuffle shards (dataloader prep) under "
                         "<out>_shards")

    stt = sub.add_parser(
        "stats",
        help="store observability: distributed parquet-footer stats "
             "(files/rows/bytes, per-column nulls + min/max coverage) "
             "with maintenance advice (compact / no_minmax flags)",
    )
    stt.add_argument("--path", required=True, help="parquet store directory")
    stt.add_argument("--target-mb", type=int, default=128,
                     help="target file size the compaction advice "
                          "measures against")
    stt.add_argument("--per-file-out", default=None,
                     help="also write the per-(file,column) stats "
                          "DataFrame as parquet here")

    sp = sub.add_parser(
        "split",
        help="leakage-safe train/eval/test assignment: the split is a "
             "pure function of the dedup-CLUSTER id, so near-dups "
             "never straddle train and eval",
    )
    sp.add_argument("--in", dest="in_path", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--splits", required=True,
                    help='name=pct pairs summing to 100, e.g. '
                         '"train=90,eval=5,test=5"')
    sp.add_argument("--labels", default=None,
                    help="parquet of (doc_id, label) cluster labels "
                         "(e.g. the near-dedup job's clusters output); "
                         "omitted = every doc is its own cluster")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--salt", default="split:")

    vs = sub.add_parser(
        "vstore",
        help="transactional versioned parquet store: append/overwrite/"
             "delete-where in atomic versions, time travel, rollback, "
             "history, vacuum",
    )
    vs.add_argument("--root", required=True)
    vs.add_argument("--op", required=True,
                    choices=["append", "overwrite", "overwrite-partitions",
                             "merge", "delete",
                             "update", "replace-where", "read", "count",
                             "history", "rollback", "vacuum", "checkpoint",
                             "optimize", "bloom-build", "bloom-refresh",
                             "changes", "add-constraint", "drop-constraint",
                             "constraints", "detail", "prune-log",
                             "rename-column", "drop-column",
                             "partitions", "clone"])
    vs.add_argument("--from", dest="changes_from", type=int, default=None,
                    help="changes: first version of the feed (inclusive)")
    vs.add_argument("--to", dest="changes_to", type=int, default=None,
                    help="changes: last version (default: latest)")
    vs.add_argument("--target-mb", type=int, default=128,
                    help="optimize: target file size")
    vs.add_argument("--zorder-by", default=None,
                    help="optimize: comma-separated z-order columns")
    vs.add_argument("--small-mb", type=int, default=None,
                    help="optimize: INCREMENTAL binpack — only files "
                         "smaller than this are rewritten (cost scales "
                         "with small-file debt, not table size); "
                         "exclusive with --zorder-by")
    vs.add_argument("--keys", default=None,
                    help="merge: comma-separated key columns")
    vs.add_argument("--in", dest="in_path", default=None,
                    help="append/overwrite: input parquet")
    vs.add_argument("--where", default=None,
                    help="delete/replace-where: predicate")
    vs.add_argument("--set", dest="set_exprs", action="append",
                    default=None, metavar="COL=EXPR",
                    help="update: one assignment per flag (repeat for "
                         "several); all RHS see the pre-update row")
    vs.add_argument("--purge-dvs", action="store_true",
                    help="optimize: rewrite ONLY deletion-vector-"
                         "masked files (masks applied) — retires the "
                         "read-side mask at a cost priced by the "
                         "masked files, not the table")
    vs.add_argument("--delete-mode", choices=["rewrite", "dv"],
                    default="rewrite",
                    help="delete: 'rewrite' re-stages survivor files "
                         "(copy-on-write); 'dv' writes a deletion "
                         "vector instead — NO data file rewritten, "
                         "reads mask the positions (merge-on-read; "
                         "the write-amplification escape at scale)")
    vs.add_argument("--version", type=int, default=None,
                    help="read: snapshot version; rollback: target")
    vs.add_argument("--timestamp", default=None,
                    help="read/count/rollback: TIMESTAMP AS OF (epoch "
                         "seconds or ISO-8601, naive = UTC) — resolved "
                         "to the newest version committed at or before "
                         "it; exclusive with --version")
    vs.add_argument("--out", default=None, help="read: write snapshot here")
    vs.add_argument("--keep-last", type=int, default=1,
                    help="vacuum: versions whose snapshots stay readable")
    vs.add_argument("--retention-seconds", type=float, default=600.0,
                    help="vacuum: never delete unreferenced files younger "
                         "than this (concurrent-writer guard); 0 only "
                         "when no writer can be running")
    vs.add_argument("--bloom-cols", default=None,
                    help="bloom-build: comma-separated columns for the "
                         "store-owned Bloom file index (MERGE probes "
                         "then open only key-containing files)")
    vs.add_argument("--keep-manifests", type=int, default=0,
                    help="prune-log: keep this many newest checkpoint-"
                         "summarized manifests as an audit tail")
    vs.add_argument("--name", default=None,
                    help="add/drop-constraint: constraint name")
    vs.add_argument("--expr", default=None,
                    help="add-constraint: CHECK expression (AND of "
                         "'col OP literal' / 'col IS NOT NULL')")
    vs.add_argument("--column", default=None,
                    help="rename-column/drop-column: the column "
                         "(current logical name)")
    vs.add_argument("--new-name", dest="rename_to", default=None,
                    help="rename-column: the new name (metadata-only; "
                         "files never rewritten — Delta column "
                         "mapping by stable field id)")
    vs.add_argument("--partition-by", default=None,
                    help="append/overwrite: comma-separated hive-style "
                         "partition columns — one partition tuple per "
                         "data file, so a partition-scoped delete/"
                         "replace-where is METADATA-ONLY (no scan, no "
                         "rewrite); append may only declare on first "
                         "write, overwrite may re-partition ('' clears)")
    vs.add_argument("--pred", action="append", default=[],
                    help="read: 'col OP value' predicates (repeatable, "
                         "AND) served through the snapshot skip index "
                         "— prunes live files before opening any")

    rp = sub.add_parser(
        "report",
        help="corpus report / dataset card: docs, tokens, dup rate, "
             "quality profile, composition by source/lang — one JSON",
    )
    rp.add_argument("--in", dest="in_path", required=True)
    rp.add_argument("--out", default=None, help="also write JSON here")
    rp.add_argument("--axes", default="source,lang",
                    help="comma-separated composition columns")
    rp.add_argument("--top-n", type=int, default=20)
    rp.add_argument("--approx", action="store_true",
                    help="HLL duplicate count (one fewer shuffle)")
    rp.add_argument("--id-col", default="doc_id")
    rp.add_argument("--text-col", default="text")

    mx = sub.add_parser(
        "mix",
        help="corpus mixing: --alpha 0 = equal token budgets, 1 = keep "
             "all, between = temperature-scaled (p ~ tokens^alpha)",
    )
    mx.add_argument("--in", dest="in_path", required=True)
    mx.add_argument("--out", required=True)
    mx.add_argument("--alpha", type=float, default=0.5)
    mx.add_argument("--source-col", default="source")
    mx.add_argument("--id-col", default="doc_id")
    mx.add_argument("--text-col", default="text")

    ds = sub.add_parser(
        "dsir",
        help="DSIR importance resampling: select --k raw docs whose "
             "hashed-n-gram distribution matches a target corpus "
             "(Gumbel top-k, seed-stable)",
    )
    ds.add_argument("--in", dest="in_path", required=True,
                    help="raw corpus parquet")
    ds.add_argument("--target", required=True, help="target corpus parquet")
    ds.add_argument("--out", required=True)
    ds.add_argument("--k", type=int, required=True)
    ds.add_argument("--n-buckets", type=int, default=10_000)
    ds.add_argument("--alpha", type=float, default=1e-4)
    ds.add_argument("--seed", default="0")
    ds.add_argument("--temperature", type=float, default=1.0)
    ds.add_argument("--id-col", default="doc_id")
    ds.add_argument("--text-col", default="text")

    bt = sub.add_parser(
        "bpe-train",
        help="learn a BPE merge table from the corpus (distributed "
             "word-frequency fold; the tokenizer-training slot)",
    )
    bt.add_argument("--in", dest="in_path", required=True)
    bt.add_argument("--model-out", required=True, help="model JSON path")
    bt.add_argument("--n-merges", type=int, default=200)
    bt.add_argument("--min-pair-count", type=int, default=2)
    bt.add_argument("--text-col", default="text")

    be = sub.add_parser(
        "bpe-encode",
        help="tokenize a corpus with a trained BPE model (Arrow lane): "
             "(id, bpe_tokens, bpe_token_count) parquet out",
    )
    be.add_argument("--in", dest="in_path", required=True)
    be.add_argument("--model", required=True, help="model JSON path")
    be.add_argument("--out", required=True)
    be.add_argument("--id-col", default="doc_id")
    be.add_argument("--text-col", default="text")

    vst = sub.add_parser(
        "vstore-stream",
        help="stream into the transactional store: each micro-batch "
             "becomes one atomic version, replays recognized in the "
             "log (exactly-once appends)",
    )
    vst.add_argument("--in", dest="in_path", required=True,
                     help="parquet stream directory")
    vst.add_argument("--root", required=True, help="versioned store root")
    vst.add_argument("--checkpoint", required=True)
    vst.add_argument("--schema", required=True, help="input DDL schema")
    vst.add_argument("--max-files-per-trigger", type=int, default=None)
    vst.add_argument("--merge-keys", default=None,
                     help="comma-separated key columns: each micro-"
                         "batch MERGES (upserts) instead of appending "
                         "— exactly-once streaming upsert")

    ssc = sub.add_parser(
        "stream-score",
        help="streaming learned-quality filter: score each micro-batch "
             "with a trained model, route keep/reject per batch",
    )
    ssc.add_argument("--in", dest="in_path", required=True,
                     help="parquet stream directory")
    ssc.add_argument("--model", required=True, help="model JSON path")
    ssc.add_argument("--out-root", required=True)
    ssc.add_argument("--checkpoint", required=True)
    ssc.add_argument("--schema", default="doc_id long, text string")
    ssc.add_argument("--keep-threshold", type=float, default=0.5)
    ssc.add_argument("--max-files-per-trigger", type=int, default=None)

    pe = sub.add_parser(
        "prepare-examples",
        help="the last mile: BPE-tokenize the corpus, lay docs in the "
             "seeded shuffle order, pack into fixed-length training "
             "examples hive-partitioned by shard",
    )
    pe.add_argument("--in", dest="in_path", required=True)
    pe.add_argument("--model", required=True, help="bpe-train model JSON")
    pe.add_argument("--out", required=True)
    pe.add_argument("--window", type=int, default=2048)
    pe.add_argument("--n-shards", type=int, default=64)
    pe.add_argument("--drop-last", action="store_true")
    pe.add_argument("--id-col", default="doc_id")
    pe.add_argument("--text-col", default="text")

    lb = sub.add_parser(
        "lm-buckets",
        help="CCNet-style perplexity bucketing: unigram-LM score + "
             "exact-quantile head/middle/tail tiers",
    )
    lb.add_argument("--in", dest="in_path", required=True)
    lb.add_argument("--out", required=True)
    lb.add_argument("--buckets", default="tail=34,middle=33,head=33",
                    help="name=pct pairs (worst to best) summing to 100")
    lb.add_argument("--min-df", type=int, default=1)
    lb.add_argument("--id-col", default="doc_id")
    lb.add_argument("--text-col", default="text")

    qt = sub.add_parser(
        "quality-train",
        help="train the linear quality classifier (fastText-filter "
             "slot) on a labeled seed set; writes a JSON model of "
             "O(dim) weights",
    )
    qt.add_argument("--in", dest="in_path", required=True,
                    help="labeled parquet: (id, text, label 0/1)")
    qt.add_argument("--model-out", required=True)
    qt.add_argument("--dim", type=int, default=256)
    qt.add_argument("--reg", type=float, default=1e-4)
    qt.add_argument("--id-col", default="doc_id")
    qt.add_argument("--text-col", default="text")
    qt.add_argument("--label-col", default="label")

    qs = sub.add_parser(
        "quality-score",
        help="score a corpus with a trained quality model (pure "
             "column expressions; weights ride the plan as literals)",
    )
    qs.add_argument("--in", dest="in_path", required=True)
    qs.add_argument("--model", required=True, help="model JSON path")
    qs.add_argument("--out", required=True)
    qs.add_argument("--keep-threshold", type=float, default=None)
    qs.add_argument("--id-col", default="doc_id")
    qs.add_argument("--text-col", default="text")

    sk = sub.add_parser(
        "skip-index",
        help="build the file-skipping index (typed footer min/max as "
             "a persisted relation); with --pred, also report/query "
             "how many files a predicate list keeps",
    )
    sk.add_argument("--path", required=True, help="parquet store")
    sk.add_argument("--out", default=None,
                    help="write the index relation as parquet here")
    sk.add_argument("--pred", action="append", default=[],
                    help="predicate 'col OP value' (OP in < <= = >= >), "
                         "repeatable, AND semantics")
    sk.add_argument("--rows-out", default=None,
                    help="with --pred: write the pruned-scan result here")
    sk.add_argument("--update", action="store_true",
                    help="incremental: refresh the existing --out index "
                         "(footer-read only NEW files, drop deleted)")
    sk.add_argument("--bloom-cols", default=None,
                    help="comma-separated columns to ALSO build a bloom "
                         "file index over (equality skipping for "
                         "scattered columns min/max can't prune)")
    sk.add_argument("--bloom-out", default=None,
                    help="write/read the bloom index relation here; "
                         "with --pred, '=' predicates prune through it")
    sk.add_argument("--bloom-bits", type=int, default=1 << 16)
    sk.add_argument("--bloom-k", type=int, default=4)
    sk.add_argument("--join-keys", default=None,
                    help="parquet relation of join keys: with a bloom "
                         "index, scan ONLY files that can contain at "
                         "least one key (runtime-filter file skipping) "
                         "and report/write the result")
    sk.add_argument("--join-col", default=None,
                    help="store column(s) the keys join on, comma-"
                         "separated for composite keys (defaults to "
                         "the key relation's single column name). "
                         "Composite keys prune via the TUPLE prover: "
                         "a file drops when every probe tuple has "
                         "some column whose value the file provably "
                         "lacks — strictly stronger than per-column "
                         "pruning on cross-matched files (a-without-b)")

    sh = sub.add_parser(
        "shuffle",
        help="seeded global shuffle -> N balanced ordered shard files "
             "(dataloader prep): the permutation is a pure function of "
             "the row id, identical across runs and partitionings",
    )
    sh.add_argument("--in", dest="in_path", required=True)
    sh.add_argument("--out", required=True)
    sh.add_argument("--n-shards", type=int, default=64)
    sh.add_argument("--id-col", default="doc_id")
    sh.add_argument("--salt", default="shuf:")

    ts = sub.add_parser(
        "token-shards",
        help="write an array<int> token column as Megatron indexed-"
             "dataset binary shards (.bin/.idx + manifest.json): one "
             "shuffle, tokens stream executor-side, deterministic "
             "bytes; dtype auto-narrows to uint16 when the vocab fits",
    )
    ts.add_argument("--in", dest="in_path", required=True)
    ts.add_argument("--out", required=True)
    ts.add_argument("--tokens-col", default="tokens")
    ts.add_argument("--order-col", default="doc_id")
    ts.add_argument("--n-shards", type=int, default=16)
    ts.add_argument("--shard-col", default=None,
                    help="explicit shard assignment column (overrides "
                         "the hash assignment)")
    ts.add_argument("--dtype", default="auto",
                    choices=["auto", "uint8", "uint16", "int16",
                             "int32", "int64"])

    un = sub.add_parser(
        "union",
        help="UNION ALL BY NAME across heterogeneous parquet stores: "
             "merge schemas (widening lattice), pad missing columns "
             "with NULLs, refuse lossy casts",
    )
    un.add_argument("--in", dest="in_paths", required=True,
                    help="comma-separated parquet store paths")
    un.add_argument("--out", required=True)

    cv = sub.add_parser(
        "convert",
        help="format conversion front door: parquet/orc/csv/json in, "
             "parquet/orc/csv/json out; with --schema-ddl and --bad-out "
             "poison text rows route to a DLQ instead of failing",
    )
    cv.add_argument("--in", dest="in_path", required=True)
    cv.add_argument("--out", required=True)
    cv.add_argument("--in-format", required=True,
                    choices=["parquet", "orc", "csv", "json"])
    cv.add_argument("--out-format", default="parquet",
                    choices=["parquet", "orc", "csv", "json"])
    cv.add_argument("--schema-ddl", default=None,
                    help="explicit input schema (DDL string) — inference "
                         "is an extra full scan at scale")
    cv.add_argument("--bad-out", default=None,
                    help="DLQ parquet dir for unparseable rows "
                         "(csv/json inputs; requires --schema-ddl)")
    cv.add_argument("--header", action="store_true",
                    help="csv input has a header line")
    cv.add_argument("--partition-by", default=None,
                    help="comma-separated hive partition columns for "
                         "the output")

    ex = sub.add_parser(
        "expect",
        help="data-quality gate: run declarative checks (not_null / "
             "unique / in_range / accepted_values / matches / expr / "
             "foreign_key) from a JSON spec; exit 1 if any check fails",
    )
    ex.add_argument("--in", dest="in_path", required=True)
    ex.add_argument("--checks", required=True,
                    help="JSON file: list of check objects, e.g. "
                         '[{"kind": "not_null", "col": "id"}, '
                         '{"kind": "unique", "cols": ["id"]}, '
                         '{"kind": "foreign_key", "col": "fk", '
                         '"ref": "/path/dim.parquet", "ref_col": "pk"}]')
    ex.add_argument("--report-out", default=None,
                    help="write the report DataFrame as parquet here")
    ex.add_argument("--violations-out", default=None,
                    help="write sampled violating rows here")
    ex.add_argument("--limit-per-check", type=int, default=100)

    em = sub.add_parser(
        "embed",
        help="signed feature-hashing text embeddings: documents parquet "
             "-> (vec_id, embedding) parquet ready for the index job "
             "(no model, map-only, deterministic)",
    )
    em.add_argument("--documents", required=True, help="parquet (doc_id, text, ...)")
    em.add_argument("--out", required=True)
    em.add_argument("--dim", type=int, default=64)
    em.add_argument("--normalize", action="store_true",
                    help="casefold/strip-punct/collapse-digits before hashing")

    ix = sub.add_parser(
        "index",
        help="build a persistent IVF-PQ ANN index (cluster-partitioned "
             "vectors + meta.json) from an embeddings parquet",
    )
    ix.add_argument("--embeddings", required=True)
    ix.add_argument("--index-root", required=True)
    ix.add_argument("--n-clusters", type=int, default=8)
    ix.add_argument("--pq-m", type=int, default=4)
    ix.add_argument("--pq-k", type=int, default=8)
    ix.add_argument("--codebook", choices=("first", "kmeans"), default="first")
    ix.add_argument("--kmeans-iters", type=int, default=2)

    ia = sub.add_parser(
        "index-append",
        help="append vectors to an existing index: assign against the "
             "STORED centroids/codebook (no retrain), bump meta version",
    )
    ia.add_argument("--embeddings", required=True)
    ia.add_argument("--index-root", required=True)

    idl = sub.add_parser(
        "index-delete",
        help="delete vectors by id: rewrite ONLY the affected cluster "
             "directories (partition-scoped commit), bump meta version",
    )
    idl.add_argument("--index-root", required=True)
    idl.add_argument("--ids", default=None,
                     help="comma-separated ids to delete")
    idl.add_argument("--ids-path", default=None,
                     help="parquet whose id column names the ids")

    ic = sub.add_parser(
        "index-compact",
        help="re-cluster a drifted index: Lloyd from the stored "
             "centroids, rewrite the layout; full-probe results are "
             "unchanged by construction",
    )
    ic.add_argument("--index-root", required=True)
    ic.add_argument("--iters", type=int, default=2)
    ic.add_argument("--min-balance", type=float, default=None,
                    help="only compact when balance factor exceeds this")

    irc = sub.add_parser(
        "index-recover",
        help="finish or roll back a crashed index-compact swap (the "
             "resume path mutations point at when compact.pending is "
             "present); idempotent",
    )
    irc.add_argument("--index-root", required=True)

    ist = sub.add_parser(
        "index-stats",
        help="index observability: per-cluster counts, balance factor, "
             "meta version; --verify runs the structural integrity gate",
    )
    ist.add_argument("--index-root", required=True)
    ist.add_argument("--out", default=None, help="optional parquet output")
    ist.add_argument("--verify", action="store_true")

    se = sub.add_parser(
        "search",
        help="ADC top-k search over a built index, reading only the "
             "nprobe probed cluster directories",
    )
    se.add_argument("--index-root", required=True)
    se.add_argument("--queries", required=True,
                    help="parquet with (query_id, embedding)")
    se.add_argument("--k", type=int, default=5)
    se.add_argument("--nprobe", type=int, default=1)
    se.add_argument("--rerank-factor", type=int, default=None,
                    help="two-stage search: ADC shortlists k*factor "
                         "candidates, exact cosine reranks them")
    se.add_argument("--distributed", action="store_true",
                    help="corpus-scale query sets: keep the queries a "
                         "DataFrame end to end (no driver collect)")
    se.add_argument("--out", required=True)

    args = ap.parse_args(argv)
    spark = _spark(args)

    if args.job == "plan":
        from .plans.planner import plan_replication

        msgs, audit = plan_replication(
            _read(spark, args.databases),
            prefix_string=args.prefixes,
            separator=args.separator,
            run_id=args.run_id,
            batch_id=args.batch_id,
        )
        _write(msgs, args.messages_out)
        _write(audit, args.audit_out)

    elif args.job == "export":
        from .plans.export import export_catalog

        msgs, audit = export_catalog(
            spark,
            _read(spark, args.db_messages),
            _read(spark, args.tables),
            _read(spark, args.partitions),
            threshold=args.threshold,
            batch_id=args.batch_id,
            run_id=args.run_id,
            run_date=args.run_date,
            side_channel_path=args.side_channel,
        )
        _write(msgs, args.messages_out)
        _write(audit, args.audit_out)

    elif args.job in ("import", "redrive"):
        from .plans.importer import import_events
        from .plans.redrive import redrive_dlq

        fn = import_events if args.job == "import" else redrive_dlq
        src = _read(spark, args.events if args.job == "import" else args.dlq)
        res = fn(
            spark,
            src,
            _read(spark, args.target_databases),
            _read(spark, args.target_tables),
            _read(spark, args.target_partitions),
            target_catalog_id=args.target_catalog_id,
            side_channel_path=args.side_channel,
            run_id=args.run_id,
        )
        # staged write: materialize every plan before any input path is
        # overwritten (in-place --out-root == input dirs is supported)
        _write_all(
            [
                ("databases", res.databases),
                ("tables", res.tables),
                ("partitions", res.partitions),
                ("db_import_audit", res.db_import_audit),
                ("table_import_audit", res.table_import_audit),
                ("dlq", res.dlq),
            ],
            args.out_root,
        )

    elif args.job == "near-dedup":
        from pyspark.sql import functions as F

        from .functions.dedup import (
            connected_components,
            ensure_min_parallelism,
            jaccard_pairs,
            minhash_band_pairs,
            minhash_signature_arrays,
            shingle_array,
            word_shingles,
        )

        docs = ensure_min_parallelism(_read(spark, args.documents), fraction=0.25)
        # 1. LSH candidates (band equi-join, never n^2)
        sig = minhash_signature_arrays(
            docs, "doc_id", "text", n=args.shingle_n,
            num_hashes=args.num_hashes, ensure_parallelism=False,
            normalize=args.normalize,
        )
        cand = minhash_band_pairs(sig, "doc_id", args.num_hashes, args.bands)
        # 2. exact-Jaccard verify of ONLY the candidates: semi-join the
        # shingle relation down to candidate docs, then the exact lane
        cand = cand.persist()
        cand_ids = (
            cand.select(F.col("id_a").alias("doc_id"))
            .unionByName(cand.select(F.col("id_b").alias("doc_id")))
            .dropDuplicates(["doc_id"])
        )
        sh = word_shingles(
            docs.join(cand_ids, on="doc_id", how="left_semi"),
            "doc_id", "text", n=args.shingle_n, normalize=args.normalize,
        )
        verified = (
            jaccard_pairs(sh, "doc_id", threshold=args.threshold)
            .join(cand, on=["id_a", "id_b"], how="left_semi")
            .select("id_a", "id_b")
        )
        # 3. duplicate clusters -> keeper = min doc_id per cluster
        labels = connected_components(
            verified, docs.select("doc_id"), "doc_id"
        ).persist()
        audit = labels.select(
            F.col("id").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            (F.col("id") == F.col("label")).alias("is_keeper"),
        )
        survivors = docs.join(
            audit.where("is_keeper").select("doc_id"), on="doc_id", how="left_semi"
        )
        _write(survivors, args.out)
        _write(audit, args.audit_out)
        cand.unpersist()
        labels.unpersist()

    elif args.job == "sem-dedup":
        from pyspark.sql import functions as F

        from .functions.similarity import semantic_dedup

        emb = _read(spark, args.embeddings)
        verdicts = semantic_dedup(
            emb,
            threshold=args.threshold,
            n_seeds=args.n_seeds,
            pair_blocks=args.pair_blocks,
        )
        verdicts.write.mode("overwrite").parquet(args.audit_out)
        keepers = spark.read.parquet(args.audit_out).where(F.col("keep"))
        emb.join(keepers.select("vec_id"), on="vec_id").write.mode(
            "overwrite"
        ).parquet(args.out)

    elif args.job == "zorder":
        from .functions.layout import zorder_layout

        zorder_layout(
            _read(spark, args.in_path),
            [c.strip() for c in args.cols.split(",") if c.strip()],
            n_files=args.n_files,
            bits=args.bits,
        ).write.mode("overwrite").parquet(args.out)

    elif args.job == "bucket":
        from .functions.layout import bucketed_layout

        bucketed_layout(
            _read(spark, args.in_path),
            args.table,
            [c.strip() for c in args.cols.split(",") if c.strip()],
            n_buckets=args.n_buckets,
            sort_cols=(
                [c.strip() for c in args.sort_cols.split(",") if c.strip()]
                if args.sort_cols
                else None
            ),
            path=args.path,
        )

    elif args.job == "compact":
        import json as _json

        from .functions.layout import compact_small_files

        rep = compact_small_files(
            spark,
            args.path,
            target_file_bytes=args.target_mb << 20,
            partition_filter=args.where,
            sort_cols=(
                [c.strip() for c in args.sort_cols.split(",") if c.strip()]
                if args.sort_cols
                else None
            ),
            max_parallel=args.max_parallel,
        )
        print(_json.dumps(rep))

    elif args.job == "delete":
        import json as _json

        from .functions.layout import delete_rows

        print(_json.dumps(delete_rows(
            spark, args.path, args.where, max_parallel=args.max_parallel,
        )))

    elif args.job == "reduce":
        import json as _json

        from .functions.reduction import pca_reduce

        reduced, ratios = pca_reduce(
            _read(spark, args.in_path),
            args.k,
            id_col=args.id_col,
            vec_col=args.vec_col,
            renormalize=not args.no_renormalize,
        )
        reduced.write.mode("overwrite").parquet(args.out)
        print(_json.dumps({
            "k": args.k,
            "explained_variance": ratios,
            "coverage": sum(ratios),
        }))

    elif args.job == "corpus-build":
        import json as _json

        from pyspark.sql import functions as F

        w = args.work_dir.rstrip("/")
        clean_argv = [
            "clean",
            "--documents", args.documents,
            "--out", f"{w}/cleaned",
            "--audit-out", f"{w}/clean_audit",
            "--paragraph-max-df", str(args.paragraph_max_df),
        ]
        if args.min_avg_logprob is not None:
            clean_argv += ["--min-avg-logprob", str(args.min_avg_logprob)]
        if args.span_dedup_n is not None:
            clean_argv += ["--span-dedup-n", str(args.span_dedup_n)]
        rc = main(clean_argv)
        if rc:
            return rc
        nd_argv = [
            "near-dedup",
            "--documents", f"{w}/cleaned",
            "--out", f"{w}/deduped",
            "--audit-out", f"{w}/dedup_audit",
            "--threshold", str(args.threshold),
        ]
        if args.normalize:
            nd_argv.append("--normalize")
        rc = main(nd_argv)
        if rc:
            return rc
        # optional DSIR selection toward a target corpus — AFTER
        # near-dedup (duplicates would double-count their n-grams in
        # the raw model) and BEFORE the split (selection must not
        # peek across train/eval)
        split_in = f"{w}/deduped"
        n_dsir = None
        if args.dsir_target is not None:
            if args.dsir_k is None:
                raise SystemExit("--dsir-target requires --dsir-k")
            from .functions.dsir import dsir_select

            deduped = spark.read.parquet(split_in)
            picked = dsir_select(
                deduped.select("doc_id", "text"),
                _read(spark, args.dsir_target).select("doc_id", "text"),
                k=args.dsir_k,
                seed=args.dsir_seed,
                temperature=args.dsir_temperature,
            )
            deduped.join(
                picked.select("doc_id"), on="doc_id", how="inner"
            ).write.mode("overwrite").parquet(f"{w}/selected")
            split_in = f"{w}/selected"
            n_dsir = spark.read.parquet(split_in).count()
        # near-dup clusters become the split keys, so even sub-keeper
        # survivors of the same cluster (threshold misses) can never
        # straddle train/eval
        spark.read.parquet(f"{w}/dedup_audit").select(
            "doc_id", F.col("cluster_id").alias("label")
        ).write.mode("overwrite").parquet(f"{w}/labels")
        rc = main([
            "split",
            "--in", split_in,
            "--out", args.out,
            "--splits", args.splits,
            "--labels", f"{w}/labels",
        ])
        if rc:
            return rc
        n_in = _read(spark, args.documents).count()
        n_clean = spark.read.parquet(f"{w}/cleaned").count()
        final = spark.read.parquet(args.out)
        per_split = {
            r.split: r["count"]
            for r in final.groupBy("split").count().collect()
        }
        summary = {
            "input_docs": n_in,
            "after_clean": n_clean,
            "after_near_dedup": spark.read.parquet(f"{w}/deduped").count(),
            "splits": per_split,
        }
        if n_dsir is not None:
            summary["after_dsir"] = n_dsir

        # optional tail stages, both over the TRAIN split only (eval/
        # test must keep their natural distribution and stay unsharded)
        train = final.where(F.col("split") == "train")
        if args.mix_alpha is not None and "source" in train.columns:
            from .functions.sampling import temperature_mix

            train = temperature_mix(
                train, "source", "doc_id",
                F.size(F.split(F.trim(F.col("text")), r"\s+")),
                alpha=args.mix_alpha,
            )
            train.write.mode("overwrite").parquet(f"{w}/mixed")
            train = spark.read.parquet(f"{w}/mixed")
            summary["after_mix"] = train.count()
        if args.shuffle_shards is not None:
            from .functions.sampling import write_shuffled_shards

            summary["shards"] = write_shuffled_shards(
                train, f"{args.out.rstrip('/')}_shards", "doc_id",
                n_shards=args.shuffle_shards, mode="overwrite",
            )
        print(_json.dumps(summary))

    elif args.job == "stats":
        import json as _json

        from .functions.stats import store_stats, store_summary

        if args.per_file_out:
            store_stats(spark, args.path).write.mode("overwrite").parquet(
                args.per_file_out
            )
        print(_json.dumps(store_summary(
            spark, args.path, target_file_bytes=args.target_mb << 20,
        )))

    elif args.job == "split":
        from .functions.sampling import leakage_safe_split

        splits = {}
        for part in args.splits.split(","):
            name, pct = part.split("=")
            splits[name.strip()] = int(pct)
        leakage_safe_split(
            _read(spark, args.in_path),
            splits,
            labels=(
                _read(spark, args.labels) if args.labels else None
            ),
            id_col=args.id_col,
            salt=args.salt,
        ).write.mode("overwrite").partitionBy("split").parquet(args.out)

    elif args.job == "vstore":
        import json as _json

        from . import versioned as V

        if args.timestamp is not None:
            if args.version is not None:
                raise SystemExit("pass --version OR --timestamp, not both")
            args.version = V.version_at_timestamp(args.root, args.timestamp)
        if args.op in ("append", "overwrite"):
            if not args.in_path:
                raise SystemExit(f"--op {args.op} requires --in")
            pby = (
                None if args.partition_by is None
                else [c.strip() for c in args.partition_by.split(",") if c.strip()]
            )
            fn = V.append if args.op == "append" else V.overwrite
            v = fn(_read(spark, args.in_path), args.root, partition_by=pby)
            print(_json.dumps({"version": v, "action": args.op}))
        elif args.op == "overwrite-partitions":
            if not args.in_path:
                raise SystemExit("--op overwrite-partitions requires --in")
            v = V.overwrite_partitions(_read(spark, args.in_path), args.root)
            print(_json.dumps(
                {"version": v, "action": "overwrite_partitions"}
            ))
        elif args.op == "merge":
            if not args.in_path or not args.keys:
                raise SystemExit("--op merge requires --in and --keys")
            # bloom="auto": the store-owned index prunes the probe
            # when present and covering every key column (build once
            # with --op bloom-build); otherwise the unpruned probe
            v = V.merge_into(
                spark, args.root, _read(spark, args.in_path),
                [k.strip() for k in args.keys.split(",")],
                bloom="auto",
            )
            print(_json.dumps({"version": v, "action": "merge"}))
        elif args.op == "delete":
            if not args.where:
                raise SystemExit("--op delete requires --where")
            v = V.delete_where(
                spark, args.root, args.where, mode=args.delete_mode
            )
            print(_json.dumps({
                "version": v, "action": "delete",
                "mode": args.delete_mode,
            }))
        elif args.op == "update":
            if not args.where or not args.set_exprs:
                raise SystemExit(
                    "--op update requires --where and at least one "
                    "--set COL=EXPR"
                )
            assignments = {}
            for item in args.set_exprs:
                col, eq, expr = item.partition("=")
                if not eq or not col.strip() or not expr.strip():
                    raise SystemExit(f"malformed --set {item!r}")
                assignments[col.strip()] = expr.strip()
            v = V.update_where(spark, args.root, args.where, assignments)
            print(_json.dumps({
                "version": v, "action": "update",
                "columns": sorted(assignments),
            }))
        elif args.op == "replace-where":
            # Delta's replaceWhere: the idempotent-backfill primitive —
            # predicate region swapped for --in as ONE atomic version,
            # replacement rows validated against the predicate first
            if not args.where or not args.in_path:
                raise SystemExit(
                    "--op replace-where requires --where and --in"
                )
            v = V.overwrite_where(
                spark, args.root, args.where, _read(spark, args.in_path)
            )
            print(_json.dumps({"version": v, "action": "replace_where"}))
        elif args.op == "read":
            info = None
            if args.pred:
                from .functions.skipindex import scan_with_skip_index

                idx = V.snapshot_skip_index(spark, args.root, args.version)
                # evolved tables carry mixed-schema live files: scan
                # under the snapshot's LUB schema so pruned reads see
                # every column (missing ones NULL) at the widest type
                snap_schema = V.read_versioned(
                    spark, args.root, args.version
                ).schema
                df, info = scan_with_skip_index(
                    spark, idx, _parse_preds(args.pred), schema=snap_schema
                )
            else:
                df = V.read_versioned(spark, args.root, args.version)
            if args.out:
                df.write.mode("overwrite").parquet(args.out)
                rep = {"rows": spark.read.parquet(args.out).count()}
            else:
                rep = {"rows": df.count()}
            if info is not None:
                rep.update(info)
            print(_json.dumps(rep))
        elif args.op == "count":
            if args.pred:
                # COUNT(*) WHERE ... answered (mostly) from metadata:
                # the snapshot index comes from the LOG's per-file
                # stats (zero footer I/O since r10), and files whose
                # stats PROVE every row matches contribute their
                # recorded row counts without being opened
                from .functions.skipindex import count_with_skip_index

                idx = V.snapshot_skip_index(spark, args.root, args.version)
                n, info = count_with_skip_index(
                    spark, idx, _parse_preds(args.pred)
                )
            else:
                n, info = V.count_versioned(spark, args.root, args.version)
            info["rows"] = n
            print(_json.dumps(info))
        elif args.op == "history":
            print(_json.dumps(V.history(args.root)))
        elif args.op == "changes":
            # file-level change feed through the vstore FORMAT:
            # inserts/deletes with _change/_commit_version columns
            if args.changes_from is None:
                raise SystemExit("--op changes requires --from")
            if not args.out:
                raise SystemExit("--op changes requires --out")
            from .sources.vstore_source import register_vstore_source

            register_vstore_source(spark)
            r = (
                spark.read.format("vstore")
                .option("changesFrom", str(args.changes_from))
            )
            if args.changes_to is not None:
                r = r.option("changesTo", str(args.changes_to))
            r.load(args.root).write.mode("overwrite").parquet(args.out)
            got = spark.read.parquet(args.out)
            print(_json.dumps({
                "rows": got.count(),
                "inserts": got.where("_change = 'insert'").count(),
                "deletes": got.where("_change = 'delete'").count(),
            }))
        elif args.op == "add-constraint":
            if not args.name or not args.expr:
                raise SystemExit(
                    "--op add-constraint requires --name and --expr"
                )
            v = V.add_table_constraint(spark, args.root, args.name, args.expr)
            print(_json.dumps({"version": v, "action": "set_constraint"}))
        elif args.op == "drop-constraint":
            if not args.name:
                raise SystemExit("--op drop-constraint requires --name")
            v = V.drop_table_constraint(args.root, args.name)
            print(_json.dumps({"version": v, "action": "drop_constraint"}))
        elif args.op == "constraints":
            print(_json.dumps(V.table_constraints(args.root)))
        elif args.op == "detail":
            print(_json.dumps(V.describe_detail(args.root)))
        elif args.op == "prune-log":
            # log retention: checkpoint first pins everything kept
            print(_json.dumps(V.prune_log(
                args.root, keep_last_manifests=args.keep_manifests
            )))
        elif args.op == "clone":
            if not args.out:
                raise SystemExit("--op clone requires --out DST")
            v = V.clone_table(
                args.root, args.out, version=args.version,
            )
            print(_json.dumps({
                "version": v, "action": "clone", "dst": args.out,
            }))
        elif args.op == "partitions":
            # SHOW PARTITIONS: metadata-only, one row per live tuple
            print(_json.dumps(V.show_partitions(
                args.root, version=args.version
            )))
        elif args.op == "rename-column":
            if not args.column or not args.rename_to:
                raise SystemExit(
                    "--op rename-column requires --column and --new-name"
                )
            v = V.rename_column(args.root, args.column, args.rename_to)
            print(_json.dumps({
                "version": v, "action": "rename_column",
                "from": args.column, "to": args.rename_to,
            }))
        elif args.op == "drop-column":
            if not args.column:
                raise SystemExit("--op drop-column requires --column")
            v = V.drop_column(args.root, args.column)
            print(_json.dumps({
                "version": v, "action": "drop_column",
                "column": args.column,
            }))
        elif args.op == "bloom-build":
            if not args.bloom_cols:
                raise SystemExit("--op bloom-build requires --bloom-cols")
            rep = V.build_store_bloom(
                spark, args.root,
                [c.strip() for c in args.bloom_cols.split(",")],
            )
            print(_json.dumps(rep))
        elif args.op == "bloom-refresh":
            print(_json.dumps(V.refresh_store_bloom(spark, args.root)))
        elif args.op == "rollback":
            if args.version is None:
                raise SystemExit("--op rollback requires --version")
            v = V.rollback(spark, args.root, args.version)
            print(_json.dumps({"version": v, "action": "rollback"}))
        elif args.op == "checkpoint":
            print(_json.dumps(V.checkpoint(args.root)))
        elif args.op == "optimize":
            v = V.optimize(
                spark, args.root,
                target_file_bytes=args.target_mb << 20,
                zorder_by=(
                    [c.strip() for c in args.zorder_by.split(",")]
                    if args.zorder_by else None
                ),
                small_file_bytes=(
                    args.small_mb << 20 if args.small_mb is not None
                    else None
                ),
                purge_dvs=args.purge_dvs,
                where=args.where,
            )
            print(_json.dumps({"version": v, "action": "optimize"}))
        else:
            print(_json.dumps(V.vacuum(
                args.root, keep_last=args.keep_last,
                retention_seconds=args.retention_seconds,
            )))

    elif args.job == "report":
        import json as _json

        from .functions.report import corpus_report

        card = corpus_report(
            _read(spark, args.in_path),
            id_col=args.id_col,
            text_col=args.text_col,
            axes=tuple(a.strip() for a in args.axes.split(",") if a.strip()),
            top_n=args.top_n,
            approx=args.approx,
        )
        if args.out:
            with open(args.out, "w") as fh:
                _json.dump(card, fh, indent=2)
        print(_json.dumps(card))

    elif args.job == "mix":
        from pyspark.sql import functions as F

        from .functions.sampling import temperature_mix

        temperature_mix(
            _read(spark, args.in_path),
            args.source_col,
            args.id_col,
            F.size(F.split(F.trim(F.col(args.text_col)), r"\s+")),
            alpha=args.alpha,
        ).write.mode("overwrite").parquet(args.out)

    elif args.job == "dsir":
        from .functions.dsir import dsir_select

        dsir_select(
            _read(spark, args.in_path),
            _read(spark, args.target),
            k=args.k,
            id_col=args.id_col,
            text_col=args.text_col,
            n_buckets=args.n_buckets,
            alpha=args.alpha,
            seed=args.seed,
            temperature=args.temperature,
        ).write.mode("overwrite").parquet(args.out)

    elif args.job == "bpe-train":
        import json as _json

        from .functions.bpe import train_bpe

        model = train_bpe(
            _read(spark, args.in_path),
            n_merges=args.n_merges,
            text_col=args.text_col,
            min_pair_count=args.min_pair_count,
        )
        with open(args.model_out, "w") as fh:
            _json.dump(model, fh)
        print(_json.dumps({"n_merges": len(model["merges"])}))

    elif args.job == "bpe-encode":
        import json as _json

        from .functions.bpe import bpe_encode

        with open(args.model) as fh:
            model = _json.load(fh)
        bpe_encode(
            _read(spark, args.in_path),
            model,
            id_col=args.id_col,
            text_col=args.text_col,
        ).write.mode("overwrite").parquet(args.out)

    elif args.job == "vstore-stream":
        from . import versioned as V

        reader = spark.readStream.schema(args.schema)
        if args.max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(args.max_files_per_trigger)
            )
        q = reader.parquet(args.in_path).writeStream.option(
            "checkpointLocation", args.checkpoint
        ).foreachBatch(
            # the checkpoint location IS the stream's identity: batch
            # ids are per-checkpoint, so the replay guard must scope
            # to it when several streams share one store
            (
                (lambda b, i: V.merge_stream_batch(
                    spark, b, i, args.root,
                    [k.strip() for k in args.merge_keys.split(",")],
                    query_id=args.checkpoint,
                ))
                if args.merge_keys
                else (lambda b, i: V.append_stream_batch(
                    b, i, args.root, query_id=args.checkpoint
                ))
            )
        ).trigger(availableNow=True).start()
        q.awaitTermination()

    elif args.job == "stream-score":
        import json as _json

        from .streaming.score import start_score_stream

        with open(args.model) as fh:
            model = _json.load(fh)
        q = start_score_stream(
            spark,
            model,
            in_path=args.in_path,
            schema=args.schema,
            out_root=args.out_root,
            checkpoint_path=args.checkpoint,
            keep_threshold=args.keep_threshold,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=True,
        )
        q.awaitTermination()

    elif args.job == "prepare-examples":
        import json as _json

        from pyspark.sql import functions as F

        from .functions.bpe import bpe_encode
        from .functions.sampling import pack_examples, shuffle_assignment

        with open(args.model) as fh:
            model = _json.load(fh)
        tok = bpe_encode(
            _read(spark, args.in_path), model,
            id_col=args.id_col, text_col=args.text_col,
        )
        # docs are laid head-to-tail in the seeded shuffle order
        # (shuffle_key, id) — reproducible across runs/partitionings
        laid = shuffle_assignment(
            tok, args.id_col, args.n_shards
        ).withColumn(
            "__ord", F.struct(F.col("shuffle_key"), F.col(args.id_col))
        )
        pack_examples(
            laid, "bpe_tokens", "shard", "__ord",
            window_tokens=args.window, drop_last=args.drop_last,
        ).write.mode("overwrite").partitionBy("shard").parquet(args.out)

    elif args.job == "lm-buckets":
        from .functions.text import lm_buckets

        buckets = {}
        for part in args.buckets.split(","):
            name, pct = part.split("=")
            buckets[name.strip()] = int(pct)
        lm_buckets(
            _read(spark, args.in_path),
            buckets,
            id_col=args.id_col,
            text_col=args.text_col,
            min_df=args.min_df,
        ).write.mode("overwrite").partitionBy("lm_bucket").parquet(args.out)

    elif args.job == "quality-train":
        import json as _json

        from .functions.classifier import train_quality_classifier

        model = train_quality_classifier(
            _read(spark, args.in_path),
            id_col=args.id_col,
            text_col=args.text_col,
            label_col=args.label_col,
            dim=args.dim,
            reg=args.reg,
        )
        with open(args.model_out, "w") as fh:
            _json.dump(model, fh)
        print(_json.dumps({
            "auc": model["auc"],
            "n_pos": model["n_pos"],
            "n_neg": model["n_neg"],
            "dim": model["dim"],
        }))

    elif args.job == "quality-score":
        import json as _json

        from .functions.classifier import score_quality

        with open(args.model) as fh:
            model = _json.load(fh)
        score_quality(
            _read(spark, args.in_path),
            model,
            id_col=args.id_col,
            text_col=args.text_col,
            keep_threshold=args.keep_threshold,
        ).write.mode("overwrite").parquet(args.out)

    elif args.job == "skip-index":
        import json as _json

        from .functions.skipindex import (
            build_skip_index,
            scan_with_skip_index,
        )

        upd_info = None
        if args.update:
            if not args.out:
                raise SystemExit("--update requires --out (the index)")
            from .functions.skipindex import update_skip_index

            idx, upd_info = update_skip_index(
                spark, args.path, spark.read.parquet(args.out)
            )
            # write via temp + swap: the new index reads the old one
            tmp = args.out.rstrip("/") + ".__tmp__"
            idx.write.mode("overwrite").parquet(tmp)
            import shutil as _sh

            _sh.rmtree(args.out)
            _sh.move(tmp, args.out)
            idx = spark.read.parquet(args.out)
        else:
            idx = build_skip_index(spark, args.path)
            if args.out:
                idx.write.mode("overwrite").parquet(args.out)
                idx = spark.read.parquet(args.out)
        bloom = None
        bloom_upd = None
        if args.bloom_cols:
            # explicit columns: (re)build from scratch, --update or not
            from .functions.skipindex import build_bloom_index

            bloom = build_bloom_index(
                spark, args.path,
                [c.strip() for c in args.bloom_cols.split(",")],
                m_bits=args.bloom_bits, k=args.bloom_k,
            )
            if args.bloom_out:
                bloom.write.mode("overwrite").parquet(args.bloom_out)
                bloom = spark.read.parquet(args.bloom_out)
        elif args.bloom_out:
            # a persisted bloom is ALWAYS loaded when named — and under
            # --update it is refreshed first; naming a missing index is
            # an error, never a silent scan-without-pruning
            import os as _os

            if not _os.path.isdir(args.bloom_out):
                raise SystemExit(
                    f"--bloom-out {args.bloom_out} does not exist; "
                    "build it first with --bloom-cols"
                )
            bloom = spark.read.parquet(args.bloom_out)
            if args.update:
                from .functions.skipindex import update_bloom_index

                bloom, bloom_upd = update_bloom_index(
                    spark, args.path, bloom
                )
                btmp = args.bloom_out.rstrip("/") + ".__tmp__"
                bloom.write.mode("overwrite").parquet(btmp)
                import shutil as _sh2

                _sh2.rmtree(args.bloom_out)
                _sh2.move(btmp, args.bloom_out)
                bloom = spark.read.parquet(args.bloom_out)
        preds = _parse_preds(args.pred)
        summary: dict = {
            "files": idx.select("file").distinct().count(),
            "columns": idx.select("column").distinct().count(),
        }
        if bloom is not None:
            summary["bloom_entries"] = bloom.count()
        if upd_info is not None:
            summary["update"] = upd_info
        if bloom_upd is not None:
            summary["bloom_update"] = bloom_upd
        if preds:
            got, info = scan_with_skip_index(spark, idx, preds, bloom=bloom)
            summary.update(info)
            if args.rows_out:
                got.write.mode("overwrite").parquet(args.rows_out)
                summary["rows_out"] = args.rows_out
            else:
                summary["rows"] = got.count()
        if args.join_keys:
            if bloom is None:
                raise SystemExit(
                    "--join-keys needs a bloom index (--bloom-cols to "
                    "build one or --bloom-out to load one)"
                )
            from pyspark.sql import functions as F

            from .functions.skipindex import scan_for_join

            keys = spark.read.parquet(args.join_keys)
            cols = (
                [c.strip() for c in args.join_col.split(",")]
                if args.join_col else [keys.columns[0]]
            )
            if len(cols) > 1:
                # composite key: the tuple prover (AND across columns)
                got_j, jinfo = scan_for_join(spark, idx, bloom, cols, keys)
                probe_rel = keys.select(*cols).distinct()
                on = cols
                col_label = ",".join(cols)
            else:
                col = cols[0]
                value_col = col if col in keys.columns else keys.columns[0]
                got_j, jinfo = scan_for_join(
                    spark, idx, bloom, col, keys, value_col=value_col
                )
                probe_rel = keys.select(
                    F.col(value_col).alias(col)
                ).distinct()
                on = col
                col_label = col
            summary["join"] = {
                "column": col_label,
                **jinfo,
                "rows": got_j.join(probe_rel, on=on).count(),
            }
        print(_json.dumps(summary))

    elif args.job == "shuffle":
        import json as _json

        from .functions.sampling import write_shuffled_shards

        print(_json.dumps(write_shuffled_shards(
            _read(spark, args.in_path),
            args.out,
            id_col=args.id_col,
            n_shards=args.n_shards,
            salt=args.salt,
            mode="overwrite",
        )))

    elif args.job == "token-shards":
        import json as _json

        from .functions.tokenshards import write_token_shards

        print(_json.dumps(write_token_shards(
            _read(spark, args.in_path),
            args.out,
            tokens_col=args.tokens_col,
            order_col=args.order_col,
            n_shards=args.n_shards,
            shard_col=args.shard_col,
            dtype=args.dtype,
        )))

    elif args.job == "union":
        from .functions.evolve import union_evolved

        union_evolved([
            _read(spark, p.strip())
            for p in args.in_paths.split(",") if p.strip()
        ]).write.mode("overwrite").parquet(args.out)

    elif args.job == "convert":
        import json as _json

        from .sources.formats import convert_table

        rep = convert_table(
            spark,
            args.in_path,
            args.out,
            args.in_format,
            args.out_format,
            schema=args.schema_ddl,
            bad_out=args.bad_out,
            in_options={"header": "true"} if args.header else None,
            partition_by=(
                [c.strip() for c in args.partition_by.split(",") if c.strip()]
                if args.partition_by
                else None
            ),
        )
        print(_json.dumps(rep))

    elif args.job == "expect":
        import json as _json

        from .functions.expectations import (
            check_expectations,
            checks_from_spec,
            expectation_violations,
        )

        with open(args.checks) as fh:
            spec = _json.load(fh)
        checks = checks_from_spec(spark, spec)
        df = _read(spark, args.in_path)
        report = check_expectations(df, checks)
        rows = report.collect()
        if args.report_out:
            report.write.mode("overwrite").parquet(args.report_out)
        if args.violations_out:
            expectation_violations(
                df, checks, limit_per_check=args.limit_per_check
            ).write.mode("overwrite").parquet(args.violations_out)
        print(_json.dumps({
            r.check: {"violations": r.violations, "passed": r.passed}
            for r in rows
        }))
        if any(not r.passed for r in rows):
            return 1

    elif args.job == "embed":
        from pyspark.sql import functions as F

        from .functions.similarity import hashed_tf_embedding

        emb = hashed_tf_embedding(
            _read(spark, args.documents),
            dim=args.dim,
            normalize=args.normalize,
        ).select(F.col("doc_id").alias("vec_id"), "embedding")
        _write(emb, args.out)

    elif args.job == "index":
        from .functions.ann_index import build_ann_index

        build_ann_index(
            spark,
            _read(spark, args.embeddings),
            args.index_root,
            n_clusters=args.n_clusters,
            m=args.pq_m,
            k=args.pq_k,
            codebook=args.codebook,
            kmeans_iters=args.kmeans_iters,
        )

    elif args.job == "index-append":
        from .functions.ann_index import append_to_ann_index

        meta = append_to_ann_index(
            spark, _read(spark, args.embeddings), args.index_root
        )
        print(f"index version {meta['version']}", file=sys.stderr)

    elif args.job == "index-delete":
        from .functions.ann_index import delete_from_ann_index

        if (args.ids is None) == (args.ids_path is None):
            raise SystemExit("index-delete needs exactly one of --ids / --ids-path")
        ids = (
            [int(x) for x in args.ids.split(",")]
            if args.ids is not None
            else _read(spark, args.ids_path)
        )
        res = delete_from_ann_index(spark, args.index_root, ids)
        print(
            f"removed {res['removed']} from clusters "
            f"{res['affected_clusters']}; index version {res['meta_version']}",
            file=sys.stderr,
        )

    elif args.job == "index-compact":
        from .functions.ann_index import compact_ann_index

        res = compact_ann_index(
            spark, args.index_root, n_iters=args.iters,
            min_balance=args.min_balance,
        )
        print(
            f"compacted={res['compacted']} index version {res['meta_version']}",
            file=sys.stderr,
        )

    elif args.job == "index-recover":
        from .functions.ann_index import recover_ann_index

        print(recover_ann_index(args.index_root), file=sys.stderr)

    elif args.job == "index-stats":
        from .functions.ann_index import ann_index_stats, verify_ann_index

        stats = ann_index_stats(spark, args.index_root)
        if args.out:
            _write(stats, args.out)
        else:
            stats.show(truncate=False)
        if args.verify:
            print(verify_ann_index(spark, args.index_root), file=sys.stderr)

    elif args.job == "search":
        from .functions.ann_index import search_ann_index, search_ann_index_df

        if args.distributed:
            hits = search_ann_index_df(
                spark, args.index_root, _read(spark, args.queries),
                k=args.k, nprobe=args.nprobe,
                rerank_factor=args.rerank_factor,
            )
        else:
            hits = search_ann_index(
                spark,
                args.index_root,
                _read(spark, args.queries),
                k=args.k,
                nprobe=args.nprobe,
                rerank_factor=args.rerank_factor,
            )
        _write(hits, args.out)

    elif args.job == "clean":
        from pyspark.sql import functions as F

        from .functions.dedup import exact_dedup
        from .functions.text import (
            dedup_paragraphs,
            fingerprint,
            quality_filter_verdict,
            unigram_logprob,
        )

        from .functions.dedup import ensure_min_parallelism

        # split-guard: a single-file corpus parquet would serialize the
        # shingle/verdict lanes onto one task (same guard every registry
        # doc lane uses)
        docs = ensure_min_parallelism(_read(spark, args.documents), fraction=0.25)
        extra_cols = [c2 for c2 in docs.columns if c2 not in ("doc_id", "text")]
        # 1. corpus-level boilerplate removal (paragraph df cap)
        depara = dedup_paragraphs(docs, max_df=args.paragraph_max_df)
        # 1b. optional cross-document substring-span dedup over the
        # boilerplate-free text: duplicated >=n-token runs are cut
        # (keep-one), catching repeats paragraph layout hides
        if args.span_dedup_n is not None:
            from .functions.dedup import cut_spans, duplicated_spans

            depara = cut_spans(
                depara, duplicated_spans(depara, n=args.span_dedup_n)
            ).select(
                "doc_id",
                F.col("text_dedup").alias("text"),
                "n_paragraphs",
                "n_removed",
                F.col("tokens_removed").alias("__span_tok"),
            )
        else:
            depara = depara.withColumn("__span_tok", F.lit(0))
        # 2. quality verdicts over the boilerplate-free text
        judged = depara.select(
            "doc_id", "text", "n_paragraphs", "n_removed", "__span_tok",
            quality_filter_verdict("text").alias("__v"),
        )
        if args.min_avg_logprob is not None:
            # 2b. corpus-statistics cut over the SAME boilerplate-free
            # text the verdicts judged: the unigram model trains on the
            # whole (post-paragraph-dedup) corpus, then low scorers drop
            lp = unigram_logprob(depara.select("doc_id", "text"))
            judged = judged.join(
                lp.select("doc_id", "avg_logprob"), on="doc_id", how="left"
            ).select(
                "doc_id", "text", "n_paragraphs", "n_removed", "__span_tok",
                F.struct(
                    (
                        F.col("__v.keep")
                        & (
                            F.coalesce(
                                F.col("avg_logprob")
                                >= F.lit(args.min_avg_logprob),
                                F.lit(False),  # empty docs have no score
                            )
                        )
                    ).alias("keep"),
                    F.when(
                        F.coalesce(
                            F.col("avg_logprob") < F.lit(args.min_avg_logprob),
                            F.lit(True),
                        ),
                        F.array_append(
                            F.col("__v.reasons"), F.lit("low_unigram_logprob")
                        ),
                    ).otherwise(F.col("__v.reasons")).alias("reasons"),
                ).alias("__v"),
            )
        kept = judged.where(F.col("__v.keep"))
        # 3. exact dedup on the normalized fingerprint (min doc_id wins)
        fp = kept.select("doc_id", fingerprint("text").alias("__fp"))
        keepers = exact_dedup(fp, ["__fp"], "doc_id")
        if args.keep_singletons_only:
            keepers = keepers.where(F.col("dup_count") == 1)
        survivors = kept.join(
            F.broadcast(keepers.select(F.col("keep_id").alias("doc_id"))),
            on="doc_id", how="left_semi",
        )
        # cleaned corpus keeps original non-text columns via join-back
        out = survivors.select("doc_id", "text")
        if extra_cols:
            out = out.join(docs.select("doc_id", *extra_cols), on="doc_id")
        # audit: one row per INPUT doc with its fate + named reasons
        audit = judged.select(
            "doc_id",
            "n_paragraphs",
            F.col("n_removed").alias("n_boilerplate_paragraphs"),
            F.col("__span_tok").alias("n_span_tokens_removed"),
            F.col("__v.keep").alias("passed_quality"),
            F.col("__v.reasons").alias("reasons"),
        )
        _write(out, args.out)
        _write(audit, args.audit_out)

    elif args.job == "stream":
        from .streaming.ingest import start_event_stream

        q = start_event_stream(
            spark,
            args.events_dir,
            args.state_root,
            checkpoint_path=args.checkpoint,
            target_catalog_id=args.target_catalog_id,
            side_channel_path=args.side_channel,
            available_now=args.available_now,
            retain_versions=args.retain_versions,
        )
        q.awaitTermination()

    elif args.job == "stream-dedup":
        from .streaming.neardedup import start_near_dedup_stream

        q = start_near_dedup_stream(
            spark,
            docs_path=args.docs_dir,
            state_root=args.state_root,
            checkpoint_path=args.checkpoint,
            threshold=args.threshold,
            num_hashes=args.num_hashes,
            bands=args.bands,
            normalize=args.normalize,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=args.available_now,
            close_every=args.close_every,
        )
        q.awaitTermination()

    elif args.job == "stream-sem-dedup":
        from .streaming.semdedup import start_semantic_dedup_stream

        q = start_semantic_dedup_stream(
            spark,
            docs_path=args.docs_dir,
            index_root=args.index_root,
            state_root=args.state_root,
            checkpoint_path=args.checkpoint,
            threshold=args.threshold,
            k=args.k,
            nprobe=args.nprobe,
            normalize=args.normalize,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=args.available_now,
            close_every=args.close_every,
        )
        q.awaitTermination()

    elif args.job == "stream-media":
        from .streaming.media import start_media_stream

        q = start_media_stream(
            spark,
            blobs_path=args.blobs_dir,
            out_root=args.out_root,
            checkpoint_path=args.checkpoint,
            kind=args.kind,
            every=args.every,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=args.available_now,
        )
        q.awaitTermination()

    elif args.job == "stream-gate":
        import json as _json

        from .functions.expectations import checks_from_spec
        from .streaming.quality import start_quality_gate_stream

        with open(args.checks) as fh:
            spec = _json.load(fh)
        q = start_quality_gate_stream(
            spark,
            in_path=args.in_path,
            schema=args.schema_ddl,
            checks=checks_from_spec(spark, spec),
            out_root=args.out_root,
            checkpoint_path=args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=args.available_now,
        )
        q.awaitTermination()

    elif args.job == "dedup-compact":
        import json as _json

        from .streaming.neardedup import compact_dedup_state

        report = compact_dedup_state(
            spark,
            state_root=args.state_root,
            keep_last=args.keep_last,
            rows_per_file=args.rows_per_file,
        )
        print(_json.dumps(report))

    elif args.job == "dedup-close":
        import json as _json

        from .streaming.close import close_near_dedup_state

        report = close_near_dedup_state(
            spark,
            state_root=args.state_root,
            num_hashes=args.num_hashes,
            threshold=args.threshold,
            mode=args.mode,
        )
        print(_json.dumps(report))

    elif args.job == "semdedup-close":
        import json as _json

        from .streaming.close import close_semantic_dedup_state

        report = close_semantic_dedup_state(
            spark,
            state_root=args.state_root,
            index_root=args.index_root,
            threshold=args.threshold,
            pair_blocks=args.pair_blocks,
            mode=args.mode,
        )
        print(_json.dumps(report))

    return 0


if __name__ == "__main__":
    sys.exit(main())
