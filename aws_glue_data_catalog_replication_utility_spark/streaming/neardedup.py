"""Streaming incremental near-duplicate detection (MinHash/LSH).

The batch plane has the full fuzzy-dedup chain (`near-dedup` CLI:
LSH candidates -> exact verify -> connected components); this module is
its STREAMING shape: each micro-batch of documents is checked against a
persisted signature store of every prior KEEPER, so a near-duplicate of
anything already ingested is flagged the moment it arrives — the
incremental corpus-construction loop (ingest -> dedup -> keep) instead
of a nightly full-corpus job.

Semantics (greedy keep-first, the standard incremental variant):
- a batch doc whose estimated Jaccard against ANY stored keeper clears
  `threshold` is a duplicate of that keeper (best match wins: highest
  estimate, ties to the smallest keeper id);
- surviving docs are near-deduped WITHIN the batch the same way
  (smallest id in a matching pair keeps);
- only keepers' band signatures enter the store, so later arrivals
  compare against keepers, never against dropped duplicates.
Unlike the batch pipeline this does NOT compute transitive closure
across batches — a chain A~B~C where A never bucket-matches C directly
keeps both A's and C's verdicts greedy. That is the documented price of
O(batch) incremental work; run the batch `near-dedup` job for a
full-closure re-sweep.

Similarity is the MinHash estimator itself (fraction of equal signature
components, `est` has granularity 1/num_hashes) over the SAME portable
hash family as the batch lanes (functions/dedup.py), so stream and
batch agree on signatures bit-for-bit.

State & replay: the store is parquet under
`{state_root}/signatures/batch_id=N` (keepers' exploded band keys +
signature) and decisions under `{state_root}/decisions/batch_id=N`, one
row per input doc (doc_id, keep, dup_of, est, batch_id). A replayed
micro-batch OVERWRITES its own batch_id directories (the
`_append_batch` discipline, streaming/ingest.py) — effectively-once
without coordination.

Scale: per batch the work is one narrow signature projection over the
batch, one equi-join of the batch's band keys against the store
(shuffle bounded by band-bucket sizes — never doc x store), and one
within-batch band self-join. The store scan is the incremental cost;
it is append-only, partitioned by batch for retention/compaction, and
carries only keepers (bands x num_hashes ints per doc). At 100 TB the
same plan holds because every join is banded; the store read stays
columnar and the band-key shuffle is the only wide edge. A long-lived
stream accretes one directory (x up to shuffle-partitions files) per
micro-batch; `compact_dedup_state` collapses the cold tail into one
consolidated store partition (and coalesces the decision logs) without
changing a single verdict — run it on whatever cadence keeps the store
listing O(1)-ish.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DOC_SCHEMA = "doc_id long, text string"


def _banded_signatures(
    docs: DataFrame,
    n: int,
    num_hashes: int,
    bands: int,
    normalize: bool,
) -> DataFrame:
    """(doc_id, band, band_key, sig): one exploded band-bucket row per
    (doc, band), carrying the full signature array for the estimator.
    Docs with fewer than n tokens have no shingles and are excluded —
    they cannot near-dup anything (same exclusion as the batch lanes)."""
    from ..functions.dedup import minhash_signature_arrays

    rows = num_hashes // bands
    if rows * bands != num_hashes:
        raise ValueError("bands must divide num_hashes")
    sigs = minhash_signature_arrays(
        docs,
        n=n,
        num_hashes=num_hashes,
        ensure_parallelism=False,  # streaming batch: no df.rdd probe
        normalize=normalize,
    )
    keys = F.array(
        *[
            F.concat_ws("|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)])
            for b in range(bands)
        ]
    )
    sig = F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)])
    return sigs.select(
        "doc_id",
        F.posexplode(keys).alias("band", "band_key"),
        sig.alias("sig"),
    )


def _est_col(a: str, b: str, num_hashes: int) -> F.Column:
    """The MinHash Jaccard estimator: fraction of equal components."""
    return (
        F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(num_hashes)
    ).alias("est")


def _best_match(cands: DataFrame, num_hashes: int, threshold: float) -> DataFrame:
    """One row per duplicate doc: its best matching keeper (max est,
    ties to the smallest keeper id)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("est").desc(), F.col("dup_of").asc()
    )
    return (
        cands.where(F.col("est") >= threshold)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def start_near_dedup_stream(
    spark: SparkSession,
    docs_path: str | None = None,
    state_root: str = "",
    checkpoint_path: str = "",
    n: int = 5,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.7,
    normalize: bool = False,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    source=None,
    close_every: int | None = None,
):
    """Start the incremental near-dedup stream over a documents
    directory (ndjson {doc_id, text} files; one file = one micro-batch
    under max_files_per_trigger=1) or any adapter with
    `load(spark) -> streaming DataFrame[doc_id, text]`. Returns the
    StreamingQuery; read verdicts with `read_dedup_decisions` and the
    keeper signature store grows under `{state_root}/signatures`.

    close_every=N runs the transitive-closure pass
    (streaming/close.close_near_dedup_state) inline after every Nth
    micro-batch — foreachBatch is serial, so the stream is effectively
    stopped while it runs, which is exactly the close pass's contract.
    Stream-only users converge to the batch clusters without a
    maintenance scheduler; leave None to run `dedup-close` on your own
    cadence.

    Crash-replay window (documented EVENTUAL-CONVERGENCE behavior):
    the inline close runs BEFORE the micro-batch's checkpoint offsets
    commit, so a crash in that window replays the batch over the
    post-closure state — the replayed batch overwrites ITS OWN
    directories with greedy verdicts while earlier directories stay
    closed. The next closure pass re-folds it (the close watermark is
    inclusive of its own batch for exactly this case) and converges to
    the same clusters; pinned by
    tests/test_close.py::test_replay_after_inline_close_converges."""
    if os.path.exists(f"{state_root}/{_COMPACT_TMP}/MANIFEST.json"):
        raise RuntimeError(
            f"{state_root} has a pending compaction (a prior "
            "compact_dedup_state crashed mid-swap); run "
            "compact_dedup_state again to complete it before streaming"
        )
    if source is not None:
        stream = source.load(spark)
    else:
        if docs_path is None:
            raise ValueError("pass either docs_path or a source adapter")
        reader = spark.readStream.schema(DOC_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        stream = reader.json(docs_path)

    sig_root = f"{state_root}/signatures"
    dec_root = f"{state_root}/decisions"

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        banded = _banded_signatures(batch_df, n, num_hashes, bands, normalize)
        banded = banded.localCheckpoint(eager=True)  # 3 consumers below
        try:
            # --- 1. duplicates of PRIOR keepers (earlier batches only:
            # a replayed batch must not match its own previous write)
            store = None
            if os.path.exists(sig_root):
                store = (
                    spark.read.option("basePath", sig_root)
                    .parquet(sig_root)
                    .where(F.col("batch_id") < batch_id)
                )
            if store is not None:
                prior = (
                    banded.alias("new")
                    .join(
                        store.alias("old"),
                        on=["band", "band_key"],
                    )
                    .select(
                        F.col("new.doc_id").alias("doc_id"),
                        F.col("old.doc_id").alias("dup_of"),
                        _est_col("new.sig", "old.sig", num_hashes),
                    )
                )
                dup_prior = _best_match(
                    prior.dropDuplicates(["doc_id", "dup_of"]), num_hashes, threshold
                )
            else:
                dup_prior = None

            # --- 2. within-batch duplicates among the survivors
            survivors = banded
            if dup_prior is not None:
                survivors = banded.join(
                    dup_prior.select("doc_id"), on="doc_id", how="left_anti"
                )
            a, b = survivors.alias("a"), survivors.alias("b")
            intra = (
                a.join(b, on=["band", "band_key"])
                .where(F.col("a.doc_id") > F.col("b.doc_id"))
                .select(
                    F.col("a.doc_id").alias("doc_id"),
                    F.col("b.doc_id").alias("dup_of"),
                    _est_col("a.sig", "b.sig", num_hashes),
                )
                .dropDuplicates(["doc_id", "dup_of"])
            )
            dup_intra = _best_match(intra, num_hashes, threshold)

            dups = (
                dup_prior.unionByName(dup_intra) if dup_prior is not None else dup_intra
            )
            # a doc can appear in both lanes; keep its best verdict
            dups = _best_match(dups, num_hashes, 0.0)

            # --- 3. verdicts: one row per input doc (docs too short to
            # shingle keep trivially — nothing to compare)
            decisions = (
                batch_df.select("doc_id")
                .dropDuplicates()
                .join(dups, on="doc_id", how="left")
                .select(
                    "doc_id",
                    F.col("dup_of").isNull().alias("keep"),
                    "dup_of",
                    "est",
                    F.lit(batch_id).alias("batch_id"),
                )
            )
            decisions.write.mode("overwrite").parquet(
                f"{dec_root}/batch_id={batch_id}"
            )

            # --- 4. only keepers' signatures enter the store
            keepers = banded.join(
                dups.select("doc_id"), on="doc_id", how="left_anti"
            )
            keepers.write.mode("overwrite").parquet(
                f"{sig_root}/batch_id={batch_id}"
            )
            # --- 5. dropped docs' signatures land in the COLD log —
            # never probed by the stream, but the closure pass
            # (streaming/close.close_near_dedup_state) needs them: a
            # chain A~B~C where B was dropped is only discoverable if
            # B's signatures survive somewhere. Same overwrite-on-
            # replay discipline as the store.
            banded.join(dups.select("doc_id"), on="doc_id", how="left_semi")\
                .write.mode("overwrite").parquet(
                    f"{state_root}/dup_signatures/batch_id={batch_id}"
                )
        finally:
            banded.unpersist()
        if close_every and (batch_id + 1) % close_every == 0:
            from .close import close_near_dedup_state

            close_near_dedup_state(
                spark, state_root, num_hashes=num_hashes, threshold=threshold
            )

    writer = stream.writeStream.foreachBatch(dedup_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_dedup_decisions(spark: SparkSession, state_root: str) -> DataFrame:
    """All per-doc verdicts across batches: (doc_id, keep, dup_of, est,
    batch_id)."""
    root = f"{state_root}/decisions"
    return spark.read.option("basePath", root).parquet(root)


# ---------------------------------------------------------------------------
# state compaction — the store is append-only, one directory (and up to
# shuffle-partitions files) per micro-batch; a long-lived stream turns
# the every-batch store scan into a small-files problem
# ---------------------------------------------------------------------------

_COMPACT_TMP = ".compact_tmp"


def _batch_dirs(root: str) -> list[int]:
    import re

    if not os.path.isdir(root):
        return []
    ids = []
    for name in os.listdir(root):
        m = re.fullmatch(r"batch_id=(\d+)", name)
        if m and os.path.isdir(os.path.join(root, name)):
            ids.append(int(m.group(1)))
    return sorted(ids)


def _parquet_files(path: str) -> int:
    return sum(
        1
        for base, _, names in os.walk(path)
        for f in names
        if f.endswith(".parquet")
    )


def _complete_compaction(state_root: str, manifest: dict) -> None:
    """Apply a fully-written compaction manifest. Every step is
    guarded by existence checks, so this is idempotent and resumable
    from any crash point: the tmp tree holds ALL compacted data until
    its directory is renamed into place, and a rename that already
    happened is detected by the tmp path being gone."""
    import shutil

    tmp_root = f"{state_root}/{_COMPACT_TMP}"
    for plane in ("signatures", "dup_signatures"):
        sig = manifest.get(plane)
        if sig is not None:
            tmp_dir = f"{tmp_root}/{plane}/batch_id={sig['target']}"
            dest = f"{state_root}/{plane}/batch_id={sig['target']}"
            if os.path.exists(tmp_dir):
                for b in sig["sources"]:
                    src = f"{state_root}/{plane}/batch_id={b}"
                    if os.path.exists(src):
                        shutil.rmtree(src)
                os.rename(tmp_dir, dest)
            # else: already swapped in a prior (crashed) completion
    for b in manifest.get("decisions", []):
        tmp_dir = f"{tmp_root}/decisions/batch_id={b}"
        dest = f"{state_root}/decisions/batch_id={b}"
        if os.path.exists(tmp_dir):
            if os.path.exists(dest):
                shutil.rmtree(dest)
            os.rename(tmp_dir, dest)
    shutil.rmtree(tmp_root)


def compact_dedup_state(
    spark: SparkSession,
    state_root: str,
    keep_last: int = 1,
    rows_per_file: int = 4_000_000,
) -> dict:
    """Compact the near-dedup stream's state (run while the stream is
    STOPPED — the stream refuses to start over a pending compaction).

    - `signatures` (the hot path: re-read by EVERY micro-batch): all
      batch directories except the newest `keep_last` merge into ONE
      directory keyed at the newest compacted batch_id. The replay
      guard (`batch_id < current`) is preserved: every merged row came
      from a batch <= target, and target is strictly below every kept
      or future batch id — and `keep_last >= 1` keeps the only batch a
      foreachBatch restart can ever re-deliver (the last, possibly
      uncommitted one) out of the merge, so its overwrite-on-replay
      still targets its own directory.
    - `decisions` (the output log): per-batch directories are KEPT —
      their directory batch_id is the per-doc history, and a hive read
      resolves the partition value over any in-file column — but each
      compactable directory is coalesced to one file.

    Crash safety: the consolidated tmp tree + a manifest are fully
    written BEFORE any source directory is touched; the swap
    (`_complete_compaction`) is idempotent, and a crashed run resumes
    by calling this function again (it completes the pending manifest
    first). Returns a report of directory/file counts."""
    import json
    import shutil

    tmp_root = f"{state_root}/{_COMPACT_TMP}"
    manifest_path = f"{tmp_root}/MANIFEST.json"
    resumed = False
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            _complete_compaction(state_root, json.load(fh))
        resumed = True
    elif os.path.exists(tmp_root):
        shutil.rmtree(tmp_root)  # tmp without manifest: harmless debris

    sig_root = f"{state_root}/signatures"
    dec_root = f"{state_root}/decisions"
    report = {
        "resumed_pending": resumed,
        "signature_dirs_before": len(_batch_dirs(sig_root)),
        "signature_files_before": _parquet_files(sig_root),
        "decision_files_before": _parquet_files(dec_root),
    }

    manifest: dict = {}
    # both signature planes compact the same way: the stream's hot
    # probe store and the closure pass's cold dropped-doc log (never
    # probed per batch, but a long-lived stream accretes its dirs at
    # the same rate)
    for plane in ("signatures", "dup_signatures"):
        plane_root = f"{state_root}/{plane}"
        sig_ids = _batch_dirs(plane_root)
        sig_comp = (
            sig_ids[: len(sig_ids) - keep_last] if keep_last > 0 else sig_ids
        )
        if len(sig_comp) >= 2:
            target = sig_comp[-1]
            merged = spark.read.parquet(
                *[f"{plane_root}/batch_id={b}" for b in sig_comp]
            )
            n = merged.count()
            nf = max(1, -(-n // rows_per_file))
            merged.coalesce(nf).write.mode("overwrite").parquet(
                f"{tmp_root}/{plane}/batch_id={target}"
            )
            manifest[plane] = {"sources": sig_comp, "target": target}

    dec_ids = _batch_dirs(dec_root)
    dec_comp = [
        b
        for b in (dec_ids[: len(dec_ids) - keep_last] if keep_last > 0 else dec_ids)
        if _parquet_files(f"{dec_root}/batch_id={b}") > 1
    ]
    for b in dec_comp:
        # read WITHOUT basePath: the in-file batch_id column (written by
        # dedup_batch) survives, so the rewritten file carries the same
        # history the directory name asserts
        spark.read.parquet(f"{dec_root}/batch_id={b}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp_root}/decisions/batch_id={b}")
    if dec_comp:
        manifest["decisions"] = dec_comp

    if manifest:
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh)
        _complete_compaction(state_root, manifest)

    report.update(
        compacted=bool(manifest),
        signature_dirs_after=len(_batch_dirs(sig_root)),
        signature_files_after=_parquet_files(sig_root),
        decision_files_after=_parquet_files(dec_root),
    )
    return report
