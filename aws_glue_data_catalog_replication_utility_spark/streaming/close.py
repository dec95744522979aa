"""Transitive-closure maintenance for the incremental dedup streams.

The streaming loops (streaming/neardedup.py, streaming/semdedup.py) are
GREEDY keep-first by design: each batch compares against prior KEEPERS
only, so a chain A~B~C where B was dropped as A's duplicate never links
C to the cluster — A and C both stay keepers, and a stream-only user
never converges to the batch pipeline's connected-component clusters.
The batch jobs (`near-dedup`, `sem-dedup`) are the full re-sweep; this
module is the MIDDLE path: an incremental closure pass over the state
the stream has already accumulated — no re-shingling, no re-embedding,
no touching the original corpus.

It works because the streams persist the dropped docs' comparable state
in a cold log the hot path never reads (`dup_signatures/` banded
MinHash rows, `dup_vectors/` embeddings): union the cold log with the
keeper store, regenerate the FULL pair set (band equi-join with the
exact estimator for MinHash; the blocked intra-cluster triangle join
with exact cosine for embeddings), add the stream's own recorded
verdict edges, and run connected components. Component label = smallest
member id — the same keeper rule as every batch lane — so the closed
verdicts equal what the batch pipeline would produce over the same pair
graph.

The rewrite is SURGICAL: only decision/signature batch directories that
actually contain moved rows are rewritten (others stay byte-identical),
demoted keepers' state moves store -> cold log and promoted keepers'
moves cold log -> store (near), or is deleted from / appended to the
ANN index (semantic). Run with the stream STOPPED and its checkpoint
committed — the pass rewrites the same directories a replayed batch
would.

Scale: pair regeneration is the banded/clustered join the batch lanes
already use (never corpus²); CC is the alternating-star O(log n)
formulation via `connected_components`; the per-directory rewrites are
O(affected dirs) driver-scheduled jobs, bounded by stream length and
kept small by `compact_dedup_state`.

Cadence: every N batches or nightly. Passes are INCREMENTAL by
default (r09): each completed pass persists a close-watermark batch id
in the state root, and the next pass regenerates pairs only over the
bands/clusters that contain docs arrived SINCE the watermark — sound
because a completed pass leaves every qualifying pair among previously
seen docs reflected in the recorded verdict edges (each non-keeper
points at its component label), so a NEW qualifying pair must involve
a new doc, whose bands/clusters are exactly the touched set. The
watermark is INCLUSIVE (>=): the inline `close_every` hook runs before
the micro-batch's offsets commit, so a crash in that window replays
the watermark batch with greedy verdicts — re-folding that one batch
is the self-heal. A parameter change (threshold, hash count, ANN
centroids) invalidates the watermark and falls back to the full
re-fold, which also remains available via mode="full".
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


def _wm_path(state_root: str, kind: str) -> str:
    return os.path.join(state_root, f"close_watermark_{kind}.json")


def _read_watermark(state_root: str, kind: str, params: dict) -> dict | None:
    """The last completed pass's watermark, or None when absent or when
    `params` differ from the recorded ones (a changed threshold/hash
    family voids the no-new-pairs-among-old-docs invariant)."""
    p = _wm_path(state_root, kind)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        wm = json.load(fh)
    if wm.get("params") != params:
        return None
    return wm


def _write_watermark(
    state_root: str, kind: str, params: dict, batch_id: int
) -> None:
    """Atomic (tmp+rename) so a crash mid-write leaves the previous
    mark; written only AFTER a pass completes, so a crash mid-pass
    re-folds a superset next time (idempotent, never skips work)."""
    if batch_id is None:  # empty decision log: nothing to mark
        return
    p = _wm_path(state_root, kind)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"batch_id": int(batch_id), "params": params}, fh)
    os.replace(tmp, p)


def _resolve_mode(mode: str, wm: dict | None) -> bool:
    """-> incremental? 'auto' goes incremental iff a compatible
    watermark exists; 'incremental' demands one; 'full' never."""
    if mode not in ("auto", "full", "incremental"):
        raise ValueError(f"mode must be auto|full|incremental, got {mode!r}")
    if mode == "full":
        return False
    if mode == "incremental" and wm is None:
        raise ValueError(
            "mode='incremental' but no compatible close watermark exists "
            "(first pass, or parameters changed) — run mode='auto' or "
            "'full'"
        )
    return wm is not None


def _closed_decisions(
    decisions: DataFrame,
    labels: DataFrame,
    pairs: DataFrame,
    score_col: str,
) -> DataFrame:
    """Rewrite verdicts under component labels: keeper iff doc == its
    component label; a dropped doc's dup_of is the label, its score the
    direct pair's (doc, label) value when one exists, NULL when the
    link is transitive. Docs whose verdict is unchanged keep their row
    values bit-identical (same dup_of -> same recorded score)."""
    direct = pairs.groupBy("doc_id", "dup_of").agg(
        F.max(score_col).alias("__direct")
    )
    d = (
        decisions.select(
            "doc_id",
            F.col("dup_of").alias("__old_dup"),
            F.col(score_col).alias("__old_score"),
            "batch_id",
        )
        .join(labels, on="doc_id")
        .withColumn(
            "__new_dup",
            F.when(
                F.col("doc_id") == F.col("label"), F.lit(None).cast("long")
            ).otherwise(F.col("label")),
        )
        .join(
            direct.select(
                "doc_id",
                F.col("dup_of").alias("__new_dup"),
                "__direct",
            ),
            on=["doc_id", "__new_dup"],
            how="left",
        )
    )
    return d.select(
        "doc_id",
        F.col("__new_dup").isNull().alias("keep"),
        F.col("__new_dup").alias("dup_of"),
        F.when(
            F.col("__new_dup").eqNullSafe(F.col("__old_dup")),
            F.col("__old_score"),
        )
        .otherwise(F.col("__direct"))
        .alias(score_col),
        "batch_id",
    )


def _rewrite_batch_dirs(
    spark: SparkSession,
    root: str,
    new_rows: DataFrame,
    affected: list[int],
    batch_col_in_file: bool = True,
) -> int:
    """Overwrite only the affected `batch_id=N` directories under
    `root` with their slice of `new_rows`; `batch_col_in_file` keeps or
    drops the batch_id column to match the stream's original file
    layout (decisions carry it in-file, signature/vector stores carry
    it only as the partition directory). A slice that comes back empty
    removes the directory. Returns directories rewritten."""
    n = 0
    for b in sorted(affected):
        dest = f"{root}/batch_id={b}"
        slice_df = new_rows.where(F.col("batch_id") == b)
        if not batch_col_in_file:
            slice_df = slice_df.drop("batch_id")
        if slice_df.limit(1).count():
            slice_df.write.mode("overwrite").parquet(dest)
        elif os.path.isdir(dest):
            shutil.rmtree(dest)
        n += 1
    return n


def close_near_dedup_state(
    spark: SparkSession,
    state_root: str,
    num_hashes: int = 12,
    threshold: float = 0.7,
    use_star: bool = True,
    mode: str = "auto",
) -> dict:
    """Fold the near-dedup stream's accumulated state into transitive
    closure: one keeper (smallest doc id) per connected component of
    the >= threshold pair graph over EVERY doc the stream has seen —
    the verdict set a batch `near-dedup` run over the same signatures
    would produce. Decision directories with changed verdicts are
    rewritten in place; demoted keepers' signatures move to the cold
    log and promoted docs' signatures into the store, so the NEXT
    micro-batch dedups against exactly the closed keeper set.

    `mode`: 'auto' (default) runs INCREMENTALLY when a compatible
    watermark from a prior pass exists — the band self-join's input is
    restricted to signatures sharing a band with docs arrived since
    the (inclusive) watermark batch, so a `close_every=N` stream does
    O(new + touched-band) pair work per pass instead of O(all
    accumulated state) (the r08 verdict's stream-lifetime cost). The
    recorded verdict edges carry the previous closure's component
    structure, so the restricted pass is verdict-identical to the full
    one (pinned in tests). 'full' forces the complete re-fold;
    'incremental' demands a watermark.

    Reference tie-in: the batch pipeline's pair->CC->keeper step
    (functions/dedup.dedup_clusters) applied to the stream's own state.
    Returns a report; run with the stream stopped."""
    from ..functions.dedup import connected_components, connected_components_star

    sig_root = f"{state_root}/signatures"
    dup_root = f"{state_root}/dup_signatures"
    dec_root = f"{state_root}/decisions"
    if not os.path.isdir(dec_root):
        raise ValueError(f"no dedup state at {state_root}")

    from .neardedup import _est_col, read_dedup_decisions

    params = {"num_hashes": num_hashes, "threshold": threshold}
    wm = _read_watermark(state_root, "near", params)
    incremental = _resolve_mode(mode, wm)

    # a VALUE, not a plan: the decision files are rewritten below, and
    # a lazy relation would re-read them mid-rewrite
    decisions = read_dedup_decisions(spark, state_root).select(
        "doc_id", "keep", "dup_of", "est", "batch_id"
    ).localCheckpoint(eager=True)
    max_bid = decisions.agg(F.max("batch_id")).collect()[0][0]

    def read_sigs(root: str) -> DataFrame | None:
        if not os.path.isdir(root):
            return None
        return (
            spark.read.option("basePath", root)
            .parquet(root)
            .select("doc_id", "band", "band_key", "sig", "batch_id")
        )

    store = read_sigs(sig_root)
    cold = read_sigs(dup_root)
    if store is None:
        raise ValueError(f"no signature store at {sig_root}")
    all_sigs = store if cold is None else store.unionByName(cold)

    n_new = None
    if incremental:
        # INCLUSIVE >=: the watermark batch itself may have been
        # replayed with greedy verdicts after the closing pass (the
        # inline close runs before the checkpoint offsets commit);
        # re-folding that one batch is the self-heal.
        new_docs = (
            decisions.where(F.col("batch_id") >= wm["batch_id"])
            .select("doc_id")
            .distinct()
        )
        n_new = new_docs.count()
        new_sigs = all_sigs.join(new_docs, on="doc_id", how="left_semi")
        touched = new_sigs.select("band", "band_key").distinct()
        cand = all_sigs.join(
            touched, on=["band", "band_key"], how="left_semi"
        ).localCheckpoint(eager=True)
    else:
        # full pass: every accumulated signature enters the pair join;
        # materialized because the dirs it reads are rewritten below
        all_sigs = all_sigs.localCheckpoint(eager=True)
        cand = all_sigs

    # pair set over the candidate signatures: the band equi-join
    # bounds candidates exactly as the stream/batch lanes do
    a, b = cand.alias("a"), cand.alias("b")
    pairs = (
        a.join(b, on=["band", "band_key"])
        .where(F.col("a.doc_id") > F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("dup_of"),
            _est_col("a.sig", "b.sig", num_hashes),
        )
        .dropDuplicates(["doc_id", "dup_of"])
        .where(F.col("est") >= threshold)
    )
    # the stream's recorded edges carry (a) exact-verified greedy
    # verdicts since the last pass, (b) the previous closure's full
    # component structure (every non-keeper points at its label) —
    # which is what makes the restricted pair set sufficient
    recorded = decisions.where(F.col("dup_of").isNotNull()).select(
        "doc_id", "dup_of", "est"
    )
    edges = pairs.unionByName(recorded).dropDuplicates(["doc_id", "dup_of"])

    cc = connected_components_star if use_star else connected_components
    cc_labels = cc(
        edges.select(F.col("doc_id").alias("id_a"), F.col("dup_of").alias("id_b")),
        decisions.select("doc_id").distinct(),
    )
    labels = cc_labels.withColumnRenamed("id", "doc_id")
    try:
        closed = _closed_decisions(
            decisions, labels, pairs, "est"
        ).localCheckpoint(eager=True)
        changed = (
            closed.alias("n")
            .join(decisions.alias("o"), on="doc_id")
            .where(
                (F.col("n.keep") != F.col("o.keep"))
                | ~F.col("n.dup_of").eqNullSafe(F.col("o.dup_of"))
            )
            .select(F.col("n.doc_id").alias("doc_id"), F.col("n.batch_id").alias("batch_id"))
            .localCheckpoint(eager=True)
        )
        n_changed = changed.count()
        report = {
            "docs": decisions.count(),
            "mode": "incremental" if incremental else "full",
            "pair_input_rows": int(cand.count()),
            "changed_verdicts": int(n_changed),
            "decision_dirs_rewritten": 0,
            "signature_dirs_rewritten": 0,
        }
        if incremental:
            report["new_docs"] = int(n_new)
        if not n_changed:
            _write_watermark(state_root, "near", params, max_bid)
            return report

        # --- decisions: rewrite only dirs holding changed rows -------
        dec_batches = [
            r.batch_id
            for r in changed.select("batch_id").distinct().collect()
        ]
        report["decision_dirs_rewritten"] = _rewrite_batch_dirs(
            spark, dec_root, closed, dec_batches
        )

        # --- signatures: move rows between store and cold log so the
        # stream's next probe sees exactly the closed keepers ---------
        keepers = labels.where(F.col("doc_id") == F.col("label")).select("doc_id")
        moved = all_sigs.join(
            changed.select("doc_id").distinct(), on="doc_id", how="left_semi"
        )
        sig_batches = [
            r.batch_id
            for r in moved.select("batch_id").distinct().collect()
        ]
        # the rewritten dirs' rows, pinned as a VALUE before any
        # overwrite (in full mode all_sigs already is one)
        src = all_sigs.where(F.col("batch_id").isin(sig_batches))
        if incremental:
            src = src.localCheckpoint(eager=True)
        new_store = src.join(keepers, on="doc_id", how="left_semi")
        new_cold = src.join(keepers, on="doc_id", how="left_anti")
        report["signature_dirs_rewritten"] = _rewrite_batch_dirs(
            spark, sig_root, new_store, sig_batches, batch_col_in_file=False
        ) + _rewrite_batch_dirs(
            spark, dup_root, new_cold, sig_batches, batch_col_in_file=False
        )
        _write_watermark(state_root, "near", params, max_bid)
        return report
    finally:
        cc_labels.unpersist()


def close_semantic_dedup_state(
    spark: SparkSession,
    state_root: str,
    index_root: str,
    threshold: float = 0.9,
    pair_blocks: int = 8,
    use_star: bool = True,
    mode: str = "auto",
) -> dict:
    """The semantic twin of `close_near_dedup_state`: transitive
    closure over every embedding the stream has seen — keeper store =
    the persistent ANN index, cold log = `dup_vectors/`. Pair
    generation is the batch `semantic_dedup` recipe (blocked
    intra-cluster triangle join, exact cosine) with every vector
    assigned to its nearest STORED centroid, plus the stream's recorded
    exact-verified edges (which also bridge clusters the assignment
    would separate). Demoted keepers are deleted from the index (their
    vectors move to the cold log), promoted docs append to it.

    `mode` mirrors the near lane: 'auto' scopes the triangle join to
    CLUSTERS containing docs arrived since the (inclusive) watermark
    batch; the centroid set is part of the watermark fingerprint, so a
    rebuilt/re-seeded index voids the invariant and forces a full
    pass. Verdict-identical to 'full' by the recorded-edges argument
    (pinned in tests).

    Same recall trade as SemDeDup: rediscovered pairs are bounded to
    intra-cluster; the recorded edges and repeated passes narrow the
    gap, the batch `sem-dedup` job remains the exhaustive re-sweep."""
    from ..functions.ann_index import (
        _quantize_with_embedding,
        append_to_ann_index,
        delete_from_ann_index,
        load_ann_meta,
    )
    from ..functions.dedup import connected_components, connected_components_star
    from ..functions.similarity import _semantic_pair_plan

    dec_root = f"{state_root}/decisions"
    dup_root = f"{state_root}/dup_vectors"
    if not os.path.isdir(dec_root):
        raise ValueError(f"no dedup state at {state_root}")
    meta = load_ann_meta(index_root)
    vec_id = meta["id_col"]

    params = {
        "threshold": threshold,
        "pair_blocks": pair_blocks,
        "centroids_md5": hashlib.md5(
            json.dumps(meta["centroids"]).encode()
        ).hexdigest(),
        "levels": meta.get("levels"),
    }
    wm = _read_watermark(state_root, "sem", params)
    incremental = _resolve_mode(mode, wm)

    from .semdedup import read_semantic_decisions

    # a VALUE, not a plan: the decision files are rewritten below
    decisions = read_semantic_decisions(spark, state_root).select(
        "doc_id", "keep", "dup_of", "cosine", "batch_id"
    ).localCheckpoint(eager=True)
    max_bid = decisions.agg(F.max("batch_id")).collect()[0][0]

    stored = (
        spark.read.option("basePath", f"{index_root}/vectors")
        .parquet(f"{index_root}/vectors")
        .select(
            F.col(vec_id).alias("doc_id"), "embedding",
            F.col("cluster").cast("int").alias("cluster"),
        )
    )
    cold = None
    if os.path.isdir(dup_root):
        from ..functions.ann_index import _int_l2_argmin

        cents = [(i, v) for i, v in enumerate(meta["centroids"])]
        raw = (
            spark.read.option("basePath", dup_root)
            .parquet(dup_root)
            .select(F.col(vec_id).alias("doc_id"), "embedding")
        )
        qz = _quantize_with_embedding(raw, "doc_id", "embedding", meta["levels"])
        cold = qz.select(
            "doc_id", "embedding",
            _int_l2_argmin(cents, "quantized").cast("int").alias("cluster"),
        )
    all_vecs = stored if cold is None else stored.unionByName(cold)

    n_new = None
    if incremental:
        # inclusive >= for the same replay-window reason as the near
        # lane; the touched set is the CLUSTERS holding new docs
        new_docs = (
            decisions.where(F.col("batch_id") >= wm["batch_id"])
            .select("doc_id")
            .distinct()
        )
        n_new = new_docs.count()
        touched = (
            all_vecs.join(new_docs, on="doc_id", how="left_semi")
            .select("cluster")
            .distinct()
        )
        cand_vecs = all_vecs.join(
            touched, on="cluster", how="left_semi"
        ).localCheckpoint(eager=True)
    else:
        all_vecs = all_vecs.localCheckpoint(eager=True)
        cand_vecs = all_vecs

    _, pairs = _semantic_pair_plan(
        cand_vecs.select("doc_id", "embedding"),
        threshold,
        cand_vecs.select("doc_id", "cluster"),
        pair_blocks,
        "doc_id",
        "embedding",
    )
    pairs = pairs.dropDuplicates(["doc_id", "dup_of"])
    recorded = decisions.where(F.col("dup_of").isNotNull()).select(
        "doc_id", "dup_of", "cosine"
    )
    edges = pairs.unionByName(recorded).dropDuplicates(["doc_id", "dup_of"])

    cc = connected_components_star if use_star else connected_components
    cc_labels = cc(
        edges.select(F.col("doc_id").alias("id_a"), F.col("dup_of").alias("id_b")),
        decisions.select("doc_id").distinct(),
    )
    labels = cc_labels.withColumnRenamed("id", "doc_id")
    try:
        closed = _closed_decisions(
            decisions, labels, pairs, "cosine"
        ).localCheckpoint(eager=True)
        changed = (
            closed.alias("n")
            .join(decisions.alias("o"), on="doc_id")
            .where(
                (F.col("n.keep") != F.col("o.keep"))
                | ~F.col("n.dup_of").eqNullSafe(F.col("o.dup_of"))
            )
            .select(F.col("n.doc_id").alias("doc_id"), F.col("n.batch_id").alias("batch_id"))
            .localCheckpoint(eager=True)
        )
        n_changed = changed.count()
        report = {
            "docs": decisions.count(),
            "mode": "incremental" if incremental else "full",
            "pair_input_rows": int(cand_vecs.count()),
            "changed_verdicts": int(n_changed),
            "decision_dirs_rewritten": 0,
            "index_deleted": 0,
            "index_appended": 0,
        }
        if incremental:
            report["new_docs"] = int(n_new)
        if not n_changed:
            _write_watermark(state_root, "sem", params, max_bid)
            return report

        dec_batches = [
            r.batch_id for r in changed.select("batch_id").distinct().collect()
        ]
        report["decision_dirs_rewritten"] = _rewrite_batch_dirs(
            spark, dec_root, closed, dec_batches
        )

        # every demoted/promoted doc has a CHANGED verdict, so the
        # vectors the index mutations below need are exactly the
        # changed docs' — pinned as a VALUE before any index rewrite
        # (in full mode all_vecs already is one; in incremental mode
        # the lazy all_vecs would re-read files the delete/append
        # rewrites). NOTE: changed components can span clusters the
        # touched set missed (recorded edges bridge clusters), so this
        # is keyed on changed docs, never on touched clusters.
        moved_vecs = all_vecs.join(
            changed.select("doc_id").distinct(), on="doc_id", how="left_semi"
        )
        if incremental:
            moved_vecs = moved_vecs.localCheckpoint(eager=True)

        keepers = labels.where(F.col("doc_id") == F.col("label")).select("doc_id")
        # demotion scope: STREAM-SEEN docs only. The index may hold a
        # seed corpus that predates the stream; the close pass
        # maintains the stream's verdicts, it does not adjudicate the
        # seed corpus (a seed can still be a cluster's keeper — it just
        # never leaves the index here)
        dec_ids = decisions.select("doc_id").distinct()
        stored_ids = stored.select("doc_id").join(
            dec_ids, on="doc_id", how="left_semi"
        )
        # VALUES, not plans: both are evaluated again AFTER the index
        # mutations below, and a lazy plan over the index's vector
        # files would re-read paths the delete/append just rewrote
        demoted = stored_ids.join(
            keepers, on="doc_id", how="left_anti"
        ).localCheckpoint(eager=True)
        promoted = (
            keepers.join(stored_ids, on="doc_id", how="left_anti")
            .localCheckpoint(eager=True)
            if cold is not None
            else None
        )
        # demoted keepers: vectors move index -> cold log BEFORE the
        # index delete (their embeddings only live in the index)
        dem_vecs = moved_vecs.join(demoted, on="doc_id", how="left_semi")
        n_dem = dem_vecs.count()
        if n_dem:
            # cold-log home for close-moved vectors: their decision
            # batch (replays only ever touch the LAST batch; the close
            # runs on a stopped, committed stream)
            dem_with_batch = dem_vecs.join(
                decisions.select("doc_id", "batch_id"), on="doc_id"
            ).select(
                F.col("doc_id").alias(vec_id), "embedding", "batch_id"
            )
            batches = [
                r.batch_id
                for r in dem_with_batch.select("batch_id").distinct().collect()
            ]
            existing_cold = (
                spark.read.option("basePath", dup_root)
                .parquet(dup_root)
                .select(vec_id, "embedding", "batch_id")
                if os.path.isdir(dup_root)
                else None
            )
            merged_cold = (
                dem_with_batch
                if existing_cold is None
                else existing_cold.unionByName(dem_with_batch)
            ).localCheckpoint(eager=True)
            _rewrite_batch_dirs(
                spark, dup_root, merged_cold, batches,
                batch_col_in_file=False,
            )
            delete_from_ann_index(
                spark, index_root,
                demoted.select(F.col("doc_id").alias(vec_id)),
            )
            report["index_deleted"] = int(n_dem)
        if promoted is not None:
            pro_vecs = moved_vecs.join(promoted, on="doc_id", how="left_semi")
            n_pro = pro_vecs.count()
            if n_pro:
                append_to_ann_index(
                    spark,
                    pro_vecs.select(F.col("doc_id").alias(vec_id), "embedding"),
                    index_root,
                )
                # ... and remove them from the cold log
                pro_batches_rows = (
                    spark.read.option("basePath", dup_root)
                    .parquet(dup_root)
                    .join(
                        promoted.select(F.col("doc_id").alias(vec_id)),
                        on=vec_id, how="left_semi",
                    )
                    .select("batch_id").distinct().collect()
                )
                remaining = (
                    spark.read.option("basePath", dup_root)
                    .parquet(dup_root)
                    .join(
                        promoted.select(F.col("doc_id").alias(vec_id)),
                        on=vec_id, how="left_anti",
                    )
                    .select(vec_id, "embedding", "batch_id")
                    .localCheckpoint(eager=True)
                )
                _rewrite_batch_dirs(
                    spark, dup_root, remaining,
                    [r.batch_id for r in pro_batches_rows],
                    batch_col_in_file=False,
                )
                report["index_appended"] = int(n_pro)
        _write_watermark(state_root, "sem", params, max_bid)
        return report
    finally:
        cc_labels.unpersist()
