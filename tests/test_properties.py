"""Property-based round-trip invariants (SURVEY.md §5.4): seeded random
catalog mutations -> plan/export/import -> the replication CONVERGES
(target == source on the replicated projection, for every exported db)
and is IDEMPOTENT (second apply changes nothing). These are the two
guarantees the reference gets operationally from create-or-update +
full-refresh sync (GlueUtil.java:264-350, GDCUtil.java:61-111)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.model import (
    DATABASE,
    PARTITION,
    TABLE,
    _sd,
    _ts,
)
from aws_glue_data_catalog_replication_utility_spark.plans.export import export_catalog
from aws_glue_data_catalog_replication_utility_spark.plans.importer import import_events
from aws_glue_data_catalog_replication_utility_spark.plans.planner import plan_replication

REPLICATED_TABLE_FIELDS = [
    "database_name",
    "name",
    "owner",
    "description",
    "retention",
    "table_type",
    "parameters",
    "partition_keys",
    "storage_descriptor",
]


def _random_catalog(rng: random.Random, catalog_id: str):
    """Random catalog: 2-5 dbs (some outside the export prefix), 1-6
    tables each, 0-15 partitions per table (straddling the threshold)."""
    dbs, tables, parts = [], [], []
    for i in range(rng.randint(2, 5)):
        prefix = rng.choice(["raw_data_", "tmp_", "raw_data_", "other_"])
        db = f"{prefix}db{i}"
        dbs.append(
            {
                "catalog_id": catalog_id,
                "name": db,
                "description": f"d{rng.randint(0, 9)}",
                "location_uri": f"s3://b/{db}/",
                "parameters": {"k": str(rng.randint(0, 3))},
                "create_time": _ts(1 + i),
            }
        )
        for j in range(rng.randint(1, 6)):
            tbl = f"t{j}"
            n_parts = rng.randint(0, 15)
            tables.append(
                {
                    "catalog_id": catalog_id,
                    "database_name": db,
                    "name": tbl,
                    "owner": "o",
                    "description": f"t{rng.randint(0, 9)}",
                    "create_time": _ts(1, 1),
                    "update_time": _ts(1, 2),
                    "last_access_time": _ts(1, 3),
                    "retention": rng.randint(0, 2),
                    "table_type": "EXTERNAL_TABLE",
                    "view_original_text": None,
                    "view_expanded_text": None,
                    "parameters": {"classification": rng.choice(["json", "csv"])},
                    "created_by": "arn:src",
                    "partition_keys": [{"name": "dt", "type": "string"}]
                    if n_parts
                    else [],
                    "storage_descriptor": _sd(f"s3://b/{db}/{tbl}/"),
                }
            )
            for p in range(n_parts):
                parts.append(
                    {
                        "catalog_id": catalog_id,
                        "database_name": db,
                        "table_name": tbl,
                        "values": [f"2024-01-{p + 1:02d}"],
                        "creation_time": _ts(2),
                        "last_access_time": _ts(2),
                        "storage_descriptor": _sd(f"s3://b/{db}/{tbl}/{p}/"),
                        "parameters": {},
                    }
                )
    return dbs, tables, parts


def _mutate_into_target(rng: random.Random, dbs, tables, parts, catalog_id: str):
    """A drifted target: some tables dropped (-> create), some descriptions
    changed (-> update), some untouched (-> skip), one foreign table
    (-> keep), stale extra partitions (-> wiped by full refresh)."""
    tgt_dbs = [dict(d, catalog_id=catalog_id) for d in dbs if rng.random() > 0.3]
    tgt_tables = []
    for t in tables:
        r = rng.random()
        if r < 0.3:
            continue  # dropped on target -> must be re-created
        t2 = dict(t, catalog_id=catalog_id)
        if r < 0.6:
            t2["description"] = "DRIFTED"  # -> must be updated
        tgt_tables.append(t2)
    tgt_parts = [dict(p, catalog_id=catalog_id) for p in parts if rng.random() > 0.5]
    # stale partition rows the export no longer carries
    for t in tables[:2]:
        tgt_parts.append(
            {
                "catalog_id": catalog_id,
                "database_name": t["database_name"],
                "table_name": t["name"],
                "values": ["1999-12-31"],
                "creation_time": _ts(3),
                "last_access_time": _ts(3),
                "storage_descriptor": _sd("s3://stale/"),
                "parameters": {},
            }
        )
    # a target-local table replication must not touch
    tgt_tables.append(
        dict(
            tables[0],
            catalog_id=catalog_id,
            database_name="local_only_db",
            name="local_table",
        )
    )
    tgt_dbs.append(
        {
            "catalog_id": catalog_id,
            "name": "local_only_db",
            "description": "target-local",
            "location_uri": None,
            "parameters": {},
            "create_time": _ts(9),
        }
    )
    return tgt_dbs, tgt_tables, tgt_parts


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_replication_converges_and_is_idempotent(spark, tmp_path, seed):
    rng = random.Random(seed)
    src_rows = _random_catalog(rng, "111111111111")
    tgt_rows = _mutate_into_target(rng, *src_rows, catalog_id="999999999999")

    src_dbs = spark.createDataFrame(src_rows[0], DATABASE)
    src_tables = spark.createDataFrame(src_rows[1], TABLE)
    src_parts = spark.createDataFrame(src_rows[2], PARTITION)
    tgt_dbs = spark.createDataFrame(tgt_rows[0], DATABASE)
    tgt_tables = spark.createDataFrame(tgt_rows[1], TABLE)
    tgt_parts = spark.createDataFrame(tgt_rows[2], PARTITION)

    side = str(tmp_path / f"side{seed}")
    msgs, _ = plan_replication(src_dbs, prefix_string="raw_data_", batch_id="p1")
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="p1",
        side_channel_path=side,
    )
    events = msgs.unionByName(tbl_msgs)

    res = import_events(
        spark, events, tgt_dbs, tgt_tables, tgt_parts, side_channel_path=side
    )

    exported_dbs = {
        r[0]
        for r in msgs.select(F.get_json_object("payload", "$.name")).collect()
    }

    # --- convergence: replicated projection equal for exported dbs -----
    src_proj = sorted(
        map(
            str,
            src_tables.where(F.col("database_name").isin(exported_dbs))
            .select(*REPLICATED_TABLE_FIELDS)
            .collect(),
        )
    )
    tgt_proj = sorted(
        map(
            str,
            res.tables.where(F.col("database_name").isin(exported_dbs))
            .select(*REPLICATED_TABLE_FIELDS)
            .collect(),
        )
    )
    assert src_proj == tgt_proj

    src_keys = {
        (r.database_name, r.table_name, tuple(r["values"]))
        for r in src_parts.where(F.col("database_name").isin(exported_dbs)).collect()
    }
    tgt_keys = {
        (r.database_name, r.table_name, tuple(r["values"]))
        for r in res.partitions.where(
            F.col("database_name").isin(exported_dbs)
        ).collect()
    }
    assert src_keys == tgt_keys  # stale rows wiped, exported set is truth

    # --- non-exported target state untouched ---------------------------
    assert (
        res.tables.where(F.col("database_name") == "local_only_db").count() == 1
    )
    assert res.databases.where(F.col("name") == "local_only_db").count() == 1

    # --- idempotence: second apply is all-skip -------------------------
    again = import_events(
        spark, events, res.databases, res.tables, res.partitions,
        side_channel_path=side,
    )
    assert again.table_import_audit.where(
        F.col("table_created") | F.col("table_updated")
    ).count() == 0
    assert again.db_import_audit.where(F.col("is_created")).count() == 0
    assert again.partitions.count() == res.partitions.count()


@pytest.mark.parametrize("seed", [5, 29, 71])
def test_corruption_never_poisons_the_batch(spark, tmp_path, seed):
    """Failure-lane accounting invariant: corrupt a random subset of the
    event payloads mid-flight; then (1) every corrupted event lands in
    the DLQ, (2) every corrupted db/table-shaped event also appears in
    its audit plane flagged with an error (DDBUtil.java:150-157 /
    SNSUtil.java:115-123 semantics), (3) every UNcorrupted table still
    applies — one bad message never fails the batch."""
    rng = random.Random(seed)
    src_rows = _random_catalog(rng, "111111111111")
    src_dbs = spark.createDataFrame(src_rows[0], DATABASE)
    src_tables = spark.createDataFrame(src_rows[1], TABLE)
    src_parts = spark.createDataFrame(src_rows[2], PARTITION)

    side = str(tmp_path / f"cside{seed}")
    msgs, _ = plan_replication(src_dbs, prefix_string="raw_data_", batch_id="c1")
    tbl_msgs, _ = export_catalog(
        spark, msgs, src_tables, src_parts, threshold=10, batch_id="c1",
        side_channel_path=side,
    )
    events = msgs.unionByName(tbl_msgs)
    all_events = events.select("event_id", "message_type").collect()
    corrupt_ids = {
        r.event_id for r in all_events if rng.random() < 0.35
    }
    by_id = {r.event_id: r.message_type for r in all_events}

    mangled = events.withColumn(
        "payload",
        F.when(
            F.col("event_id").isin(list(corrupt_ids)), F.lit("{truncated")
        ).otherwise(F.col("payload")),
    )
    from aws_glue_data_catalog_replication_utility_spark.model import empty_catalog

    d, t, p = empty_catalog(spark)
    res = import_events(spark, mangled, d, t, p, side_channel_path=side)

    # (1) DLQ holds exactly the corrupted events
    assert {r.event_id for r in res.dlq.collect()} == corrupt_ids

    # (2) corrupted events are audited with the failure flag
    db_errs = {
        r.db_id for r in res.db_import_audit.where(F.col("error").isNotNull()).collect()
    }
    tbl_errs = {
        r.table_id
        for r in res.table_import_audit.where(F.col("error").isNotNull()).collect()
    }
    for eid in corrupt_ids:
        if by_id[eid] == "database":
            assert eid in db_errs
        else:
            assert eid in tbl_errs

    # (3) every uncorrupted table event applied (created on empty target)
    surviving = {
        eid for eid, mt in by_id.items()
        if mt in ("table", "largeTable") and eid not in corrupt_ids
    }
    created = res.table_import_audit.where(F.col("table_created"))
    assert created.count() == len(surviving)
    # and their parent dbs all exist
    orphans = (
        res.tables.select(F.col("database_name").alias("name"))
        .distinct()
        .join(res.databases.select("name"), on="name", how="left_anti")
    )
    assert orphans.count() == 0


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_paragraph_dedup_properties(spark, seed):
    """Property pass over random corpora: (a) a corpus with NO
    cross-document duplicate paragraph is returned text-identical;
    (b) after dedup at max_df, no surviving paragraph appears in more
    than max_df documents; (c) output is row-for-row with the input."""
    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        dedup_paragraphs,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(rng.choices(vocab, k=6))  # a candidate boilerplate

    rows = []
    for d in range(20):
        paras = [
            f"uniq{d}p{j} " + " ".join(rng.choices(vocab, k=5))
            for j in range(rng.randint(1, 4))
        ]
        if rng.random() < 0.5:
            paras.insert(rng.randrange(len(paras) + 1), shared)
        rows.append((d, "\n".join(paras)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = dedup_paragraphs(docs, max_df=2).collect()
    assert {r.doc_id for r in out} == set(range(20))  # (c)

    # (b): surviving paragraph df <= max_df
    df_count: dict[str, int] = {}
    for r in out:
        for p in (r.text.split("\n") if r.text else []):
            df_count[p] = df_count.get(p, 0) + 1
    assert all(v <= 2 for v in df_count.values()), df_count

    # (a): unique-paragraph corpus round-trips unchanged
    uniq = spark.createDataFrame(
        [(d, f"only{d}a\nonly{d}b") for d in range(8)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in dedup_paragraphs(uniq, max_df=1).collect()}
    assert got == {d: f"only{d}a\nonly{d}b" for d in range(8)}


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_decode_image_roundtrip_properties(spark, seed):
    """Property: for random dimensions and pixels, encode (BMP 24/32,
    PPM, PGM) -> decode_image recovers exact dimensions, channel count,
    and integer-exact channel means; the BMP and PPM encodings of the
    SAME pixels decode to identical means."""
    rng = random.Random(seed)
    from aws_glue_data_catalog_replication_utility_spark.functions.multimodal import (
        decode_image,
    )
    from tests.test_multimodal import _encode_bmp, _encode_pgm, _encode_ppm

    w, h = rng.randint(1, 17), rng.randint(1, 9)
    rgb = [
        [(rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))
         for _ in range(w)]
        for _ in range(h)
    ]
    gray = [[rng.randint(0, 255) for _ in range(w)] for _ in range(h)]
    npx = w * h
    want_rgb = [
        sum(rgb[y][x][c] for y in range(h) for x in range(w)) / npx
        for c in range(3)
    ]
    want_gray = sum(gray[y][x] for y in range(h) for x in range(w)) / npx

    df = spark.createDataFrame(
        [
            (1, _encode_bmp(w, h, rgb)),
            (2, _encode_ppm(w, h, rgb)),
            (3, _encode_pgm(w, h, gray)),
            (4, _encode_bmp(w, h, rgb, bits=32)),
        ],
        "doc_id long, blob binary",
    )
    rows = {r.doc_id: r for r in decode_image(df).collect()}
    for d in (1, 2, 3, 4):
        assert (rows[d].width, rows[d].height, rows[d].error) == (w, h, None)
    assert list(rows[1].channel_means) == want_rgb
    assert list(rows[2].channel_means) == want_rgb
    assert list(rows[3].channel_means) == [want_gray]
    assert list(rows[4].channel_means) == want_rgb + [255.0]


@pytest.mark.parametrize("seed", [5, 29])
def test_normalize_text_idempotent_and_variant_insensitive(spark, seed):
    """Properties of the dedup normalization: applying it twice equals
    applying it once (fixed point), and case/punctuation variants of
    the same token stream normalize identically."""
    rng = random.Random(seed)
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        normalize_text,
    )

    words = ["alpha", "Bravo", "CHARLIE", "d3lta", "echo99", "f-ox"]
    texts = []
    for _ in range(20):
        toks = [rng.choice(words) for _ in range(rng.randint(1, 12))]
        texts.append(" ".join(toks))
        # a shouty, punctuated variant of the same stream
        texts.append("  ".join(t.upper() + rng.choice([",", "!", ""]) for t in toks))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    out = df.select(
        "i",
        normalize_text("t").alias("n1"),
        normalize_text(normalize_text("t")).alias("n2"),
    ).collect()
    by_i = {r.i: r for r in out}
    for r in out:
        # idempotence up to whitespace (punct->space can widen runs, and
        # the token consumers split on \s+)
        assert " ".join(r.n1.split()) == " ".join(r.n2.split())
    for i in range(0, len(texts), 2):
        a = " ".join(by_i[i].n1.split())
        b = " ".join(by_i[i + 1].n1.split())
        assert a == b, (texts[i], texts[i + 1])


@pytest.mark.parametrize("seed", [7, 31, 59])
def test_decode_audio_and_sample_frames_roundtrip_properties(spark, seed):
    """Property: random PCM samples encode (16-bit stereo, 8-bit mono)
    -> decode_audio recovers frame count, duration, and integer-exact
    per-channel mean-|amplitude|; random Y4M luma planes sampled at a
    random stride return exactly the strided indices with exact means
    and the full frame count."""
    rng = random.Random(seed)
    from aws_glue_data_catalog_replication_utility_spark.functions.multimodal import (
        decode_audio,
        sample_frames,
    )
    from tests.test_multimodal import _encode_wav, _encode_y4m

    n = rng.randint(1, 40)
    left = [rng.randint(-32768, 32767) for _ in range(n)]
    right = [rng.randint(-32768, 32767) for _ in range(n)]
    mono = [rng.randint(-128, 127) for _ in range(n)]
    rate = rng.choice([8000, 16000, 44100])
    adf = spark.createDataFrame(
        [
            (1, _encode_wav(rate, [left, right])),
            (2, _encode_wav(rate, [mono], bits=8)),
        ],
        "doc_id long, blob binary",
    )
    arows = {r.doc_id: r for r in decode_audio(adf).collect()}
    assert (arows[1].n_frames, arows[1].duration_s) == (n, n / rate)
    assert list(arows[1].channel_mean_abs) == [
        sum(abs(v) for v in left) / n,
        sum(abs(v) for v in right) / n,
    ]
    assert list(arows[2].channel_mean_abs) == [sum(abs(v) for v in mono) / n]
    assert arows[1].error is None and arows[2].error is None

    w, h = rng.randint(1, 12), rng.randint(1, 8)
    nf = rng.randint(1, 7)
    every = rng.randint(1, 4)
    planes = [[rng.randint(0, 255) for _ in range(w * h)] for _ in range(nf)]
    chroma = rng.choice(["C420", "C422", "C444", "Cmono"])
    vdf = spark.createDataFrame(
        [(1, _encode_y4m(w, h, planes, chroma=chroma))],
        "doc_id long, blob binary",
    )
    vrows = sorted(
        sample_frames(vdf, every=every).collect(), key=lambda r: r.frame_index
    )
    assert [r.frame_index for r in vrows] == list(range(0, nf, every))
    for r in vrows:
        assert (r.width, r.height, r.n_frames, r.error) == (w, h, nf, None)
        assert r.y_mean == sum(planes[r.frame_index]) / (w * h)


def test_ann_delete_random_subsets_match_rebuild(spark, tmp_path):
    """Property (seeded): for random delete sets — including ids that
    were never indexed — delete-then-search equals
    rebuild-without-those-ids bit-for-bit, verify stays green, and a
    second identical delete removes nothing (idempotence). Composes
    with append: delete after an append behaves the same because both
    assign against the STORED codebook."""
    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        delete_from_ann_index,
        search_ann_index,
        verify_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    all_ids = sorted(r[0] for r in emb.select("vec_id").collect())
    deletable = [i for i in all_ids if i >= 8]  # keep seed ids 0..7

    rng = random.Random(1107)
    for trial in range(3):
        doomed = sorted(rng.sample(deletable, rng.randint(1, 12)))
        ghosts = [max(all_ids) + 100 + trial, -5]  # never indexed
        root = str(tmp_path / f"idx_{trial}")
        build_ann_index(spark, emb, root, n_clusters=4, m=4, k=8)
        res = delete_from_ann_index(spark, root, doomed + ghosts)
        assert res["removed"] == len(doomed), (trial, doomed)
        verify_ann_index(spark, root)
        res2 = delete_from_ann_index(spark, root, doomed)
        assert res2["removed"] == 0

        twin = str(tmp_path / f"twin_{trial}")
        build_ann_index(
            spark, emb.where(~F.col("vec_id").isin(doomed)), twin,
            n_clusters=4, m=4, k=8,
        )
        queries = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = sorted(map(tuple, search_ann_index(
            spark, root, queries, k=4, nprobe=4).collect()))
        want = sorted(map(tuple, search_ann_index(
            spark, twin, queries, k=4, nprobe=4).collect()))
        assert got == want, trial


def test_semantic_dedup_random_matches_bruteforce(spark):
    """Property (seeded): on random small vector sets — including exact
    duplicates, near-duplicates, a zero vector, and negative
    components — semantic_dedup's verdicts equal a brute-force Python
    oracle running the same greedy rule over the same cluster
    assignment; results are invariant to pair_blocks."""
    import math

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        semantic_dedup,
    )

    rng = random.Random(707)
    for trial in range(3):
        dim, n = 8, 24
        rows = []
        for i in range(n):
            v = [rng.uniform(-1, 1) for _ in range(dim)]
            rows.append((i, v))
        # exact dup, scaled dup (cosine 1 up to fp), zero vector
        rows.append((100 + trial, list(rows[5][1])))
        rows.append((200 + trial, [x * 2.0 for x in rows[7][1]]))
        rows.append((300 + trial, [0.0] * dim))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        th = 0.95
        got = {
            r.vec_id: (r.keep, r.dup_of, r.cluster)
            for r in semantic_dedup(emb, threshold=th, n_seeds=4).collect()
        }
        got_pb1 = {
            r.vec_id: (r.keep, r.dup_of, r.cluster)
            for r in semantic_dedup(
                emb, threshold=th, n_seeds=4, pair_blocks=1
            ).collect()
        }
        assert got == got_pb1, trial

        # brute-force oracle over the SAME assignment (read back from
        # the operator's own cluster column — the pair logic is what
        # this test pins; the assignment is pinned by the DuckDB twin)
        def unit(v):
            nrm = math.sqrt(sum(x * x for x in v))
            return [x / nrm for x in v] if nrm else None

        vecs = {i: v for i, v in rows}
        for vid, (keep, dup_of, cluster) in got.items():
            u = unit(vecs[vid])
            cands = []
            if u is not None:
                for oid, (_, _, ocl) in got.items():
                    if oid >= vid or ocl != cluster:
                        continue
                    ou = unit(vecs[oid])
                    if ou is None:
                        continue
                    # same left-to-right fold as the engine
                    cos = 0.0
                    for a, b in zip(u, ou):
                        cos += a * b
                    if cos >= th:
                        cands.append((-cos, oid))
            if not cands:
                assert keep and dup_of is None, (trial, vid)
            else:
                cands.sort()
                assert not keep and dup_of == cands[0][1], (trial, vid)


def test_zorder_value_random_matches_python_morton(spark):
    """Property (seeded): for random boundary sets, bit widths, and
    column counts, the engine's bucket+interleave equals a pure-Python
    Morton oracle on every row."""
    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        zorder_bucket,
        zorder_value,
    )

    rng = random.Random(1107)
    for trial in range(3):
        ncols = rng.choice((2, 3))
        bits = rng.choice((2, 3, 4))
        nb = (1 << bits) - 1
        bnds = [
            sorted(rng.uniform(-100, 100) for _ in range(nb))
            for _ in range(ncols)
        ]
        rows = [
            tuple([i] + [rng.uniform(-150, 150) for _ in range(ncols)])
            for i in range(40)
        ]
        schema = "rid long, " + ", ".join(f"c{j} double" for j in range(ncols))
        df = spark.createDataFrame(rows, schema)
        got = {
            r.rid: r.z
            for r in df.select(
                "rid",
                zorder_value(
                    [
                        zorder_bucket(F.col(f"c{j}"), bnds[j])
                        for j in range(ncols)
                    ],
                    bits,
                ).alias("z"),
            ).collect()
        }
        for row in rows:
            rid, vals = row[0], row[1:]
            z = 0
            for j, x in enumerate(vals):
                bucket = sum(1 for b in bnds[j] if x >= b)
                for i in range(bits):
                    z += ((bucket >> i) & 1) << (i * ncols + (ncols - 1 - j))
            assert got[rid] == z, (trial, rid)


@pytest.mark.parametrize("seed", [5, 19, 61])
def test_changeset_roundtrip_and_minimality(spark, seed):
    """Random keyed snapshots: apply_changeset(old, diff) == new exactly
    (round-trip law), the diff never mentions an unchanged key
    (minimality), and diffing identical snapshots is empty."""
    import random

    from aws_glue_data_catalog_replication_utility_spark.operators.sync import (
        apply_changeset,
        snapshot_changeset,
    )

    rng = random.Random(seed)
    vals = ["a", "b", "c", None]
    old_rows = [(k, rng.choice(vals), rng.randrange(5)) for k in range(40)]
    new_rows = []
    unchanged = set()
    for k, v, x in old_rows:
        r = rng.random()
        if r < 0.25:
            continue  # delete
        if r < 0.5:
            new_rows.append((k, rng.choice(vals), x + 10))  # update
        else:
            new_rows.append((k, v, x))
            unchanged.add(k)
    new_rows += [(k, rng.choice(vals), 99) for k in range(100, 100 + rng.randrange(8))]

    schema = "k long, v string, x long"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)

    cs = snapshot_changeset(old, new, ["k"]).collect()
    # minimality: no unchanged key appears (an "update" to the same
    # payload would violate it)
    assert all(r.k not in unchanged or (r.k, r.v, r.x) not in old_rows for r in cs)
    assert {r.k for r in cs}.isdisjoint(unchanged)

    got = sorted(map(tuple, apply_changeset(
        old, snapshot_changeset(old, new, ["k"]), ["k"]
    ).collect()))
    assert got == sorted(new_rows, key=lambda t: (t[0], str(t[1]), t[2]))

    assert snapshot_changeset(new, new, ["k"]).count() == 0
