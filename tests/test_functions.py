"""Unit tests for the text / dedup / similarity function library."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_data_catalog_replication_utility_spark.functions import (
    exact_dedup,
    fingerprint,
    jaccard_pairs,
    lang_guess,
    quality_score,
    token_count,
    word_shingles,
)
from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
    minhash_band_pairs,
    minhash_signature,
)
from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
    cosine_topk,
    cosine_topk_pandas,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = _docs(spark, ["Hello  World", "hello world ", "different"])
    fps = [r.fp for r in df.select(fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_exact_dedup_keeps_min_id(spark):
    df = _docs(spark, ["a", "b", "a", "a"])
    with_fp = df.select(fingerprint("text").alias("fp"), "doc_id")
    got = {r.keep_id: r.dup_count for r in exact_dedup(with_fp, ["fp"], "doc_id").collect()}
    assert got == {0: 3, 1: 1}


def test_token_count_and_lang(spark):
    df = _docs(spark, ["the cat is on the mat", "der hund ist ein tier", "xyzzy plugh"])
    rows = df.select(
        token_count("text").alias("n"), lang_guess("text").alias("lg")
    ).collect()
    assert [r.n for r in rows] == [6, 5, 2]
    assert [r.lg for r in rows] == ["en", "de", "und"]


def test_word_shingles_short_doc_empty(spark):
    df = _docs(spark, ["one two three"])  # shorter than n=5 -> no shingles
    assert word_shingles(df, "doc_id", "text", n=5).count() == 0


def test_shingle_arrow_lane_matches_expression_lane(spark):
    """The vectorized pyarrow shingle generator (r12, guide §4.2) must be
    row-for-row identical to the pure-expression lane — the lane the
    DuckDB oracles twin — over real corpus text AND the tokenization
    edge zoo: Java-\\s whitespace (incl. \\x0B, which RE2's \\s lacks),
    leading/trailing separators (Java split limit=-1 keeps the empty
    tokens), NULL text, empty text, exactly-n tokens, repeated shingles
    (per-doc distinct), unicode, and both normalize settings."""
    real = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    edge_texts = [
        None,
        "",
        " ",
        "a b c d e",  # exactly n tokens -> 1 shingle
        "a b c d e f",  # 2 shingles
        "a\tb\nc\x0bd\fe\rf",  # every Java \s byte as separator
        "  lead and trail  ",
        "\na b c d e\n",  # leading/trailing non-space ws survives trim
        "x x x x x x x x x",  # one distinct shingle repeated
        "Ünïcode wörds häre tøo møre thån fîve tokens",
        "A B c d E f G",  # case (exercises normalize=True)
        "num1 num22 num333 4 55 666 7777",  # digit runs under normalize
        "a  b   c    d     e      f",  # multi-space runs
    ]
    edges = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(edge_texts)], "doc_id long, text string"
    )
    df = real.unionAll(edges)
    for n in (2, 5):
        for normalize in (False, True):
            expr = sorted(
                map(str, word_shingles(df, "doc_id", "text", n=n,
                                       normalize=normalize, lane="expr").collect())
            )
            arrow = sorted(
                map(str, word_shingles(df, "doc_id", "text", n=n,
                                       normalize=normalize).collect())
            )
            assert arrow == expr, f"n={n} normalize={normalize}"
            assert len(expr) > 0
    # non-long id type must survive the Arrow round trip
    sdf = spark.createDataFrame(
        [("k1", "a b c"), ("k2", "a b c d")], "doc_id string, text string"
    )
    expr = sorted(map(str, word_shingles(sdf, "doc_id", "text", n=2,
                                         lane="expr").collect()))
    arrow = sorted(map(str, word_shingles(sdf, "doc_id", "text", n=2).collect()))
    assert arrow == expr


def test_jaccard_identical_docs(spark):
    text = "a b c d e f g h i j"
    df = _docs(spark, [text, text, "totally different words here now ok yes no"])
    sh = word_shingles(df, "doc_id", "text", n=5)
    pairs = jaccard_pairs(sh, "doc_id", threshold=0.5).collect()
    assert len(pairs) == 1
    assert (pairs[0].id_a, pairs[0].id_b, pairs[0].jaccard) == (0, 1, 1.0)


def test_minhash_banding_finds_identical_docs(spark):
    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = _docs(spark, [text, text, "q r s t u v w x y z zz"])
    sh = word_shingles(df, "doc_id", "text", n=5)
    sig = minhash_signature(sh, "doc_id", num_hashes=12)
    cand = {(r.id_a, r.id_b) for r in minhash_band_pairs(sig, "doc_id", 12, 4).collect()}
    assert (0, 1) in cand
    assert (0, 2) not in cand  # disjoint shingle sets shouldn't collide


def test_minhash_array_lane_matches_agg_lane(spark):
    """The shuffle-free array lane (array_min over the shingle array)
    must be value-identical to the explode+groupBy lane, including
    excluding zero-shingle docs."""
    from aws_glue_data_catalog_replication_utility_spark.functions import (
        minhash_signature_arrays,
    )

    df = _docs(
        spark,
        [
            "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
            "a b c d e f g h i j k l",
            "short doc",  # < 5 tokens: excluded on both lanes
        ],
    )
    sh = word_shingles(df, "doc_id", "text", n=5)
    agg = sorted(map(str, minhash_signature(sh, "doc_id", 12).collect()))
    arr = sorted(
        map(str, minhash_signature_arrays(df, "doc_id", "text", 5, 12).collect())
    )
    assert agg == arr and len(arr) == 2


def test_cosine_topk_ranks_aligned_vector_first(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),  # nearly aligned with 0
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(emb, q, k=3).orderBy("rank").collect()
    assert [r.vec_id for r in got] == [1, 2, 3]
    assert got[0].cosine > 0.99


def test_cosine_pandas_matches_fold_ranking(spark):
    import math

    emb = spark.createDataFrame(
        [(i, [math.sin(i * 7 + j) for j in range(8)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    q = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = {(r.query_id, r.rank): r.vec_id for r in cosine_topk(emb, q, k=5).collect()}
    b = {
        (r.query_id, r.rank): r.vec_id
        for r in cosine_topk_pandas(emb, q, k=5).collect()
    }
    assert a == b


def test_quality_score_bounded(spark):
    df = _docs(spark, ["the cat sat on the mat and it is fine", "x", "!!!!!!"])
    for r in df.select(quality_score("text").alias("q")).collect():
        assert -0.25 <= r.q <= 1.0


def test_stratified_sample_is_partition_invariant(spark):
    """Membership must be a pure function of the row — identical kept
    set no matter how the input is partitioned (df.sample is not)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
        stratified_sample,
    )

    df = spark.range(0, 2000).selectExpr(
        "id AS event_id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS stratum"
    )
    kept1 = {
        r.event_id
        for r in stratified_sample(df, "stratum", "event_id", {"a": 20}, 5).collect()
    }
    kept2 = {
        r.event_id
        for r in stratified_sample(
            df.repartition(13), "stratum", "event_id", {"a": 20}, 5
        ).collect()
    }
    assert kept1 == kept2 and 0 < len(kept1) < 2000


def test_pack_sequences_bins_by_prefix_sum(spark):
    from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
        pack_sequences,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("s", 1, 900), ("s", 2, 900), ("s", 3, 900), ("t", 1, 2500)],
        "shard string, doc_id int, tc int",
    )
    out = {
        (r.shard, r.doc_id): r.bin
        for r in pack_sequences(df, "shard", "doc_id", F.col("tc"), 2048).collect()
    }
    # s: prefix sums 0, 900, 1800 -> bins 0, 0, 0 (doc3 starts at 1800 < 2048)
    assert out[("s", 1)] == 0 and out[("s", 2)] == 0
    assert out[("s", 3)] == 0
    # t: single huge doc starts at 0 -> bin 0; a follower would start at 2500
    assert out[("t", 1)] == 0


def test_redact_masks_all_matches(spark):
    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        redact,
        redaction_count,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("mail a@b.co and c@d.org here",)], "text string"
    )
    pat = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    row = df.select(
        redact("text", pat).alias("r"), redaction_count("text", pat).alias("n")
    ).collect()[0]
    assert row.r == "mail [MASKED] and [MASKED] here"
    assert row.n == 2


def test_distinctive_terms_prefers_rare_tokens(spark):
    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        distinctive_terms,
    )

    df = _docs(
        spark,
        [
            "common common rareA common",   # doc 0: rareA unique to it
            "common rareB common",          # doc 1: rareB unique to it
            "common only here",             # doc 2
        ],
    )
    out = {
        (r.doc_id, r.rank): (r.term, r.df)
        for r in distinctive_terms(df, "doc_id", "text", k=2).collect()
    }
    assert out[(0, 1)] == ("rareA", 1)   # rarest first
    assert out[(1, 1)] == ("rareB", 1)
    assert out[(0, 2)] == ("common", 3)  # then the shared token


def test_mix_corpora_downsamples_to_smallest_budget(spark):
    from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
        mix_corpora,
    )

    # source a: 1000 docs x 10 tokens; source b: 100 docs x 10 tokens
    df = spark.range(0, 1100).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 1000 THEN 'a' ELSE 'b' END AS source",
        "10 AS tc",
    )
    kept = mix_corpora(df, "source", "doc_id", F.col("tc"))
    rates = {r.source: r.rate_pct for r in kept.select("source", "rate_pct").distinct().collect()}
    assert rates["b"] == 100  # the smallest source IS the budget
    assert rates["a"] == 10  # 100 * 1000 / 10000
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["b"] == 100  # kept whole
    # hash sampling at 10%: close to the budget, not exact
    assert 50 <= counts["a"] <= 200


def test_chunk_documents_boundaries_and_overlap(spark):
    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        chunk_documents,
    )

    long = " ".join(f"w{i}" for i in range(100))
    df = _docs(spark, [long, "tiny doc"])
    out = {
        (r.doc_id, r.chunk_idx): r.chunk_len
        for r in chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    }
    # 100 tokens, stride 48: chunks at 0 (64), 48 (52) -> ceil(84/48)=2
    assert out == {(0, 0): 64, (0, 1): 52, (1, 0): 2}


def test_connected_components_chains_and_singletons(spark):
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    verts = spark.range(0, 13).select(F.col("id").alias("doc_id"))
    labels = connected_components(pairs, verts)  # ownership: caller unpersists
    got = {r.id: r.label for r in labels.collect()}
    labels.unpersist()
    assert got[1] == got[2] == got[3] == got[4] == 1  # 3-hop chain converges
    assert got[10] == got[11] == 10
    assert got[0] == 0 and got[7] == 7  # singletons keep their own id


def test_connected_components_string_ids(spark):
    """Labels keep the id's own type (the long-cast regression silently
    NULLed every label for string ids); min is lexicographic."""
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [("doc-b", "doc-c"), ("doc-c", "doc-a")], "id_a string, id_b string"
    )
    verts = spark.createDataFrame(
        [("doc-a",), ("doc-b",), ("doc-c",), ("doc-z",)], "doc_id string"
    )
    labels = connected_components(pairs, verts)
    got = {r.id: r.label for r in labels.collect()}
    labels.unpersist()
    assert got == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a", "doc-z": "doc-z",
    }


def test_connected_components_star_path_graph_log_rounds(spark):
    """The large-star/small-star variant collapses a 100-node PATH —
    the adversarial diameter-99 shape where min-label propagation needs
    ~99 rounds (and the default form deliberately raises) — in O(log n)
    alternating rounds."""
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "id_a long, id_b long"
    )
    verts = spark.range(0, 101).select(F.col("id").alias("doc_id"))
    # local_edges=0 forces the distributed star rounds — this test pins
    # the O(log n) convergence of the star lane itself, which the r12
    # driver-local fast path would otherwise absorb at this size
    labels = connected_components_star(pairs, verts, local_edges=0)
    got = {r.id: r.label for r in labels.collect()}
    rounds = labels._cc_rounds
    labels.unpersist()
    assert all(got[i] == 0 for i in range(100))  # one component, min id 0
    assert got[100] == 100  # singleton untouched
    assert rounds <= 12, f"expected O(log n) rounds on a path, got {rounds}"


def test_connected_components_star_matches_label_propagation(spark):
    """Parity on a small mixed graph (chains + triangle + singletons +
    string ids): both algorithms produce identical component labels."""
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [
            ("b", "c"), ("c", "a"),          # triangle via shared min
            ("x1", "x2"), ("x2", "x3"),      # chain
            ("dup", "dup"),                  # self loop ignored
        ],
        "id_a string, id_b string",
    )
    verts = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c", "x1", "x2", "x3", "dup", "lone"]],
        "doc_id string",
    )
    l1 = connected_components(pairs, verts)
    got1 = {r.id: r.label for r in l1.collect()}
    l1.unpersist()
    l2 = connected_components_star(pairs, verts)
    got2 = {r.id: r.label for r in l2.collect()}
    l2.unpersist()
    assert got1 == got2
    assert got2["c"] == "a" and got2["x3"] == "x1" and got2["lone"] == "lone"


def test_connected_components_local_lane_matches_distributed(spark):
    """r12 driver-local union-find fast path: labels are identical to
    the distributed lane for BOTH formulations, on a mixed graph
    (triangle via shared min, chain, self loop, singletons, string ids)
    and on long ids; the star lane reports 0 rounds when local; and a
    threshold below the edge count falls back to the distributed lane
    with identical output."""
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        connected_components,
        connected_components_star,
    )

    str_pairs = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x1", "x2"), ("x2", "x3"), ("dup", "dup")],
        "id_a string, id_b string",
    )
    str_verts = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c", "x1", "x2", "x3", "dup", "lone"]],
        "doc_id string",
    )
    long_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    long_verts = spark.range(0, 13).select(F.col("id").alias("doc_id"))

    for pairs, verts in ((str_pairs, str_verts), (long_pairs, long_verts)):
        for fn in (connected_components, connected_components_star):
            dist = fn(pairs, verts, local_edges=0)
            got_dist = {r.id: r.label for r in dist.collect()}
            dist.unpersist()
            loc = fn(pairs, verts, local_edges=1_000_000)
            got_loc = {r.id: r.label for r in loc.collect()}
            if fn is connected_components_star:
                assert loc._cc_rounds == 0
            loc.unpersist()
            assert got_loc == got_dist, f"{fn.__name__} lane mismatch"
            # threshold below the edge count: distributed fallback
            fb = fn(pairs, verts, local_edges=2)
            got_fb = {r.id: r.label for r in fb.collect()}
            fb.unpersist()
            assert got_fb == got_dist, f"{fn.__name__} fallback mismatch"


def test_quantize_embeddings_values_and_zero_vector(spark):
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        quantize_embeddings,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25]), (1, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
    assert got[0].scale == 1.0
    assert got[0].quantized == [127, -64, 31]  # floor(-63.5) = -64
    assert got[1].scale == 0.0 and got[1].quantized == [0, 0, 0]


def test_hive_type_validator_cross_engine_parity(spark):
    """The validator must produce IDENTICAL verdicts in Spark and DuckDB
    (hive_type_valid_sql emits the same algorithm) — this is the
    contract that lets the import's DLQ lane be oracle-checked."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.hive_types import (
        hive_type_valid,
        hive_type_valid_sql,
    )

    cases = [
        ("string", True),
        ("STRING", True),
        ("decimal(38,18)", True),
        ("array<map<string,struct<a:int,b:array<string>>>>", True),
        ("struct< name : string , age : int >", True),  # whitespace ok
        ("uniontype<int,string,double>", True),
        ("aray<string>", False),
        ("array<string", False),
        ("array<string>>", False),
        ("map<,string>", False),
        ("struct<a:>", False),
        ("int,string", False),
        (None, False),
        # marker injection (ADVICE r04): '!' from input must never pose
        # as an already-reduced subtree
        ("!", False),
        ("array<!>", False),
        ("map<!,!>", False),
        ("struct<a:!>", False),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(cases)], "i long, type_str string"
    )
    got_spark = {
        r.i: r.v
        for r in df.select("i", hive_type_valid("type_str").alias("v")).collect()
    }
    con = duckdb.connect()
    got_duck = {}
    for i, (c, _) in enumerate(cases):
        lit = "NULL" if c is None else "'" + c.replace("'", "''") + "'"
        got_duck[i] = con.sql(
            f"SELECT {hive_type_valid_sql(lit)}"
        ).fetchone()[0]
    for i, (c, want) in enumerate(cases):
        assert got_spark[i] == want, f"spark: {c!r} -> {got_spark[i]}, want {want}"
        assert bool(got_duck[i]) == want, f"duckdb: {c!r} -> {got_duck[i]}, want {want}"


def test_ivf_assignment_plan_has_zero_exchanges(spark):
    """VERDICT r03 #4: the coarse-quantizer assignment must be a
    map-side argmax — one narrow projection over the embedding scan,
    ZERO exchanges before the search join (the window form shuffled the
    whole scored corpus to rank 8 candidates)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        ivf_assignments,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0]) for i in range(64)],
        "vec_id long, embedding array<float>",
    )
    assign = ivf_assignments(emb, n_seeds=4)
    plan = assign._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # and it is still CORRECT: every vector lands on its best centroid
    import math

    rows = emb.collect()
    seeds = {r.vec_id: r.embedding for r in rows if r.vec_id < 4}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    got = {r.vec_id: r.cluster for r in assign.collect()}
    for r in rows:
        best = max(
            sorted(seeds),
            key=lambda s: (cos(r.embedding, seeds[s]), -s),
        )
        assert got[r.vec_id] == best, (r.vec_id, got[r.vec_id], best)


def test_pq_codes_map_side_and_correct(spark):
    """PQ codes: zero-exchange plan (codebook folded into the
    projection) and integer-exact nearest-codeword assignment with
    ties to the smaller codeword index."""
    import math

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        pq_codes,
    )

    emb = spark.createDataFrame(
        [(i, [math.sin(i * 3 + j) for j in range(8)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = pq_codes(emb, m=2, k=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    # python replica of the integer pipeline
    rows = {r.vec_id: list(r.embedding) for r in emb.collect()}

    def quant(v):
        scale = max(abs(x) for x in v)
        if scale == 0:
            return [0] * len(v)
        return [math.floor(x * 127.0 / scale) for x in v]

    qv = {i: quant(v) for i, v in rows.items()}
    sub = 8 // 2
    got = {r.vec_id: list(r.codes) for r in out.collect()}
    for i, q in qv.items():
        for j in range(2):
            dists = []
            for c in range(4):
                sv = qv[c][j * sub : (j + 1) * sub]
                xv = q[j * sub : (j + 1) * sub]
                dists.append((sum((a - b) * (a - b) for a, b in zip(xv, sv)), c))
            want = min(dists)[1]
            assert got[i][j] == want, (i, j, got[i], dists)


def _ivf_pq_fixture(spark):
    import math

    return spark.createDataFrame(
        [(i, [math.sin(i * 3 + j) for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )


def test_ivf_arrow_lane_matches_expression_lane(spark):
    """The vectorized numpy argmax (r12) must agree with the expression
    lane row-for-row over real embeddings AND the ordering edge zoo:
    zero vectors (norm guard), duplicate vectors (deterministic ties to
    the smaller seed id), and near-tie cosines where a
    differently-ordered float sum would flip the argmax (the cumsum
    fold keeps the exact fold bits). A zero-norm CENTROID raises in
    both lanes (ANSI DIVIDE_BY_ZERO in the expression lane; a loud
    ValueError in the arrow lane)."""
    import pytest as _pytest

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        ivf_assignments,
    )

    real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    for n_seeds in (4, 8):
        expr = sorted(map(str, ivf_assignments(real, n_seeds=n_seeds,
                                               lane="expr").collect()))
        arrow = sorted(map(str, ivf_assignments(real, n_seeds=n_seeds).collect()))
        assert arrow == expr and len(arrow) > 0, f"n_seeds={n_seeds}"
    edge = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),      # seed 0
            (1, [1.0, 1e-16, 0.0]),    # seed 1: near-tie with seed 0
            (2, [0.5, -0.5, 0.25]),    # seed 2
            (3, [0.0, 0.0, 0.0]),      # zero vector row (norm guard)
            (4, [1.0, 0.0, 0.0]),      # exact duplicate of seed 0 (tie)
            (5, [0.7071067811865476, 0.7071067811865475, 1e-300]),
            (6, [-1.0, -1.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    expr = sorted(map(str, ivf_assignments(edge, n_seeds=3, lane="expr").collect()))
    arrow = sorted(map(str, ivf_assignments(edge, n_seeds=3).collect()))
    assert arrow == expr
    zero_seed = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="zero-norm centroid"):
        ivf_assignments(zero_seed, n_seeds=2).collect()


def test_ivf_pq_scores_plan_and_probe_ranks(spark):
    """The composed search surface (VERDICT r04 #3/#4): the scored
    relation must be ONE map-side projection + explode — zero exchanges
    — and probe_rank must be, per query, a permutation rank: every
    stored vector's rank is in 1..n_seeds, and each query ranks each
    cluster consistently (all vectors of one cluster share one rank)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        ivf_assignments,
        ivf_pq_scores,
    )

    emb = _ivf_pq_fixture(spark)
    scores = ivf_pq_scores(emb, n_seeds=4, m=2, k=4, n_queries=3)
    plan = scores._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    assign = {r.vec_id: r.cluster for r in ivf_assignments(emb, n_seeds=4).collect()}
    rank_of: dict[tuple[int, int], int] = {}
    rows = scores.collect()
    assert len(rows) == 3 * 40 - 3  # self-matches excluded
    for r in rows:
        assert 1 <= r.probe_rank <= 4
        key = (r.query_id, assign[r.vec_id])
        assert rank_of.setdefault(key, r.probe_rank) == r.probe_rank
    for qid in range(3):
        ranks = sorted(v for (q, _), v in rank_of.items() if q == qid)
        # every cluster with members gets a distinct rank
        assert ranks == sorted(set(ranks))


def test_ivf_adc_full_probe_degenerates_to_pq_adc(spark):
    """nprobe = n_seeds must reproduce the full-table ADC search
    (q59's lane) EXACTLY — the pruning is the only difference between
    the composed search and pq_adc_topk."""
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        ivf_adc_topk,
        pq_adc_topk,
    )

    emb = _ivf_pq_fixture(spark)
    full = sorted(
        map(tuple, ivf_adc_topk(emb, nprobe=4, n_seeds=4, m=2, k=4, n_queries=3).collect())
    )
    ref = sorted(map(tuple, pq_adc_topk(emb, m=2, k=4, n_queries=3).collect()))
    assert full == ref and len(full) == 3 * 5


def test_ivf_adc_probe_subsets_nest(spark):
    """The nprobe candidate sets nest, so each lane's top-k comes from a
    superset of the previous lane's candidates: every result row at
    nprobe=p must come from a cluster within the query's top-p probe
    order (probe_rank <= p by construction)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        ivf_pq_scores,
    )
    from pyspark.sql import functions as F

    emb = _ivf_pq_fixture(spark)
    scores = ivf_pq_scores(emb, n_seeds=4, m=2, k=4, n_queries=3)
    bad = scores.where(
        (F.col("probe_rank") < 1) | (F.col("probe_rank") > 4)
    ).count()
    assert bad == 0
    # nprobe=1 candidates ⊂ nprobe=2 candidates ⊂ ... per query
    c1 = scores.where("probe_rank <= 1").count()
    c2 = scores.where("probe_rank <= 2").count()
    c4 = scores.where("probe_rank <= 4").count()
    assert c1 <= c2 <= c4 == scores.count()


def test_kmeans_codebook_deterministic_and_lloyd_correct(spark):
    """kmeans_codebook (VERDICT r04 #9): the Lloyd iteration over the
    int8-quantized lane is (a) bit-reproducible across runs/partitionings
    — integer sums are order-independent — and (b) a faithful Lloyd
    update: a driver-side reimplementation over the same quantized
    vectors must produce the identical codebook and assignment."""
    import math

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        kmeans_codebook,
        quantize_embeddings,
    )

    emb = spark.createDataFrame(
        [(i, [math.sin(i * 5 + j) * (1 + i % 7) for j in range(6)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    cents, assign = kmeans_codebook(emb, n_clusters=4, n_iters=3)
    cents2, _ = kmeans_codebook(emb.repartition(7), n_clusters=4, n_iters=3)
    assert cents == cents2  # order-independent integer arithmetic

    qv = {r.vec_id: list(r.quantized) for r in quantize_embeddings(emb).collect()}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    ref = [(c, qv[c]) for c in range(4)]
    for _ in range(3):
        members: dict[int, list[int]] = {}
        for vid, v in qv.items():
            best = min(ref, key=lambda s: (d2(v, s[1]), s[0]))[0]
            members.setdefault(best, []).append(vid)
        ref = [
            (
                c,
                [
                    math.floor(sum(qv[m][j] for m in members[c]) / len(members[c]))
                    for j in range(6)
                ]
                if c in members
                else old,
            )
            for c, old in ref
        ]
    assert cents == ref
    got = {r.vec_id: r.cluster for r in assign.collect()}
    for vid, v in qv.items():
        assert got[vid] == min(ref, key=lambda s: (d2(v, s[1]), s[0]))[0]


def test_kmeans_codebook_balances_clusters_on_corpus(spark):
    """The codebook comparison pinned by q33's extension: on the
    embeddings corpus the Lloyd-trained codebook must (a) strictly
    reduce the max bucket size vs first-k seeds — the skew/tail-latency
    knob an IVF layout cares about at 100 TB — and (b) stay within one
    exact-top-k hit of the first-k codebook's nprobe=1 recall. Measured
    at sf0.01 (the correctness-gate scale): 8 clusters over 50 vectors
    at sf0.001 is too degenerate for a recall property."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        cosine_topk,
        quantized_ivf_assignments,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    first = quantized_ivf_assignments(emb, 8, "first")
    km = quantized_ivf_assignments(emb, 8, "kmeans", n_iters=2)
    sizes_first = [r["count"] for r in first.groupBy("cluster").count().collect()]
    sizes_km = [r["count"] for r in km.groupBy("cluster").count().collect()]
    assert max(sizes_km) < max(sizes_first), (sizes_km, sizes_first)

    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = cosine_topk(emb, queries, k=5).collect()
    fa = {r.vec_id: r.cluster for r in first.collect()}
    ka = {r.vec_id: r.cluster for r in km.collect()}
    recall_first = sum(fa[t.query_id] == fa[t.vec_id] for t in topk)
    recall_km = sum(ka[t.query_id] == ka[t.vec_id] for t in topk)
    assert recall_km >= recall_first - 1, (recall_km, recall_first)


def test_contamination_pairs_matches_duckdb_exactly(spark):
    """Benchmark-contamination screen (train/test n-gram overlap): the
    Spark inverted-index plan must agree bit-for-bit with a DuckDB
    reimplementation over the same parquet — integer overlap / integer
    eval size, so containment is engine-exact. Eval set = every 7th
    document (deterministic); n=5 suits the ~54-token fixture docs."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        contamination_pairs,
    )
    from pyspark.sql import functions as F

    path = "/root/testdata/sf0.01/documents.parquet"
    docs = spark.read.parquet(path)
    eval_docs = docs.where(F.col("doc_id") % 7 == 3).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    got = (
        contamination_pairs(docs, eval_docs, n=5, min_containment=0.3)
        .where(F.col("doc_id") != F.col("eval_id"))
        .orderBy("doc_id", "eval_id")
        .collect()
    )
    # self-pairs are the sanity anchor: containment must be exactly 1
    selfs = (
        contamination_pairs(docs, eval_docs, n=5, min_containment=0.3)
        .where(F.col("doc_id") == F.col("eval_id"))
        .collect()
    )
    assert selfs and all(r.containment == 1.0 for r in selfs)

    want = duckdb.connect().execute(f"""
        WITH sh AS (
          SELECT doc_id,
                 unnest(list_distinct([array_to_string(list_slice(toks, i, i+4), ' ')
                                       for i in range(1, greatest(len(toks)-3, 1))])) AS shingle
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                FROM '{path}')),
        ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 7 = 3),
        sz AS (SELECT eval_id, COUNT(*) AS eval_sz FROM ev GROUP BY eval_id),
        ov AS (SELECT sh.doc_id, ev.eval_id, COUNT(*) AS overlap
               FROM sh JOIN ev USING (shingle) GROUP BY 1, 2)
        SELECT ov.doc_id, ov.eval_id, overlap, eval_sz,
               overlap / eval_sz AS containment
        FROM ov JOIN sz USING (eval_id)
        WHERE overlap / eval_sz >= 0.3 AND ov.doc_id <> ov.eval_id
        ORDER BY ov.doc_id, ov.eval_id
    """).fetchall()
    assert [(r.doc_id, r.eval_id, r.overlap, r.eval_sz, r.containment) for r in got] == [
        tuple(w) for w in want
    ]


def test_contamination_df_cap_is_conservative(spark):
    """With max_df pruning, every surviving pair's overlap must be <=
    the unpruned overlap (pruning can lower a score, never raise it),
    and no pair absent from the unpruned result may appear."""
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        contamination_pairs,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    eval_docs = docs.where(F.col("doc_id") % 7 == 3).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    full = {
        (r.doc_id, r.eval_id): r.overlap
        for r in contamination_pairs(docs, eval_docs, n=5, min_containment=0.0).collect()
    }
    capped = contamination_pairs(
        docs, eval_docs, n=5, min_containment=0.0, max_df=20
    ).collect()
    assert capped
    for r in capped:
        assert (r.doc_id, r.eval_id) in full
        assert r.overlap <= full[(r.doc_id, r.eval_id)]


def test_dedup_paragraphs_matches_duckdb_exactly(spark, tmp_path):
    """Corpus-level paragraph dedup (RefinedWeb-style boilerplate
    removal): Spark result must agree bit-for-bit with a DuckDB twin
    over the same parquet — md5 hashing and order-preserving
    reassembly are engine-exact."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        dedup_paragraphs,
    )

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (0, f"unique intro zero\n{boiler}\nunique body zero"),
            (1, f"{boiler}\nunique body one"),
            (2, f"unique body two\n{boiler}"),
            (3, "all original content here"),
            (4, boiler),  # document that is ONLY boilerplate -> empty text
            (5, f"repeated within doc\nrepeated within doc\n{boiler}"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(path)

    got = sorted(
        (r.doc_id, r.text, r.n_paragraphs, r.n_removed)
        for r in dedup_paragraphs(spark.read.parquet(path), max_df=1).collect()
    )
    want = sorted(
        tuple(w)
        for w in duckdb.connect().execute(f"""
        WITH base AS (
          SELECT doc_id, u.para, u.pos, md5(u.para) AS h
          FROM '{path}/*.parquet',
               LATERAL (SELECT unnest(string_split(text, chr(10))) AS para,
                               generate_subscripts(string_split(text, chr(10)), 1) AS pos) u),
        dfreq AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM base GROUP BY h),
        kept AS (SELECT b.* FROM base b JOIN dfreq USING (h) WHERE df <= 1),
        rebuilt AS (
          SELECT doc_id,
                 array_to_string(list(para ORDER BY pos), chr(10)) AS text,
                 COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id),
        totals AS (SELECT doc_id, COUNT(*) AS n_paragraphs FROM base GROUP BY doc_id)
        SELECT t.doc_id, COALESCE(r.text, '') AS text,
               t.n_paragraphs, t.n_paragraphs - COALESCE(r.n_kept, 0) AS n_removed
        FROM totals t LEFT JOIN rebuilt r USING (doc_id)
        ORDER BY t.doc_id
    """).fetchall()
    )
    assert got == want
    # semantic spot checks: boilerplate gone everywhere, uniques intact,
    # intra-doc repetition below the df threshold survives
    by_id = {r[0]: r for r in got}
    assert by_id[4][1] == "" and by_id[4][3] == 1
    assert boiler not in by_id[0][1] and "unique body zero" in by_id[0][1]
    assert by_id[5][1] == "repeated within doc\nrepeated within doc"


def test_repetition_stats_matches_duckdb_exactly(spark, tmp_path):
    """Intra-doc repetition signals (Gopher rules): line-duplication
    fraction and top-n-gram share must agree bit-for-bit with a DuckDB
    twin over the same parquet."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (0, "buy now\nbuy now\nbuy now\nunique line"),
            (1, "spam spam spam spam spam"),
            (2, "all words here are fully distinct tokens"),
            (3, "one"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(path)

    got = sorted(
        (r.doc_id, r.s.n_lines, r.s.dup_line_frac, r.s.top_ngram_frac)
        for r in spark.read.parquet(path)
        .select("doc_id", repetition_stats("text").alias("s"))
        .collect()
    )
    want = sorted(
        tuple(w)
        for w in duckdb.connect().execute(f"""
        WITH d AS (SELECT doc_id, text,
                          string_split(text, chr(10)) AS lines,
                          string_split_regex(trim(text), '\\s+') AS toks
                   FROM '{path}/*.parquet'),
        g AS (SELECT doc_id, len(lines) AS n_lines,
                     CASE WHEN len(lines) <= 1 THEN 0.0
                          ELSE (len(lines) - len(list_distinct(lines))) / len(lines) END AS dup_frac,
                     CASE WHEN len(toks) >= 2
                          THEN [array_to_string(list_slice(toks, i, i+1), ' ')
                                for i in range(1, greatest(len(toks)-0, 1))] 
                          ELSE [] END AS grams
              FROM d),
        t AS (SELECT doc_id, n_lines, dup_frac, grams,
                     CASE WHEN len(grams) > 0
                          THEN list_max(list_transform(list_distinct(grams),
                               v -> len(list_filter(grams, x -> x = v)))) * 1.0 / len(grams)
                          ELSE 0.0 END AS top_frac
              FROM g)
        SELECT doc_id, CAST(n_lines AS INT), dup_frac, top_frac FROM t ORDER BY doc_id
    """).fetchall()
    )
    assert got == want
    by_id = {g[0]: g for g in got}
    assert by_id[0][2] == 0.5          # 2 of 4 lines are repeats
    assert by_id[1][3] == 1.0          # fully-looping bigrams
    assert by_id[2][3] < 0.2           # diverse text
    assert by_id[3] == (3, 1, 0.0, 0.0)  # single line, no bigram


def test_quality_filter_verdict_matches_duckdb(spark, tmp_path):
    """The composed keep/drop gate: keep flag AND the named reasons must
    agree with a DuckDB twin computing the identical rules."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        quality_filter_verdict,
    )

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is a fine day for all of us"),
            (1, "x y"),                                     # too few tokens
            (2, "!!! ??? ... ;;; ::: !!!"),                 # punct + no stopwords
            (3, "spam spam spam spam spam spam spam spam"), # repetition + stopwords
            (4, "the the the the the the the the"),         # repetition (stopword-rich)
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(path)

    got = sorted(
        (r.doc_id, r.v.keep, tuple(r.v.reasons))
        for r in spark.read.parquet(path)
        .select("doc_id", quality_filter_verdict("text").alias("v"))
        .collect()
    )
    want = sorted(
        (w[0], w[1], tuple(w[2]))
        for w in duckdb.connect().execute(f"""
        WITH d AS (SELECT doc_id, text,
                          string_split_regex(trim(text), '\\s+') AS toks,
                          string_split(text, chr(10)) AS lines
                   FROM '{path}/*.parquet'),
        g AS (SELECT *,
                     CASE WHEN len(toks) >= 2
                          THEN [array_to_string(list_slice(toks, i, i+1), ' ')
                                for i in range(1, greatest(len(toks)-0, 1))]
                          ELSE [] END AS grams
              FROM d),
        sig AS (SELECT doc_id,
                  len(toks) AS n_tokens,
                  CASE WHEN length(text) > 0
                       THEN length(regexp_replace(text, '[^.,;:!?]', '', 'g')) / length(text)
                       ELSE 0.0 END AS punct,
                  len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it','for','on')))
                    * 1.0 / len(toks) AS sw,
                  CASE WHEN len(grams) > 0
                       THEN list_max(list_transform(list_distinct(grams),
                            v -> len(list_filter(grams, x -> x = v)))) * 1.0 / len(grams)
                       ELSE 0.0 END AS top2,
                  CASE WHEN len(lines) <= 1 THEN 0.0
                       ELSE (len(lines) - len(list_distinct(lines))) * 1.0 / len(lines) END AS dupl
                FROM g)
        SELECT doc_id,
               (n_tokens >= 5 AND punct <= 0.3 AND sw >= 0.02
                AND top2 <= 0.20 AND dupl <= 0.30) AS keep,
               list_filter([
                 CASE WHEN n_tokens < 5 THEN 'too_few_tokens' END,
                 CASE WHEN punct > 0.3 THEN 'punct_ratio' END,
                 CASE WHEN sw < 0.02 THEN 'stopword_ratio' END,
                 CASE WHEN top2 > 0.20 THEN 'top_2gram_frac' END,
                 CASE WHEN dupl > 0.30 THEN 'dup_line_frac' END],
                 x -> x IS NOT NULL) AS reasons
        FROM sig ORDER BY doc_id
    """).fetchall()
    )
    assert got == want
    by_id = {g[0]: g for g in got}
    assert by_id[0][1] is True and by_id[0][2] == ()
    assert by_id[1][1] is False and "too_few_tokens" in by_id[1][2]
    assert by_id[2][1] is False
    assert "top_2gram_frac" in by_id[3][2]


def test_ann_index_full_probe_matches_pq_adc_topk(spark, tmp_path):
    """The persisted IVF-PQ index searched with nprobe = n_clusters is
    a full ADC scan — it must reproduce pq_adc_topk's ranking EXACTLY
    (same integer arithmetic, same first-k codebook, same tie rule)."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        search_ann_index,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        pq_adc_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "idx")
    meta = build_ann_index(spark, emb, root, n_clusters=4, m=4, k=8)
    assert meta["dim"] == 64 and len(meta["centroids"]) == 4

    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        (r.query_id, r.rank, r.vec_id, r.adist)
        for r in search_ann_index(spark, root, queries, k=5, nprobe=4).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.vec_id, r.adist)
        for r in pq_adc_topk(emb, m=4, k=8, n_queries=5, topk=5).collect()
    )
    assert got == want


def test_ann_index_search_prunes_partitions(spark, tmp_path):
    """nprobe=1 search must read ONLY the probed cluster directories:
    the scan shows a PartitionFilters entry on `cluster`, and results
    come exclusively from the probed clusters."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        search_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "idx")
    build_ann_index(spark, emb, root, n_clusters=4, m=4, k=8, codebook="kmeans")

    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = search_ann_index(spark, root, queries, k=3, nprobe=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    # every returned neighbor must live in a probed cluster
    vectors = spark.read.option("basePath", f"{root}/vectors").parquet(
        f"{root}/vectors"
    )
    clusters = {r.vec_id: r.cluster for r in vectors.select("vec_id", "cluster").collect()}
    rows = res.collect()
    assert rows
    for r in rows:
        assert clusters[r.vec_id] == clusters[r.query_id]


def test_ann_index_rerank_recovers_exact_search(spark, tmp_path):
    """Two-stage search (ADC shortlist -> exact-cosine rerank): with
    full probing and a shortlist covering the corpus, the result must
    EQUAL brute-force cosine_topk — same fold arithmetic, same ties."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        search_ann_index,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    root = str(tmp_path / "idx")
    build_ann_index(spark, emb, root, n_clusters=4, m=4, k=8)

    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        (r.query_id, r.rank, r.vec_id, r.cosine)
        for r in search_ann_index(
            spark, root, queries, k=5, nprobe=4, rerank_factor=n,
        ).collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.vec_id, r.cosine)
        for r in cosine_topk(emb, queries, k=5).collect()
    )
    assert got == want


def test_expr_caches_cleared_on_context_change(spark):
    """A memoized unresolved Column wraps the Py4J gateway of the
    SparkContext it was built under; after a context restart it is a
    dead reference (ADVICE r05). Simulate the restart by pointing the
    guard at an already-collected object (what a GC'd old context looks
    like) and assert every registered cache empties on the next
    consult."""
    import weakref

    from aws_glue_data_catalog_replication_utility_spark.functions import (
        _exprcache,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.hive_types import (
        _all_column_types_valid_cached,
        all_column_types_valid,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        _CENTROID_MEMO,
        _centroid_literal,
    )

    _centroid_literal([(1, [0.0, 1.0])])
    all_column_types_valid("columns", "partition_keys")
    assert _CENTROID_MEMO
    assert _all_column_types_valid_cached.cache_info().currsize > 0

    class _Gone:
        pass

    _exprcache._ctx_ref = weakref.ref(_Gone())  # dead as soon as built
    _exprcache.check_context()
    assert _CENTROID_MEMO == {}
    assert _all_column_types_valid_cached.cache_info().currsize == 0

    # and the next consult rebuilds against the live context
    col = _centroid_literal([(1, [0.0, 1.0])])
    assert col is _centroid_literal([(1, [0.0, 1.0])])  # memo warm again


def test_dedup_paragraphs_null_text_keeps_row(spark):
    """A NULL-text document must survive row-for-row (the clean CLI
    audit is one row per input doc): NULL reads as empty text, one
    empty paragraph (ADVICE r05)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        dedup_paragraphs,
    )

    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, None), (3, "a\nc")], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in dedup_paragraphs(docs, max_df=1).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2].text == "" and out[2].n_paragraphs == 1 and out[2].n_removed == 0
    assert out[1].text == "b" and out[1].n_removed == 1  # 'a' still hot


def test_dedup_paragraphs_hot_set_guard_falls_back_to_shuffle(spark):
    """The broadcast of the hot-hash set is a bounded assumption
    (VERDICT r05 #6): above max_hot_broadcast the anti join must run
    shuffled, with identical rows."""
    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        dedup_paragraphs,
    )

    # pathological: many DISTINCT hot paragraphs (each shared by 2 docs)
    docs = spark.createDataFrame(
        [(i, f"p{i % 50}\nu{i}") for i in range(100)], "doc_id int, text string"
    )
    guarded = dedup_paragraphs(docs, max_df=1, max_hot_broadcast=1)
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan  # guard tripped -> shuffled anti
    baseline = dedup_paragraphs(docs, max_df=1, max_hot_broadcast=None)
    bplan = baseline._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bplan  # unguarded lane still broadcasts
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, baseline.collect())
    )


def test_adc_lut_lane_matches_literal_lane_bit_for_bit(spark, tmp_path):
    """The large-query-set scoring lane (VERDICT r05 #2): a broadcast
    LUT relation replaces the per-query literal fold, bit-identically.
    Pins (a) row equality on both pq_adc_topk and the persisted-index
    search, (b) the lut plan is a BroadcastHashJoin with NO per-query
    literal explode, (c) the index search keeps PartitionFilters
    pruning, (d) auto-routing flips on the threshold."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        search_ann_index,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        pq_adc_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    lit_rows = sorted(
        map(tuple, pq_adc_topk(emb, n_queries=12, topk=5, lane="literal").collect())
    )
    lut_df = pq_adc_topk(emb, n_queries=12, topk=5, lane="lut")
    lut_plan = lut_df._jdf.queryExecution().executedPlan().toString()
    # full-corpus ADC is inherently vector x query: a declared broadcast
    # product of the scan against the config-sized LUT relation
    assert "BroadcastNestedLoopJoin BuildRight" in lut_plan
    assert "Generate" not in lut_plan  # no posexplode of per-query structs
    assert sorted(map(tuple, lut_df.collect())) == lit_rows

    root = str(tmp_path / "idx")
    build_ann_index(spark, emb, root, n_clusters=4, m=4, k=8)
    queries = emb.where(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    lit_s = sorted(
        map(
            tuple,
            search_ann_index(
                spark, root, queries, k=5, nprobe=2, lane="literal"
            ).collect(),
        )
    )
    lut_s = search_ann_index(spark, root, queries, k=5, nprobe=2, lane="lut")
    plan = lut_s._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "PartitionFilters" in plan and "cluster" in plan
    assert sorted(map(tuple, lut_s.collect())) == lit_s

    # auto-routing: above the threshold the lut lane engages on its own
    auto = search_ann_index(
        spark, root, queries, k=5, nprobe=2, lut_lane_threshold=8
    )
    assert "BroadcastHashJoin" in (
        auto._jdf.queryExecution().executedPlan().toString()
    )
    assert sorted(map(tuple, auto.collect())) == lit_s


def _dir_file_hashes(path):
    import hashlib, os

    out = {}
    for base, _, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(base, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, path)] = hashlib.md5(fh.read()).hexdigest()
    return out


def test_ann_index_delete_matches_rebuild(spark, tmp_path):
    """delete_from_ann_index (VERDICT r06 #3): removing ids rewrites
    ONLY the affected cluster directories (untouched dirs stay
    byte-identical), search after delete equals search on an index
    rebuilt without those ids bit-for-bit, verify stays green, the
    version bumps, and a repeated delete is a no-op."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        delete_from_ann_index,
        load_ann_meta,
        search_ann_index,
        verify_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "idx")
    build_ann_index(spark, emb, root, n_clusters=4, m=4, k=8)

    vec = spark.read.option("basePath", f"{root}/vectors").parquet(f"{root}/vectors")
    by_cluster = {
        int(r["cluster"]): int(r["n"])
        for r in vec.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # delete ids > 20 from ONE cluster so at least one other cluster is
    # untouched (seed ids 0..7 must survive for the rebuild twin)
    target_cluster = max(by_cluster, key=by_cluster.get)
    doomed = sorted(
        r[0]
        for r in vec.where(
            (F.col("cluster") == target_cluster) & (F.col("vec_id") > 20)
        )
        .select("vec_id")
        .collect()
    )[:10]
    assert doomed, "fixture must have deletable ids in the biggest cluster"
    untouched = [c for c in by_cluster if c != target_cluster]
    before = {
        c: _dir_file_hashes(f"{root}/vectors/cluster={c}") for c in untouched
    }

    res = delete_from_ann_index(spark, root, doomed)
    assert res["removed"] == len(doomed)
    assert res["affected_clusters"] == [target_cluster]
    assert res["meta_version"] == 2
    verify_ann_index(spark, root)
    for c in untouched:
        assert _dir_file_hashes(f"{root}/vectors/cluster={c}") == before[c], c

    # rebuild twin without the deleted ids
    emb2 = emb.where(~F.col("vec_id").isin(doomed))
    root2 = str(tmp_path / "idx2")
    build_ann_index(spark, emb2, root2, n_clusters=4, m=4, k=8)
    queries = emb2.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        map(tuple, search_ann_index(spark, root, queries, k=5, nprobe=4).collect())
    )
    want = sorted(
        map(tuple, search_ann_index(spark, root2, queries, k=5, nprobe=4).collect())
    )
    assert got == want and len(got) == 6 * 5

    # idempotent: deleting the same ids again removes nothing
    res2 = delete_from_ann_index(spark, root, doomed)
    assert res2["removed"] == 0 and res2["meta_version"] == 2

    # empty out a whole cluster -> its directory disappears
    all_in = [
        r[0]
        for r in spark.read.option("basePath", f"{root}/vectors")
        .parquet(f"{root}/vectors")
        .where(F.col("cluster") == target_cluster)
        .select("vec_id")
        .collect()
    ]
    res3 = delete_from_ann_index(spark, root, all_in)
    assert res3["removed"] == len(all_in)
    import os

    assert not os.path.exists(f"{root}/vectors/cluster={target_cluster}")
    verify_ann_index(spark, root)


def test_ann_index_compact_preserves_full_probe_search(spark, tmp_path):
    """compact_ann_index: re-clustering (Lloyd from the stored
    centroids) changes WHERE vectors live, never what they score —
    full-probe search is bit-identical before and after; verify stays
    green; the version bumps; min_balance gates a no-op path."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        compact_ann_index,
        load_ann_meta,
        search_ann_index,
        verify_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "idx")
    build_ann_index(spark, emb, root, n_clusters=4, m=4, k=8)
    queries = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = sorted(
        map(tuple, search_ann_index(spark, root, queries, k=5, nprobe=4).collect())
    )

    skip = compact_ann_index(spark, root, min_balance=1e9)
    assert skip["compacted"] is False and skip["meta_version"] == 1

    res = compact_ann_index(spark, root, n_iters=2)
    assert res["compacted"] is True and res["meta_version"] == 2
    meta = load_ann_meta(root)
    assert meta["codebook_source"] == "compacted"
    verify_ann_index(spark, root)
    after = sorted(
        map(tuple, search_ann_index(spark, root, queries, k=5, nprobe=4).collect())
    )
    assert after == before


def test_search_ann_index_lut_lane_64bit_ids(spark, tmp_path):
    """64-bit ids must work on EVERY lane (ADVICE r06): the broadcast-LUT
    probe relation declared query_id as int, so ids above 2^31 failed at
    createDataFrame on that lane only while the literal lane accepted
    them. Shift all ids by 2^33 and require lane equality + a working
    rerank (whose query-vector relation had the same int schema)."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        search_ann_index,
    )

    off = 2 ** 33
    # deterministic seeding wants ids 0..k-1 present; everything else
    # rides 64-bit ids, and every query id is above 2^31
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).withColumn(
        "vec_id",
        F.when(F.col("vec_id") < 8, F.col("vec_id")).otherwise(
            F.col("vec_id") + F.lit(off)
        ),
    )
    root = str(tmp_path / "idx64")
    build_ann_index(spark, emb, root, n_clusters=4, m=4, k=8)
    queries = emb.where(
        (F.col("vec_id") >= off) & (F.col("vec_id") < off + 14)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    lit_s = sorted(
        map(
            tuple,
            search_ann_index(
                spark, root, queries, k=5, nprobe=2, lane="literal"
            ).collect(),
        )
    )
    lut_s = sorted(
        map(
            tuple,
            search_ann_index(
                spark, root, queries, k=5, nprobe=2, lane="lut"
            ).collect(),
        )
    )
    assert lut_s == lit_s and len(lut_s) == 6 * 5
    assert all(r[0] >= off for r in lut_s)
    rer = search_ann_index(
        spark, root, queries, k=3, nprobe=4, lane="lut", rerank_factor=3
    ).collect()
    assert len(rer) == 6 * 3
    assert all(r.query_id != r.vec_id for r in rer)


def test_ann_index_append_matches_rebuild_bit_for_bit(spark, tmp_path):
    """Incremental maintenance (VERDICT r05 #4): assigning appended
    vectors against the STORED centroids/codebook makes
    append-then-search == rebuild-then-search bit-for-bit when both
    indexes share the training rows (the first-k seeds live in the
    first half of the split). Also: meta version bumps, and the
    dimension guard rejects mismatched vectors."""
    import pytest
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        append_to_ann_index,
        build_ann_index,
        load_ann_meta,
        search_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cut = 30  # seeds (ids < 8) are all in the first half
    full_root = str(tmp_path / "full")
    inc_root = str(tmp_path / "inc")
    build_ann_index(spark, emb, full_root, n_clusters=4, m=4, k=8)
    build_ann_index(
        spark, emb.where(F.col("vec_id") < cut), inc_root, n_clusters=4, m=4, k=8
    )
    meta = append_to_ann_index(
        spark, emb.where(F.col("vec_id") >= cut), inc_root
    )
    assert meta["version"] == 2 and load_ann_meta(inc_root)["version"] == 2

    queries = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for nprobe, rerank in [(1, None), (2, None), (4, 3)]:
        a = sorted(
            map(tuple, search_ann_index(
                spark, full_root, queries, k=5, nprobe=nprobe,
                rerank_factor=rerank,
            ).collect())
        )
        b = sorted(
            map(tuple, search_ann_index(
                spark, inc_root, queries, k=5, nprobe=nprobe,
                rerank_factor=rerank,
            ).collect())
        )
        assert a == b, f"nprobe={nprobe} rerank={rerank}"

    with pytest.raises(ValueError, match="dim="):
        append_to_ann_index(
            spark,
            emb.select("vec_id", F.slice("embedding", 1, 8).alias("embedding")),
            inc_root,
        )
    with pytest.raises(ValueError, match="id_col"):
        append_to_ann_index(spark, emb, inc_root, id_col="other")
    with pytest.raises(ValueError, match="no ANN index"):
        append_to_ann_index(spark, emb, str(tmp_path / "nope"))


def test_normalize_text_matches_duckdb_and_catches_case_variants(spark):
    """normalize= for the dedup/contamination stack (VERDICT r05 #5):
    (a) the normalization expression is bit-identical to its DuckDB
    twin (lower + global regexp_replace) on tricky strings; (b) a
    case/punctuation-variant duplicate is CAUGHT with normalize=True on
    jaccard, minhash, and contamination, and MISSED with it off; (c)
    defaults-off output is unchanged (the pinned q18/q19/q37 oracles
    shingle raw tokens)."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions import (
        jaccard_pairs,
        minhash_signature_arrays,
        normalize_text,
        word_shingles,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        contamination_pairs,
    )

    samples = [
        "The Quick, Brown FOX!",
        "Phone: 555-123-4567 ext 89",
        "mixed   Whitespace\tand\nlines",
        "unicode Café naïve",
        "",
    ]
    got = [
        r.n
        for r in spark.createDataFrame([(s,) for s in samples], "t string")
        .select(normalize_text("t").alias("n"))
        .collect()
    ]
    want = [
        duckdb.execute(
            "SELECT regexp_replace(regexp_replace(lower(?), "
            "'[^0-9a-z\\s]+', ' ', 'g'), '[0-9]+', '0', 'g')",
            [s],
        ).fetchone()[0]
        for s in samples
    ]
    assert got == want

    docs = spark.createDataFrame(
        [
            (1, "The Quick Brown Fox Jumps Over The Lazy Dog"),
            (2, "the quick brown fox jumps over the lazy dog!"),
            (3, "entirely unrelated text with many different words here"),
        ],
        "doc_id int, text string",
    )
    raw_pairs = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            word_shingles(docs, "doc_id", "text", n=5), "doc_id", threshold=0.8
        ).collect()
    }
    norm_pairs = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            word_shingles(docs, "doc_id", "text", n=5, normalize=True),
            "doc_id",
            threshold=0.8,
        ).collect()
    }
    assert (1, 2) not in raw_pairs and (1, 2) in norm_pairs

    sig = {
        r.doc_id: tuple(r)[1:]
        for r in minhash_signature_arrays(
            docs, "doc_id", "text", n=5, num_hashes=6, normalize=True
        ).collect()
    }
    assert sig[1] == sig[2] != sig[3]

    eval_docs = spark.createDataFrame(
        [(100, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG")],
        "eval_id int, text string",
    )
    cont = lambda nm: {
        (r.doc_id, r.eval_id)
        for r in contamination_pairs(
            docs, eval_docs, n=5, min_containment=0.5, normalize=nm
        ).collect()
    }
    assert cont(False) == set()
    assert (1, 100) in cont(True) and (2, 100) in cont(True)


def test_unigram_logprob_matches_duckdb(spark):
    """The corpus-statistics quality scorer (the perplexity-filter slot):
    integer columns engine-exact, log columns tolerance-checked (ln ulps
    and sum order are engine-specific), OOV handling via min_df."""
    import math

    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.text import (
        unigram_logprob,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )

    def duck(min_df):
        return {
            r[0]: r[1:]
            for r in con.execute(f"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents),
            tc AS (SELECT doc_id, term, count(*)::BIGINT c FROM toks GROUP BY 1, 2),
            vocab AS (SELECT term, count(*)::BIGINT term_total FROM toks GROUP BY 1
                      HAVING count(*) >= {min_df}),
            total AS (SELECT count(*)::BIGINT corpus_total FROM toks),
            scored AS (
              SELECT doc_id, c,
                     (term_total IS NOT NULL) AS known,
                     c::DOUBLE * (ln((CASE WHEN term_total IS NOT NULL
                                      THEN term_total ELSE 1 END)::DOUBLE)
                                  - ln(corpus_total::DOUBLE)) AS lp
              FROM tc LEFT JOIN vocab USING (term) CROSS JOIN total)
            SELECT doc_id, sum(c), sum(CASE WHEN NOT known THEN c ELSE 0 END),
                   sum(lp), sum(lp) / sum(c)
            FROM scored GROUP BY doc_id
            """).fetchall()
        }

    docs = spark.read.parquet(path)
    for min_df in (1, 5):
        got = {
            r.doc_id: (r.n_tokens, r.n_oov, r.logprob_sum, r.avg_logprob)
            for r in unigram_logprob(docs, min_df=min_df).collect()
        }
        want = duck(min_df)
        assert set(got) == set(want)
        for d in got:
            assert got[d][0] == want[d][0] and got[d][1] == want[d][1]
            assert math.isclose(got[d][2], want[d][2], rel_tol=1e-9)
            assert math.isclose(got[d][3], want[d][3], rel_tol=1e-9)
    # min_df=1 over a corpus-trained model: nothing is OOV
    assert all(v[1] == 0 for v in duck(1).values())
    # rarer vocabulary -> lower (more negative) scores, by construction
    one, five = duck(1), duck(5)
    assert all(five[d][3] <= one[d][3] + 1e-12 for d in one)


def test_cap_per_group_matches_duckdb_and_is_deterministic(spark):
    """Per-source document cap (domain balancing): kept set equals the
    DuckDB row_number twin and is invariant to repartitioning."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
        cap_per_group,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path)
    got = {
        (r.source, r.doc_id, r.group_seq)
        for r in cap_per_group(docs, "source", "doc_id", 3).collect()
    }
    got_repart = {
        (r.source, r.doc_id, r.group_seq)
        for r in cap_per_group(
            docs.repartition(13), "source", "doc_id", 3
        ).collect()
    }
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.execute(f"""
        SELECT source, doc_id, seq FROM (
          SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) seq
          FROM read_parquet('{path}'))
        WHERE seq <= 3
        """).fetchall()
    }
    assert got == want == got_repart
    # WindowGroupLimit pushdown: the cap short-circuits inside the sort
    plan = (
        cap_per_group(docs, "source", "doc_id", 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_search_ann_index_df_matches_collected_lane(spark, tmp_path):
    """The collect-free distributed search lane: query set stays a
    DataFrame (corpus-scale kNN), probes and LUTs computed map-side
    with plan size constant in the query count — results bit-identical
    to the collected lanes across nprobe settings."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        build_ann_index,
        search_ann_index,
        search_ann_index_df,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "idx")
    build_ann_index(spark, emb, root, n_clusters=4, m=4, k=8)

    # a query set far beyond anything the literal lane should fold
    queries = emb.where(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for nprobe in (1, 2, 4):
        want = sorted(
            map(
                tuple,
                search_ann_index(
                    spark, root, queries, k=5, nprobe=nprobe, lane="lut",
                ).collect(),
            )
        )
        got_df = search_ann_index_df(spark, root, queries, k=5, nprobe=nprobe)
        assert sorted(map(tuple, got_df.collect())) == want, f"nprobe={nprobe}"
    # the scoring join is an equi-join on cluster (never a cross product)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    # two-stage rerank on the distributed lane: full probe + covering
    # shortlist must EQUAL brute-force cosine_topk (same fold, same ties)
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        cosine_topk,
    )

    n = emb.count()
    q3 = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got_rr = sorted(
        map(
            tuple,
            search_ann_index_df(
                spark, root, q3, k=5, nprobe=4, rerank_factor=n
            ).collect(),
        )
    )
    want_rr = sorted(map(tuple, cosine_topk(emb, q3, k=5).collect()))
    assert got_rr == want_rr


def test_ann_index_stats_and_verify(spark, tmp_path):
    """Maintenance observability: per-cluster counts vs a DuckDB twin
    over the same parquet plane, balance factor, version tracking
    through append, and the integrity gate raising on a corrupted
    index."""
    import duckdb
    import pytest
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.ann_index import (
        ann_index_stats,
        append_to_ann_index,
        build_ann_index,
        verify_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "idx")
    build_ann_index(spark, emb.where(F.col("vec_id") < 100), root,
                    n_clusters=4, m=4, k=8)
    append_to_ann_index(spark, emb.where(F.col("vec_id") >= 100), root)

    got = {r.cluster: r for r in ann_index_stats(spark, root).collect()}
    want = {
        c: n
        for c, n in duckdb.execute(
            f"SELECT cluster, count(*) FROM read_parquet('{root}/vectors/*/*.parquet', "
            f"hive_partitioning=true) GROUP BY cluster"
        ).fetchall()
    }
    assert {c: r.n_vectors for c, r in got.items()} == {int(c): n for c, n in want.items()}
    n_total = emb.count()
    any_row = next(iter(got.values()))
    assert any_row.total_vectors == n_total and any_row.meta_version == 2
    assert any_row.balance_factor >= 1.0

    assert verify_ann_index(spark, root) == {
        "total": n_total, "violations": 0, "dup_ids": 0, "meta_version": 2,
    }

    # appending already-indexed ids silently duplicates rows — the gate
    # must catch it (dup_ids)
    dup_root = str(tmp_path / "dup")
    build_ann_index(spark, emb, dup_root, n_clusters=4, m=4, k=8)
    append_to_ann_index(spark, emb.where(F.col("vec_id") < 5), dup_root)
    with pytest.raises(ValueError, match="failed verification"):
        verify_ann_index(spark, dup_root)

    # corrupt one stored file's codes -> the gate must raise
    import glob

    f = sorted(glob.glob(f"{root}/vectors/cluster=*/*.parquet"))[0]
    part = spark.read.parquet(f)
    corrupt_dir = str(tmp_path / "corrupt")
    (part.withColumn("codes", F.expr("slice(codes, 1, 2)"))
         .coalesce(1).write.mode("overwrite").parquet(corrupt_dir))
    import shutil

    shutil.copy(glob.glob(f"{corrupt_dir}/*.parquet")[0], f)
    import os

    crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
    if os.path.exists(crc):  # hadoop local-FS checksum sidecar
        os.remove(crc)
    with pytest.raises(ValueError, match="failed verification"):
        verify_ann_index(spark, root)


def test_hashed_tf_embedding_matches_duckdb_bit_exactly(spark):
    """Text -> vector bridge (signed feature hashing): the map-only
    Spark projection must agree bit-for-bit with a DuckDB twin doing
    the same md5-slice bucket/sign arithmetic over unnested tokens —
    integer bucket sums, then the left-to-right double fold for the L2
    norm reproduced in bucket order. Empty-text docs embed to the zero
    vector (not NULL, not dropped)."""
    import duckdb
    import math

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        hashed_tf_embedding,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    dim = 16
    docs = spark.read.parquet(path).where("doc_id < 40")
    got = {
        r.doc_id: list(r.embedding)
        for r in hashed_tf_embedding(docs, dim=dim).collect()
    }

    con = duckdb.connect()
    sums = con.execute(f"""
        SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 8))::BIGINT % {dim} AS bucket,
               SUM(1 - 2 * (('0x' || substr(md5(tok), 9, 8))::BIGINT % 2)) AS s
        FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
              FROM '{path}' WHERE doc_id < 40)
        WHERE tok <> ''
        GROUP BY 1, 2
    """).fetchall()
    all_ids = [r[0] for r in con.execute(
        f"SELECT doc_id FROM '{path}' WHERE doc_id < 40"
    ).fetchall()]
    raw = {i: [0.0] * dim for i in all_ids}
    for doc_id, bucket, s in sums:
        raw[doc_id][bucket] = float(s)
    want = {}
    for i, vec in raw.items():
        acc = 0.0
        for v in vec:  # same fold order as Spark's aggregate
            acc = acc + v * v
        want[i] = [v / math.sqrt(acc) for v in vec] if acc > 0 else vec

    assert set(got) == set(want) and len(got) >= 30
    for i in want:
        assert got[i] == want[i], f"doc {i}"


def test_hashed_tf_embedding_feeds_the_similarity_stack(spark):
    """Compose: hashed embeddings make near-duplicate text nearest in
    cosine space (the no-model similarity-search story), normalize=True
    embeds case/punctuation variants to the IDENTICAL vector, and the
    raw (un-normalized L2) lane keeps integer bucket counts."""
    import pytest

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        cosine_topk,
        hashed_tf_embedding,
    )
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " tail"),                 # near-dup of 0
            (2, "completely unrelated corpus text about spark plans"),
            (3, base.upper().replace(" ", ", ")),  # case/punct variant of 0
        ],
        "doc_id long, text string",
    )
    emb = hashed_tf_embedding(docs, dim=32).persist()
    q = emb.where("doc_id = 0").select(
        F.col("doc_id").alias("query_id"), "embedding"
    )
    top = (
        cosine_topk(emb.where("doc_id != 0"), q, k=2, id_col="doc_id")
        .orderBy("rank")
        .collect()
    )
    assert top[0].doc_id == 1 and top[0].cosine > 0.8
    emb.unpersist()

    norm = {
        r.doc_id: list(r.embedding)
        for r in hashed_tf_embedding(docs, dim=32, normalize=True).collect()
    }
    assert norm[0] == norm[3] and norm[0] != norm[2]

    raw = {
        r.doc_id: list(r.embedding)
        for r in hashed_tf_embedding(docs, dim=32, l2_normalize=False).collect()
    }
    assert all(v == int(v) for v in raw[0])  # integer counts pre-normalization
    assert sum(abs(v) for v in raw[0]) > 0

    with pytest.raises(ValueError, match="dim"):
        hashed_tf_embedding(docs, dim=0)


def test_semantic_dedup_matches_duckdb_exactly(spark):
    """SemDeDup chain vs a DuckDB reimplementation over the same
    parquet, bit-for-bit: seed-centroid assignment (argmax cosine, ties
    to the smaller seed id), intra-cluster exact-cosine pairs, greedy
    min-id keepers with best-match verdicts. Doubles compare exactly —
    both engines fold left-to-right (the q21-pinned idiom)."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        semantic_dedup,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(path)
    got = sorted(
        map(tuple, semantic_dedup(emb, threshold=0.3, n_seeds=4).collect())
    )
    assert len(got) == emb.count()
    dups = [r for r in got if not r[2]]
    assert dups, "threshold too high for the fixture — test is vacuous"
    for vec_id, cluster, keep, dup_of, cosine in got:
        assert keep == (dup_of is None)
        if not keep:
            assert dup_of < vec_id and cosine >= 0.3

    want = sorted(
        map(
            tuple,
            duckdb.connect().execute(f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                          list_transform(embedding::DOUBLE[],
                              x -> x / sqrt(list_inner_product(
                                       embedding::DOUBLE[],
                                       embedding::DOUBLE[]))) AS u
                   FROM '{path}'),
        c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 4),
        sc AS (SELECT e.vec_id, c.cid,
                      list_inner_product(e.v, c.cv) /
                      (sqrt(list_inner_product(e.v, e.v)) *
                       sqrt(list_inner_product(c.cv, c.cv))) AS cos
               FROM e CROSS JOIN c),
        asg AS (SELECT vec_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY cos DESC, cid ASC) AS rn
                  FROM sc) WHERE rn = 1),
        p AS (SELECT a.vec_id AS vec_id, b.vec_id AS dup_of,
                     list_inner_product(ea.u, eb.u) AS cosine
              FROM asg a JOIN asg b
                ON a.cluster = b.cluster AND a.vec_id > b.vec_id
              JOIN e ea ON ea.vec_id = a.vec_id
              JOIN e eb ON eb.vec_id = b.vec_id),
        best AS (SELECT vec_id, dup_of, cosine FROM (
                   SELECT vec_id, dup_of, cosine,
                          ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY cosine DESC, dup_of ASC) AS rn
                   FROM p WHERE cosine >= 0.3) WHERE rn = 1)
        SELECT asg.vec_id, asg.cluster, best.dup_of IS NULL AS keep,
               best.dup_of, best.cosine
        FROM asg LEFT JOIN best ON asg.vec_id = best.vec_id
    """).fetchall(),
        )
    )
    assert got == want

    # the blocked triangle join is pure parallelization: pair_blocks=1
    # (the plain cluster equi-join) is bit-identical
    plain = sorted(
        map(
            tuple,
            semantic_dedup(emb, threshold=0.3, n_seeds=4, pair_blocks=1).collect(),
        )
    )
    assert plain == got


def test_semantic_dedup_single_cluster_equals_global_greedy(spark):
    """With every vector forced into ONE cluster, semantic_dedup must
    reproduce the global greedy dedup derivable from the exact
    `cosine_pairs` baseline — the cluster pass only ever SHRINKS the
    candidate set, so this pins the verdict logic itself. Also asserts
    the production plan joins on the cluster key (no cartesian
    product)."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        cosine_pairs,
        semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    one = emb.select("vec_id", F.lit(0).alias("cluster"))
    got = {
        r.vec_id: (r.keep, r.dup_of)
        for r in semantic_dedup(emb, threshold=0.3, assignments=one).collect()
    }

    best: dict[int, tuple] = {}
    for r in cosine_pairs(emb, 0.3).collect():
        doc, dup_of = max(r.id_a, r.id_b), min(r.id_a, r.id_b)
        cur = best.get(doc)
        cand = (-r.cosine, dup_of)
        if cur is None or cand < cur:
            best[doc] = cand
    for vid, (keep, dup_of) in got.items():
        assert keep == (vid not in best), vid
        if not keep:
            assert dup_of == best[vid][1], vid

    plan = semantic_dedup(emb, threshold=0.3, n_seeds=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_zorder_value_matches_duckdb_exactly(spark):
    """The z-curve math (literal boundary-array bucket fold + bit
    interleave) vs a DuckDB reimplementation with the SAME boundary
    literals, bit-for-bit over real data — integer outputs, so engine
    agreement is exact."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        zorder_bucket,
        zorder_value,
    )

    path = "/root/testdata/sf0.001/lineitem.parquet"
    li = spark.read.parquet(path)
    b1 = [5.0, 12.5, 30.0]  # deliberately uneven, incl. non-integers
    b2 = [900.0, 1500.0, 2100.0]
    got = sorted(
        map(
            tuple,
            li.select(
                "l_orderkey",
                "l_linenumber",
                zorder_value(
                    [
                        zorder_bucket(F.col("l_orderkey"), b1),
                        zorder_bucket(F.col("l_partkey"), b2),
                    ],
                    bits=2,
                ).alias("z"),
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            duckdb.connect().execute(f"""
        WITH src AS (SELECT l_orderkey, l_linenumber,
            (CASE WHEN l_orderkey::DOUBLE >= 5.0 THEN 1 ELSE 0 END
           + CASE WHEN l_orderkey::DOUBLE >= 12.5 THEN 1 ELSE 0 END
           + CASE WHEN l_orderkey::DOUBLE >= 30.0 THEN 1 ELSE 0 END) AS ba,
            (CASE WHEN l_partkey::DOUBLE >= 900.0 THEN 1 ELSE 0 END
           + CASE WHEN l_partkey::DOUBLE >= 1500.0 THEN 1 ELSE 0 END
           + CASE WHEN l_partkey::DOUBLE >= 2100.0 THEN 1 ELSE 0 END) AS bb
          FROM '{path}')
        SELECT l_orderkey, l_linenumber,
               (((ba >> 0) & 1) << 1) + (((ba >> 1) & 1) << 3)
             + (((bb >> 0) & 1) << 0) + (((bb >> 1) & 1) << 2) AS z
        FROM src
    """).fetchall(),
        )
    )
    assert got == want


def test_zorder_udf_lane_matches_expression_lane(spark):
    """zorder_layout's vectorized z (numpy searchsorted + Morton,
    _zvalue_udf — r12: removes the ~2s-per-plan Janino compile of the
    2^bits-leaf CASE tree) must be BIT-IDENTICAL to the documented
    zorder_value/zorder_bucket expression lane over real data plus the
    NULL/NaN/inf edge rows the CASE tree routes to bucket 0 / top."""
    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        _z_sanitize,
        _zvalue_udf,
        zorder_bucket,
        zorder_value,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        F.col("l_orderkey").cast("double").alias("a"),
        F.col("l_partkey").cast("double").alias("b"),
    )
    edge = spark.createDataFrame(
        [
            (None, 7.0),
            (float("nan"), 3.0),
            (float("inf"), None),
            (float("-inf"), float("nan")),
            (12.5, float("inf")),
        ],
        "a double, b double",
    )
    df = li.unionByName(edge)
    b1 = [5.0, 12.5, 30.0, 3000.0]
    b2 = [900.0, 1500.0, 2100.0]
    expr = zorder_value(
        [zorder_bucket(F.col("a"), b1), zorder_bucket(F.col("b"), b2)],
        bits=3,
    )
    udf = _zvalue_udf([b1, b2], bits=3)(
        _z_sanitize(F.col("a")), _z_sanitize(F.col("b"))
    )
    rows = df.select(
        expr.alias("z_expr"), udf.alias("z_udf")
    ).collect()
    assert rows, "empty comparison set"
    for r in rows:
        assert r.z_expr == r.z_udf, r


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The pruning claim, asserted from the written parquet FOOTERS: a
    range predicate on either z-ordered column intersects a strict
    subset of the z-layout's files, while the single-column-sort
    baseline is all-files on its unsorted column. Also: the layout is
    a pure re-ordering (row multiset unchanged)."""
    import pyarrow.parquet as pq

    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        zorder_layout,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n_files = 8
    zdir = str(tmp_path / "zorder")
    zorder_layout(li, ["l_orderkey", "l_partkey"], n_files).write.parquet(zdir)
    sdir = str(tmp_path / "sorted_a")
    li.repartitionByRange(n_files, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(sdir)

    def ranges(d, col):
        import os

        out = []
        for name in sorted(os.listdir(d)):
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(f"{d}/{name}").metadata
            idx = md.schema.names.index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            out.append((min(los), max(his)))
        return out

    def intersecting(rs, lo, hi):
        return sum(1 for a, b in rs if not (b < lo or a > hi))

    ok_max = li.agg(F.max("l_orderkey")).first()[0]
    pk_max = li.agg(F.max("l_partkey")).first()[0]
    # a ~5%-wide range probe on each dimension
    ok_probe = (int(ok_max * 0.40), int(ok_max * 0.45))
    pk_probe = (int(pk_max * 0.40), int(pk_max * 0.45))

    z_ranges_ok = ranges(zdir, "l_orderkey")
    z_files = len(z_ranges_ok)  # the cell-id range sampler may merge
    z_ok = intersecting(z_ranges_ok, *ok_probe)
    z_pk = intersecting(ranges(zdir, "l_partkey"), *pk_probe)
    s_ok = intersecting(ranges(sdir, "l_orderkey"), *ok_probe)
    s_pk = intersecting(ranges(sdir, "l_partkey"), *pk_probe)

    assert s_ok <= 2  # perfect on the sorted column...
    assert s_pk == n_files  # ...and useless on the other
    # z-order with cell-aligned file boundaries: 8 cells = 4 orderkey
    # slabs x 2 partkey slabs, so a narrow probe hits <= 2 ok-slabs
    # (<= 1/2 the files) and <= 1 pk-slab (+1 merged-cell straddle)
    assert 6 <= z_files <= n_files
    assert z_ok <= z_files // 2, (z_ok, z_files)
    assert z_pk <= z_files * 3 // 4, (z_pk, z_files)

    # pure re-ordering: multiset of rows unchanged
    assert (
        spark.read.parquet(zdir)
        .exceptAll(li)
        .unionByName(li.exceptAll(spark.read.parquet(zdir)))
        .isEmpty()
    )

    import pytest

    with pytest.raises(ValueError, match="numeric"):
        zorder_layout(
            li.withColumn("s", F.lit("x")), ["l_orderkey", "s"], 4
        )
    with pytest.raises(ValueError, match="bits"):
        zorder_layout(li, ["l_orderkey"], 4, bits=0)


def test_duplicated_spans_semantics_and_cut(spark):
    """Substring-span dedup on a planted corpus: a 12-token passage
    shared by three docs is recovered as ONE maximal span per
    non-keeper doc (keep-one: the smallest (id, pos) occurrence is
    never flagged), cut_spans removes exactly those tokens (checked
    against a pure-Python token-slice reference), and an untouched doc
    keeps its text byte-identical (odd whitespace preserved)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        cut_spans,
        duplicated_spans,
        positional_windows,
    )

    passage = " ".join(f"p{i}" for i in range(12))
    docs = [
        (1, f"alpha beta {passage} gamma delta"),
        (2, f"x0 x1 x2 {passage} y0  y1"),
        (3, f"{passage} tail0 tail1 tail2 tail3"),
        (4, "unique  words   only here\tnothing shared at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n = 6
    spans = duplicated_spans(df, n=n).orderBy("doc_id", "span_start").collect()

    # keeper = doc 1 (smallest id): never flagged; docs 2 and 3 carry
    # exactly one maximal span each, covering the full planted passage
    assert [r.doc_id for r in spans] == [2, 3]
    by_doc = {r.doc_id: r for r in spans}
    assert (by_doc[2].span_start, by_doc[2].span_end) == (3, 15)
    assert (by_doc[3].span_start, by_doc[3].span_end) == (0, 12)
    # 12-token passage -> 12 - n + 1 = 7 windows merged per span
    assert all(r.n_windows == 12 - n + 1 for r in spans)

    # keep-one guarantee: every duplicated window hash retains exactly
    # one unflagged occurrence
    wins = positional_windows(df, n=n).collect()
    from collections import Counter

    cnt = Counter(w.win_hash for w in wins)
    flagged_positions = set()
    for r in spans:
        flagged_positions |= {
            (r.doc_id, p) for p in range(r.span_start, r.span_end - n + 1)
        }
    for h, c in cnt.items():
        occ = [(w.doc_id, w.pos) for w in wins if w.win_hash == h]
        surviving = [o for o in occ if o not in flagged_positions]
        assert len(surviving) == (1 if c >= 2 else c), h

    # cut matches the Python token-slice reference; untouched docs
    # byte-identical
    cut = {r.doc_id: r for r in cut_spans(df, duplicated_spans(df, n=n)).collect()}
    texts = dict(docs)
    import re

    for did in (1, 4):
        assert cut[did].text_dedup == texts[did]
        assert cut[did].tokens_removed == 0
    for did in (2, 3):
        toks = re.split(r"\s+", texts[did].strip())
        s = by_doc[did]
        want = " ".join(toks[: s.span_start] + toks[s.span_end :])
        assert cut[did].text_dedup == want
        assert cut[did].tokens_removed == s.span_end - s.span_start


def test_duplicated_spans_matches_duckdb_exactly(spark):
    """The full span chain (positional md5 windows -> count/row_number
    keeper flags -> interval-merge spans) agrees bit-for-bit with a
    DuckDB reimplementation over the sf0.01 documents parquet."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        duplicated_spans,
    )

    path = "/root/testdata/sf0.01/documents.parquet"
    n = 8
    got = [
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicated_spans(spark.read.parquet(path), n=n)
        .orderBy("doc_id", "span_start")
        .collect()
    ]
    want = duckdb.connect().execute(f"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
          FROM '{path}' WHERE len(string_split_regex(trim(text), '\\s+')) >= {n}),
        wins AS (
          SELECT doc_id, i - 1 AS pos,
                 md5(array_to_string(list_slice(t, i, i + {n} - 1), ' ')) AS h
          FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {n} + 2)) AS i)),
        flagged AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   COUNT(*) OVER (PARTITION BY h) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
            FROM wins)
          WHERE cnt >= 2 AND rn > 1),
        marked AS (
          SELECT doc_id, pos,
                 CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END AS ns
          FROM (SELECT doc_id, pos,
                       MAX(pos + {n}) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS prev_end
                FROM flagged)),
        sp AS (
          SELECT doc_id, pos,
                 SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM marked)
        SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {n} AS span_end,
               COUNT(*) AS n_windows
        FROM sp GROUP BY doc_id, sid ORDER BY doc_id, span_start
    """).fetchall()
    assert got == [tuple(w) for w in want]
    # the fixture corpus genuinely contains duplicated passages at n=8,
    # otherwise this twin proves nothing
    assert len(got) > 0


def test_bloom_prefilter_no_false_negatives_and_plan(spark):
    """The bloom pre-filter contract: every true member of the built
    set survives (no false negatives — bit-identical downstream joins),
    the corpus side genuinely shrinks (the point of the filter), and
    the probe adds NO exchange beyond the bitset build (map-only)."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        bloom_filter_shingles,
        shingle_bloom,
        word_shingles,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    eval_docs = docs.where(F.col("doc_id") % 7 == 3).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    sh_docs = word_shingles(docs, "doc_id", "text", n=5)
    sh_eval = word_shingles(eval_docs, "eval_id", "text", n=5)
    m = 1 << 17
    bloom = shingle_bloom(sh_eval, m_bits=m, k=5)

    # no false negatives: filtering the member set itself loses nothing
    n_eval = sh_eval.count()
    assert bloom_filter_shingles(sh_eval, bloom, m_bits=m, k=5).count() == n_eval

    # effectiveness: the non-member majority is dropped
    n_docs_all = sh_docs.count()
    n_docs_kept = bloom_filter_shingles(sh_docs, bloom, m_bits=m, k=5).count()
    assert n_docs_kept < n_docs_all

    # map-only probe: no SHUFFLE exchange beyond those the bitset build
    # needs (the probe itself adds exactly one BroadcastExchange of the
    # one-row bitset, which moves W longs, not data)
    def exchanges(df):
        s = df._jdf.queryExecution().executedPlan().toString()
        return s.count("Exchange") - s.count("BroadcastExchange")

    assert exchanges(
        bloom_filter_shingles(sh_docs, bloom, m_bits=m, k=5)
    ) == exchanges(bloom)


def test_contamination_bloom_results_bit_identical(spark):
    """contamination_pairs with the bloom pre-filter returns exactly
    the rows the exact lane returns (the no-false-negative guarantee
    composed through the inverted-index join), including at a bitset
    size small enough to produce real false positives."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        contamination_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    eval_docs = docs.where(F.col("doc_id") % 7 == 3).select(
        F.col("doc_id").alias("eval_id"), "text"
    )

    def run(**kw):
        return sorted(
            (r.doc_id, r.eval_id, r.overlap, r.eval_sz, r.containment)
            for r in contamination_pairs(
                docs, eval_docs, n=5, min_containment=0.3, **kw
            ).collect()
        )

    exact = run()
    assert run(bloom_bits=1 << 17) == exact
    # deliberately undersized bitset: false-positive rate is high but
    # results must STILL be identical (false positives only waste work)
    assert run(bloom_bits=1 << 8, bloom_k=2) == exact


def test_bucketed_layout_shuffle_free_join_and_bucket_pruning(spark, tmp_path):
    """The bucketed layout's two claims, asserted from plans: (1) two
    tables bucketed on the join key into the same bucket count
    sort-merge-join with ZERO shuffle exchanges — the write-once
    shuffle is the whole point; (2) an equality predicate on the
    bucket column prunes the scan to 1 of the N buckets. Results are
    identical to the plain parquet join."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        bucketed_layout,
    )

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    bo = bucketed_layout(
        orders, "t_orders_bkt", ["o_orderkey"], 4,
        path=str(tmp_path / "orders_bkt"),
    )
    bl = bucketed_layout(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_bkt", ["o_orderkey"], 4,
        path=str(tmp_path / "lineitem_bkt"),
    )

    joined = bo.hint("merge").join(bl, on="o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # zero shuffles

    want = sorted(
        map(
            tuple,
            orders.join(
                lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
                on="o_orderkey",
            ).collect(),
        )
    )
    assert sorted(map(tuple, joined.collect())) == want

    # bucket pruning only applies while bucketed READING is on; the
    # auto-bucketed-scan planner rule turns bucketed reading off for
    # plans with no bucketing-aware operator (SPARK-32859) and silently
    # forfeits pruning with it — pin it on for the pruning leg
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        pruned = bo.where(F.col("o_orderkey") == 7)
        pplan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 4" in pplan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )

    spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")


def test_compact_small_files_unpartitioned(spark, tmp_path):
    """Compacting an unpartitioned store: file count drops to
    ceil(bytes/target), rows are identical, the merge plan has ZERO
    shuffle exchanges (coalesce is a file-merge, not a repartition),
    and re-running reaches a FIXPOINT: compression gains from a pass
    can shrink byte totals enough to justify one further merge, after
    which runs are no-ops that leave files byte-identical."""
    import math
    import os

    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        _list_data_files,
        compact_small_files,
    )

    store = str(tmp_path / "li")
    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    src.repartition(32).write.parquet(store)
    before = _list_data_files(store)
    assert len(before) == 32
    total = sum(os.path.getsize(f) for f in before)
    target = total // 3  # expect ceil(3.x) = 4 files
    want_n = max(1, math.ceil(total / target))

    # the merge Spark runs under the hood is shuffle-free
    plan = (
        spark.read.parquet(store).coalesce(want_n)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan

    rep = compact_small_files(spark, store, target_file_bytes=target)
    after = _list_data_files(store)
    assert rep["compacted"]["."] == (32, len(after))
    assert len(after) == want_n
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == sorted(
        map(tuple, src.collect())
    )

    for _ in range(3):  # fixpoint within a bounded number of passes
        if not compact_small_files(spark, store, target_file_bytes=target)[
            "compacted"
        ]:
            break
    else:
        raise AssertionError("compaction did not reach a fixpoint")
    h1 = _dir_file_hashes(store)
    rep2 = compact_small_files(spark, store, target_file_bytes=target)
    assert rep2["compacted"] == {} and rep2["skipped"] == ["."]
    assert _dir_file_hashes(store) == h1
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == sorted(
        map(tuple, src.collect())
    )


def test_compact_small_files_partition_scoped(spark, tmp_path):
    """partition_filter scopes the rewrite: only the selected hive
    partition's directory is rewritten (every other partition's files
    stay byte-identical), partition column values survive, and the
    full-store read is row-identical before/after."""
    import os

    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        _list_data_files,
        compact_small_files,
    )

    store = str(tmp_path / "orders")
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        src.repartition(8)
        .write.partitionBy("o_orderpriority")
        .parquet(store)
    )
    want_rows = sorted(map(tuple, spark.read.parquet(store).collect()))
    dirs = sorted(
        n for n in os.listdir(store) if n.startswith("o_orderpriority=")
    )
    assert len(dirs) == 5
    tgt = dirs[0]
    tgt_val = tgt.split("=", 1)[1]
    assert len(_list_data_files(f"{store}/{tgt}")) == 8
    others_before = {
        d: _dir_file_hashes(f"{store}/{d}") for d in dirs if d != tgt
    }

    rep = compact_small_files(
        spark,
        store,
        target_file_bytes=1 << 30,
        partition_filter=f"o_orderpriority = '{tgt_val}'",
    )
    assert list(rep["compacted"]) == [tgt]
    assert rep["compacted"][tgt] == (8, 1)
    assert len(_list_data_files(f"{store}/{tgt}")) == 1
    for d, h in others_before.items():
        assert _dir_file_hashes(f"{store}/{d}") == h

    assert (
        sorted(map(tuple, spark.read.parquet(store).collect())) == want_rows
    )


def test_compact_small_files_all_partitions_with_sort(spark, tmp_path):
    """No filter -> every partition compacts concurrently; sort_cols
    re-sorts rows within each output file (asserted from the written
    file's row order)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        _list_data_files,
        compact_small_files,
    )

    store = str(tmp_path / "orders")
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src.repartition(6).write.partitionBy("o_orderpriority").parquet(store)

    rep = compact_small_files(
        spark,
        store,
        target_file_bytes=1 << 30,
        sort_cols=["o_orderkey"],
        max_parallel=2,
    )
    assert len(rep["compacted"]) == 5 and rep["skipped"] == []
    import os

    for d in os.listdir(store):
        if not d.startswith("o_orderpriority="):
            continue
        files = _list_data_files(f"{store}/{d}")
        assert len(files) == 1
        keys = [
            r.o_orderkey
            for r in spark.read.parquet(files[0]).select("o_orderkey").collect()
        ]
        assert keys == sorted(keys)
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == sorted(
        map(tuple, src.collect())
    )


def test_delete_rows_rewrites_only_affected_files(spark, tmp_path):
    """GDPR-style delete: with a range-sorted layout, a range predicate
    touches ONE file — it alone is rewritten, the rest stay
    byte-identical; surviving rows are exactly source-minus-predicate;
    a re-run is a no-op."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        _list_data_files,
        delete_rows,
    )

    store = str(tmp_path / "li")
    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    src.repartitionByRange(8, F.col("l_orderkey")).write.parquet(store)
    assert len(_list_data_files(store)) == 8
    lo = src.agg(F.min("l_orderkey")).collect()[0][0]
    pred = f"l_orderkey <= {lo + 5}"
    n_del = src.where(pred).count()
    assert n_del > 0
    before = _dir_file_hashes(store)

    rep = delete_rows(spark, store, pred)
    assert rep["files_rewritten"] == 1 and rep["files_removed"] == 0
    assert rep["rows_deleted"] == n_del

    after = _dir_file_hashes(store)
    changed = {k for k in before if before[k] != after.get(k)}
    # exactly one data file (+ its crc sidecar) changed
    assert len({c for c in changed if not c.endswith(".crc")}) == 1
    assert sorted(map(tuple, spark.read.parquet(store).collect())) == sorted(
        map(tuple, src.where(f"NOT ({pred})").collect())
    )

    rep2 = delete_rows(spark, store, pred)
    assert rep2 == {
        "files_rewritten": 0, "files_removed": 0, "rows_deleted": 0,
    }
    assert _dir_file_hashes(store) == after


def test_delete_rows_partition_column_predicate(spark, tmp_path):
    """A predicate mixing a hive-partition column and a data column
    rewrites only that partition's files; untouched partitions stay
    byte-identical and the partition column survives the rewrite."""
    import os

    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        delete_rows,
    )

    store = str(tmp_path / "orders")
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src.repartition(2).write.partitionBy("o_orderpriority").parquet(store)
    dirs = sorted(
        n for n in os.listdir(store) if n.startswith("o_orderpriority=")
    )
    tgt_val = dirs[0].split("=", 1)[1]
    pred = f"o_orderpriority = '{tgt_val}' AND o_orderkey % 2 = 0"
    n_del = src.where(pred).count()
    assert n_del > 0
    others_before = {
        d: _dir_file_hashes(f"{store}/{d}") for d in dirs[1:]
    }

    rep = delete_rows(spark, store, pred)
    assert rep["rows_deleted"] == n_del
    for d, h in others_before.items():
        assert _dir_file_hashes(f"{store}/{d}") == h
    got = sorted(
        map(tuple, spark.read.parquet(store).select(*src.columns).collect())
    )
    assert got == sorted(
        map(tuple, src.where(f"NOT ({pred})").collect())
    )


def test_delete_rows_removes_fully_matching_files(spark, tmp_path):
    """A file whose every row matches is removed outright, not
    rewritten empty."""
    from aws_glue_data_catalog_replication_utility_spark.functions.layout import (
        delete_rows,
    )

    store = str(tmp_path / "orders")
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src.repartition(2).write.partitionBy("o_orderpriority").parquet(store)
    import os

    dirs = sorted(
        n for n in os.listdir(store) if n.startswith("o_orderpriority=")
    )
    tgt_val = dirs[0].split("=", 1)[1]
    pred = f"o_orderpriority = '{tgt_val}'"
    n_del = src.where(pred).count()

    rep = delete_rows(spark, store, pred)
    assert rep["files_removed"] == 2 and rep["files_rewritten"] == 0
    assert rep["rows_deleted"] == n_del
    assert spark.read.parquet(store).count() == src.count() - n_del


def test_leakage_safe_split_keeps_clusters_together(spark):
    """The anti-leak guarantee: docs linked by the dedup pipeline land
    in the same split, singletons spread ~per the declared percents,
    and the whole assignment is pinned bit-exact against a DuckDB twin
    of the salted-md5 bucket ranges."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        connected_components,
    )
    from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
        leakage_safe_split,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n = docs.count()
    # plant duplicate links chaining doc ids: (0,1),(1,2), (10,11), ...
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (30, 31), (31, 32)],
        "id_a bigint, id_b bigint",
    )
    labels = connected_components(pairs, docs.select("doc_id"))
    try:
        lab = labels.withColumnRenamed("id", "doc_id")
        out = leakage_safe_split(
            docs,
            {"train": 90, "eval": 5, "test": 5},
            labels=lab,
            id_col="doc_id",
        )
        got = {r.doc_id: (r.cluster_key, r.split) for r in out.collect()}

        # every planted cluster is split-homogeneous
        for cluster in [(0, 1, 2), (10, 11), (20, 21), (30, 31, 32)]:
            assert len({got[i][1] for i in cluster}) == 1

        # proportions on ~singleton corpus: train gets the bulk
        from collections import Counter

        frac = Counter(v[1] for v in got.values())
        assert frac["train"] / n > 0.8
        assert 0 < frac["eval"] / n < 0.15
        assert 0 < frac["test"] / n < 0.15

        # DuckDB twin: identical join + salted-md5 bucket + ranges
        con = duckdb.connect()
        con.register("labels", lab.toPandas())
        con.execute(
            "CREATE VIEW docs AS SELECT doc_id FROM "
            "'/root/testdata/sf0.01/documents.parquet'"
        )
        want = dict(con.execute(
            """
            WITH keyed AS (
              SELECT d.doc_id,
                     CAST(coalesce(l.label, d.doc_id) AS VARCHAR) AS ck
              FROM docs d LEFT JOIN labels l USING (doc_id)
            ), b AS (
              SELECT doc_id, ck,
                     ('0x' || substring(md5('split:' || ck), 1, 8))::BIGINT
                       % 100 AS bk
              FROM keyed
            )
            SELECT doc_id,
                   CASE WHEN bk < 90 THEN 'train'
                        WHEN bk < 95 THEN 'eval'
                        ELSE 'test' END
            FROM b
            """
        ).fetchall())
        assert {k: v[1] for k, v in got.items()} == want
    finally:
        labels.unpersist()


def test_leakage_safe_split_validation(spark):
    from aws_glue_data_catalog_replication_utility_spark.functions.sampling import (
        leakage_safe_split,
    )

    df = spark.createDataFrame([(1,)], "doc_id bigint")
    import pytest

    with pytest.raises(ValueError, match="sum to 100"):
        leakage_safe_split(df, {"train": 60, "eval": 30})
    with pytest.raises(ValueError, match="non-negative"):
        leakage_safe_split(df, {"train": 150, "eval": -50})


def test_retired_q58_pq_codes_duckdb_parity(spark):
    """q58_product_quantization left the 50-slot registry in r09 (the
    skip-index scan took the slot); the retired-slot discipline keeps
    its DuckDB oracle running HERE bit-exactly, so the PQ code
    semantics stay pinned by three independent checks (this twin, plus
    the q59/q60 registry slots that consume the same codes)."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.queries import (
        RETIRED_ORACLES,
        q58_product_quantization,
    )

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    got = sorted(
        tuple(r) for r in q58_product_quantization(spark, sf).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            RETIRED_ORACLES["q58_product_quantization"]
        ).fetchall()
    )
    assert got == want


def test_retired_q54_int8_quantization_duckdb_parity(spark):
    """q54_embedding_quantization left the 50-slot registry in r10
    (the schema-evolution read took the slot); the retired-slot
    discipline keeps its DuckDB oracle running HERE bit-exactly, so
    the int8 scalar-quantization semantics stay pinned by three
    independent checks (this twin, plus the q59/q60 registry slots
    that consume the same quantized lane)."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.queries import (
        RETIRED_ORACLES,
        q54_embedding_quantization,
    )

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    got = sorted(
        tuple(r) for r in q54_embedding_quantization(spark, sf).collect()
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            RETIRED_ORACLES["q54_embedding_quantization"]
        ).fetchall()
    )
    assert got == want


def _aniso_embeddings(spark, n=300, d=16, seed=7):
    """Anisotropic synthetic embeddings: energy concentrated in the
    first raw dimensions, so contiguous PQ subspaces are unbalanced —
    the regime OPQ exists for. Deterministic (seeded numpy)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    X = np.zeros((n, d))
    X[:, : d // 4] = rng.normal(0, 10.0, size=(n, d // 4))
    X[:, d // 4 :] = rng.normal(0, 0.5, size=(n, d - d // 4))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>"),
        X.astype(np.float32).astype(np.float64),
    )


def test_opq_rotation_orthogonal_balanced_and_distributed_apply(spark):
    """R is orthogonal; eigenvalue allocation balances per-subspace
    variance loads vs the raw contiguous split; the distributed
    apply_rotation equals the numpy matmul."""
    import numpy as np

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        apply_rotation,
        opq_rotation,
    )

    df, X = _aniso_embeddings(spark)
    m, d = 4, X.shape[1]
    sub = d // m
    rep = opq_rotation(df, m=m, k=8)
    R = np.asarray(rep["rotation"])
    assert np.allclose(R @ R.T, np.eye(d), atol=1e-8)

    def loads(Y):
        return [
            float(np.log(Y[:, j * sub : (j + 1) * sub].var(axis=0) + 1e-12).sum())
            for j in range(m)
        ]

    raw_spread = np.ptp(loads(X - X.mean(0)))
    rot_spread = np.ptp(loads((X - X.mean(0)) @ R))
    assert rot_spread < raw_spread / 2  # demonstrably more balanced

    got = {
        r.vec_id: np.asarray(r.embedding)
        for r in apply_rotation(df, rep["rotation"]).collect()
    }
    want = (X @ R).astype(np.float32)
    for i in range(len(want)):
        assert np.allclose(got[i], want[i], atol=1e-5), i


def test_opq_refinement_mse_non_increasing(spark):
    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        opq_rotation,
    )

    df, _ = _aniso_embeddings(spark, n=200)
    rep = opq_rotation(df, m=4, k=8, n_iters=4)
    assert len(rep["mse"]) == 5
    assert rep["mse"][-1] <= rep["mse"][0] * 1.0000001


def test_opq_improves_adc_recall_on_anisotropic(spark):
    """The load-bearing claim: on energy-concentrated embeddings the
    SAME integer PQ/ADC machinery recalls more true neighbors after
    the OPQ rotation than before — and rotation never changes the true
    neighbors (L2 is rotation-invariant; ground truth computed on raw
    floats)."""
    import numpy as np

    from aws_glue_data_catalog_replication_utility_spark.functions.similarity import (
        opq_adc_topk,
        opq_rotation,
        pq_adc_topk,
    )

    df, X = _aniso_embeddings(spark, n=300)
    n_queries, topk = 8, 10

    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(d2, np.inf)
    truth = {
        q: set(np.argsort(d2[q], kind="stable")[:topk]) for q in range(n_queries)
    }

    def recall(res):
        hits = 0
        for r in res.collect():
            if r.vec_id in truth[r.query_id]:
                hits += 1
        return hits / (n_queries * topk)

    plain = recall(
        pq_adc_topk(df, m=4, k=8, n_queries=n_queries, topk=topk)
    )
    rep = opq_rotation(df, m=4, k=8)
    opq = recall(
        opq_adc_topk(df, rep, m=4, k=8, n_queries=n_queries, topk=topk)
    )
    assert opq > plain, (opq, plain)


def test_split_guard_size_cap(spark, monkeypatch):
    """r13 size-adaptive split guard: the core-derived target is capped
    so each task gets >= SPARK_GRAFT_SPLIT_TASK_BYTES of input —
    slicing a tiny relation to the core count pays per-task Python/
    scheduling overhead for no compute (measured: 594 KB docs at 32
    slices ran 2.7x slower than at 4)."""
    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        ensure_min_parallelism,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.rdd.getNumPartitions()

    # size cap binds: a huge per-task budget drives the target to 1,
    # so the tiny relation is left alone (no repartition at all)
    monkeypatch.setenv("SPARK_GRAFT_SPLIT_TASK_BYTES", str(10**12))
    assert (
        ensure_min_parallelism(docs, keys=["doc_id"]).rdd.getNumPartitions()
        == base
    )

    # size target huge (1 byte per task): core-derived target rules,
    # exactly the pre-r13 behavior (cpus=4 test session)
    monkeypatch.setenv("SPARK_GRAFT_SPLIT_TASK_BYTES", "1")
    assert (
        ensure_min_parallelism(docs, keys=["doc_id"]).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )

    # 0 disables the cap (documented escape hatch)
    monkeypatch.setenv("SPARK_GRAFT_SPLIT_TASK_BYTES", "0")
    assert (
        ensure_min_parallelism(docs, keys=["doc_id"]).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )

    # malformed values fail with the variable named, not a bare int()
    monkeypatch.setenv("SPARK_GRAFT_SPLIT_TASK_BYTES", "abc")
    import pytest

    with pytest.raises(ValueError, match="SPARK_GRAFT_SPLIT_TASK_BYTES"):
        ensure_min_parallelism(docs, keys=["doc_id"])

    # results are partitioning-invariant: same rows either way
    monkeypatch.delenv("SPARK_GRAFT_SPLIT_TASK_BYTES")
    out = ensure_min_parallelism(docs, fraction=1.0, keys=["doc_id"])
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )


def test_cc_large_graph_path_executes_pair_plan_once(spark):
    """r13 probe hygiene (ADVICE r12): on the over-threshold path the
    local-lane probe must not cost a throwaway partial execution of an
    unpersisted pair relation — the relation is pinned, ONE full count
    decides eligibility and fills the cache, and the distributed lane's
    edge build reads blocks. An accumulator inside the pair projection
    counts plan executions row-exactly."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        connected_components,
        connected_components_star,
    )

    base = [(i, i + 1) for i in range(6)]

    for cc in (connected_components, connected_components_star):
        acc = spark.sparkContext.accumulator(0)

        @F.udf("long")
        def bump(x, _acc=acc):
            _acc.add(1)
            return x

        pairs = spark.createDataFrame(base, "a long, b long").select(
            bump("a").alias("id_a"), F.col("b").alias("id_b")
        )
        verts = spark.range(7).select(F.col("id").alias("doc_id"))
        labels = cc(pairs, verts, "doc_id", local_edges=2)  # 6 edges > 2
        got = {r.id: r.label for r in labels.collect()}
        labels.unpersist()
        assert got == {i: 0 for i in range(7)}, got
        assert not pairs.is_cached  # probe pin released
        assert acc.value == len(base), (cc.__name__, acc.value)


def test_cc_star_local_lane_drops_out_of_vertex_endpoints(spark):
    """ADVICE r12: for out-of-contract input (pair endpoints absent
    from `vertices`) the star lane's local fast path must produce the
    same ROW SET as its distributed rounds (vertex left join drops the
    foreign endpoints), so the env-tunable threshold never changes a
    result. The min-label lane keeps such endpoints — in both of ITS
    lanes."""
    from pyspark.sql import functions as F

    from aws_glue_data_catalog_replication_utility_spark.functions.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 99), (3, 4)], "id_a long, id_b long"
    )  # 99 is not a vertex
    verts = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")

    def rows(cc, **kw):
        df = cc(pairs, verts, "doc_id", **kw)
        out = {(r.id, r.label) for r in df.collect()}
        df.unpersist()
        return out

    star_local = rows(connected_components_star)
    star_dist = rows(connected_components_star, local_edges=0)
    assert star_local == star_dist
    assert not any(i == 99 for i, _ in star_local)

    minlab_local = rows(connected_components)
    minlab_dist = rows(connected_components, local_edges=0)
    assert minlab_local == minlab_dist
    assert (99, 1) in minlab_local
