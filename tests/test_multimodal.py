"""Multimodal column model tests: binary blob + metadata plumbing and
the Arrow-batched mapInPandas featurizer (functions/multimodal.py) —
the generalization of the reference's S3 side-channel for oversized
payloads (S3Util.java:44-71, LargeTable.java:14-21)."""

from __future__ import annotations

import hashlib

from aws_glue_data_catalog_replication_utility_spark.functions.multimodal import (
    INLINE_THRESHOLD,
    attach_blob,
    blob_features,
    decode_audio,
    decode_image,
    sample_frames,
)


def test_blob_features_byte_exact(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "héllo")],  # multi-byte UTF-8 case
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in blob_features(attach_blob(df)).collect()}
    assert rows[1].byte_length == 11
    assert rows[1].content_md5 == hashlib.md5(b"hello world").hexdigest()
    assert rows[1].magic_hex == b"hell".hex().upper()
    assert rows[2].byte_length == 0 and rows[2].magic_hex == ""
    # é is 2 bytes in UTF-8: length counts bytes, not chars
    assert rows[3].byte_length == 6
    assert rows[3].magic_hex == "héllo".encode()[:4].hex().upper()


def test_attach_blob_routes_large_payloads_to_path(spark):
    small = "x" * 10
    large = "y" * (INLINE_THRESHOLD + 1)
    df = spark.createDataFrame(
        [(1, small), (2, large)], "doc_id long, text string"
    )
    metas = {r.doc_id: r.meta for r in attach_blob(df).collect()}
    # inline-vs-side-channel routing, the reference's threshold pattern
    assert metas[1].source_path is None
    assert metas[2].source_path == "blob://2"
    assert metas[1].byte_length == 10
    assert metas[2].byte_length == INLINE_THRESHOLD + 1


def _encode_bmp(width, height, rgb_rows, bits=24):
    """Minimal BI_RGB BMP writer (bottom-up, padded rows) for synthetic
    fixtures; rgb_rows[y][x] = (r, g, b) top-to-bottom."""
    import struct

    nch = bits // 8
    stride = ((bits * width + 31) // 32) * 4
    pix = bytearray()
    for y in range(height - 1, -1, -1):  # BMP stores bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = rgb_rows[y][x]
            row += bytes([b, g, r] + ([255] if nch == 4 else []))
        row += b"\x00" * (stride - len(row))
        pix += row
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bits, 0, len(pix), 2835, 2835, 0, 0
    )
    return bytes(hdr + dib + pix)


def _encode_ppm(width, height, rgb_rows):
    pix = bytes(
        c for y in range(height) for x in range(width) for c in rgb_rows[y][x]
    )
    return b"P6\n# synthetic\n%d %d\n255\n" % (width, height) + pix


def _encode_pgm(width, height, gray_rows):
    pix = bytes(gray_rows[y][x] for y in range(height) for x in range(width))
    return b"P5 %d %d 255\n" % (width, height) + pix


def test_decode_image_bmp_ppm_pgm_with_duckdb_twin(spark):
    """Pure-Python decode of the codec-less containers (VERDICT r05 #8):
    dimensions and channel means extracted inside the mapInPandas
    harness; the means are integer sums divided once, pinned against a
    DuckDB aggregation over the same synthetic pixel values; garbage
    blobs survive with an error instead of failing the batch."""
    import duckdb

    w, h = 5, 3
    rgb = [
        [((x * 7 + y * 13) % 256, (x * 3) % 256, (y * 11) % 256) for x in range(w)]
        for y in range(h)
    ]
    gray = [[(x * y * 17) % 256 for x in range(w)] for y in range(h)]
    blobs = [
        (1, _encode_bmp(w, h, rgb)),
        (2, _encode_ppm(w, h, rgb)),
        (3, _encode_pgm(w, h, gray)),
        (4, b"\x89PNG\r\n\x1a\nnot really decodable here"),
        (5, b"BM" + b"\x00" * 10),  # truncated header
    ]
    df = spark.createDataFrame(blobs, "doc_id long, blob binary")
    rows = {r.doc_id: r for r in decode_image(df).collect()}

    # DuckDB twin: the exact same pixel values as a relation, avg per channel
    con = duckdb.connect()
    con.execute("CREATE TABLE px (img int, ch int, v int)")
    for y in range(h):
        for x in range(w):
            for c, v in enumerate(rgb[y][x]):
                con.execute("INSERT INTO px VALUES (1, ?, ?)", [c, v])
                con.execute("INSERT INTO px VALUES (2, ?, ?)", [c, v])
            con.execute("INSERT INTO px VALUES (3, 0, ?)", [gray[y][x]])
    want = {
        (img, ch): mean
        for img, ch, mean in con.execute(
            "SELECT img, ch, sum(v) / count(*) FROM px GROUP BY img, ch"
        ).fetchall()
    }

    for doc_id, fmt, nch in [(1, "bmp", 3), (2, "ppm", 3), (3, "pgm", 1)]:
        r = rows[doc_id]
        assert (r.format, r.width, r.height, r.channels, r.error) == (
            fmt, w, h, nch, None,
        )
        assert list(r.channel_means) == [want[(doc_id, c)] for c in range(nch)]
    assert rows[1].channel_means == rows[2].channel_means  # same pixels, 2 containers
    assert rows[4].error == "unrecognized container" and rows[4].width is None
    assert rows[5].error is not None


def test_decode_image_bmp_32bit_and_topdown(spark):
    """32-bit BMPs carry an alpha channel (mean 255 for the synthetic
    writer); negative height = top-down row order, which must not
    change channel means."""
    w, h = 4, 2
    rgb = [[(x * 50, y * 100, 30) for x in range(w)] for y in range(h)]
    blob32 = _encode_bmp(w, h, rgb, bits=32)
    # flip to top-down: negate height in the DIB header
    import struct

    td = bytearray(_encode_bmp(w, h, rgb))
    struct.pack_into("<i", td, 22, -h)
    # top-down rows run first-to-last; re-order pixel data to match
    off = 54
    stride = ((24 * w + 31) // 32) * 4
    body = td[off:]
    td[off:] = b"".join(
        bytes(body[i * stride : (i + 1) * stride]) for i in range(h - 1, -1, -1)
    )
    df = spark.createDataFrame(
        [(1, blob32), (2, bytes(td)), (3, _encode_bmp(w, h, rgb))],
        "doc_id long, blob binary",
    )
    rows = {r.doc_id: r for r in decode_image(df).collect()}
    assert rows[1].channels == 4 and rows[1].channel_means[3] == 255.0
    assert rows[1].channel_means[:3] == rows[3].channel_means
    assert rows[2].channel_means == rows[3].channel_means  # row order irrelevant


def _encode_wav(rate, channel_samples, bits=16, extra_chunk=False):
    """Minimal RIFF/WAVE PCM writer; channel_samples[ch][i] is a signed
    16-bit (or unsigned-centered 8-bit offset) sample value."""
    import struct

    nch = len(channel_samples)
    n = len(channel_samples[0])
    data = bytearray()
    for i in range(n):
        for ch in range(nch):
            v = channel_samples[ch][i]
            data += (
                struct.pack("<h", v) if bits == 16
                else struct.pack("<B", v + 128)
            )
    fmt = struct.pack(
        "<HHIIHH", 1, nch, rate, rate * nch * bits // 8, nch * bits // 8, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # LIST/INFO-style chunk decoders must skip; odd size
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + bytes(data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_audio_wav_with_duckdb_twin(spark):
    """WAV PCM decode in the mapInPandas harness: rate/channels/bits/
    duration plus exact per-channel mean-|amplitude|, pinned against a
    DuckDB aggregation over the same samples; chunk walking skips
    unknown (odd-length) chunks; 8-bit is unsigned-centered; garbage
    and non-PCM blobs survive with an error."""
    import duckdb
    import struct

    left = [100, -200, 300, -400, 0, 32767, -32768, 5]
    right = [-1, 2, -3, 4, -5, 6, -7, 8]
    mono8 = [-128, 0, 127, 64]  # stored as unsigned bytes 0,128,255,192
    blobs = [
        (1, _encode_wav(8000, [left, right], extra_chunk=True)),
        (2, _encode_wav(16000, [mono8], bits=8)),
        (3, b"RIFF\x10\x00\x00\x00AVI LIST"),  # RIFF but not WAVE
        (4, b"ID3\x03\x00 not pcm"),
        # float32 WAV: valid container, unsupported codec
        (5, b"RIFF" + struct.pack("<I", 30) + b"WAVE" + b"fmt "
            + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
            + b"data" + struct.pack("<I", 0)),
    ]
    df = spark.createDataFrame(blobs, "doc_id long, blob binary")
    rows = {r.doc_id: r for r in decode_audio(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE s (doc int, ch int, v int)")
    for i, (l, r) in enumerate(zip(left, right)):
        con.execute("INSERT INTO s VALUES (1, 0, ?), (1, 1, ?)", [l, r])
    for v in mono8:
        con.execute("INSERT INTO s VALUES (2, 0, ?)", [v])
    want = {
        (doc, ch): m
        for doc, ch, m in con.execute(
            "SELECT doc, ch, sum(abs(v)) / count(*) FROM s GROUP BY doc, ch"
        ).fetchall()
    }

    r1 = rows[1]
    assert (r1.format, r1.sample_rate, r1.channels, r1.bits, r1.n_frames) == (
        "wav", 8000, 2, 16, 8,
    )
    assert r1.duration_s == 8 / 8000 and r1.error is None
    assert list(r1.channel_mean_abs) == [want[(1, 0)], want[(1, 1)]]
    r2 = rows[2]
    assert (r2.sample_rate, r2.channels, r2.bits, r2.n_frames) == (16000, 1, 8, 4)
    assert list(r2.channel_mean_abs) == [want[(2, 0)]]
    assert rows[3].error == "unrecognized container"
    assert rows[4].error == "unrecognized container"
    assert "unsupported WAV variant" in rows[5].error


def _encode_y4m(width, height, y_planes, chroma="C420", chroma_byte=128):
    """Minimal YUV4MPEG2 writer: y_planes[f] is a flat list of W*H luma
    bytes; chroma planes are constant filler sized per the colorspace —
    ceil(w/sx)*ceil(h/sy) per plane, the real storage convention for
    odd-dimension subsampled streams (NOT int(npx*fraction))."""
    sub = {"C420": (2, 2), "C422": (2, 1), "C444": (1, 1), "Cmono": None}[chroma]
    chroma_n = 0 if sub is None else -(-width // sub[0]) * (-(-height // sub[1]))
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F30:1 Ip A1:1 %s\n" % (width, height, chroma.encode())
    )
    for y in y_planes:
        out += b"FRAME\n" + bytes(y) + bytes([chroma_byte]) * (2 * chroma_n)
    return bytes(out)


def test_sample_frames_y4m(spark):
    """Y4M frame sampling: every-Nth-frame luma means are exact (DuckDB
    twin on the sampled planes), ALL frames are counted, colorspace
    sets the frame stride (C444 vs C420 decode identically for the same
    luma), and truncated/garbage streams yield one error row."""
    import duckdb

    w, h = 6, 4
    planes = [
        [(f * 31 + i * 7) % 256 for i in range(w * h)] for f in range(5)
    ]
    y4m = _encode_y4m(w, h, planes)
    y444 = _encode_y4m(w, h, planes, chroma="C444")
    df = spark.createDataFrame(
        [
            (1, y4m),
            (2, y444),
            (3, y4m[: len(y4m) - 3]),  # truncated mid-frame
            (4, b"\x00\x01not video"),
        ],
        "doc_id long, blob binary",
    )
    out = sample_frames(df, every=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)

    con = duckdb.connect()
    con.execute("CREATE TABLE y (f int, v int)")
    for f in (0, 2, 4):
        for v in planes[f]:
            con.execute("INSERT INTO y VALUES (?, ?)", [f, v])
    want = dict(con.execute(
        "SELECT f, sum(v) / count(*) FROM y GROUP BY f"
    ).fetchall())

    for doc in (1, 2):
        rows = sorted(by_doc[doc], key=lambda r: r.frame_index)
        assert [r.frame_index for r in rows] == [0, 2, 4]
        assert all(
            (r.width, r.height, r.n_frames, r.error) == (w, h, 5, None)
            for r in rows
        )
        assert [r.y_mean for r in rows] == [want[f] for f in (0, 2, 4)]
    (r3,) = by_doc[3]
    assert r3.frame_index is None and "truncated frame" in r3.error
    (r4,) = by_doc[4]
    assert r4.error == "unrecognized container"


def test_sample_frames_every_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, b"x")], "doc_id long, blob binary")
    with pytest.raises(ValueError, match="every"):
        sample_frames(df, every=0)


def test_sample_frames_odd_dimensions_subsampled(spark):
    """Odd-dimension subsampled Y4M: chroma planes are ceil(w/2)*ceil(h/2)
    (C420) / ceil(w/2)*h (C422), NOT int(npx*fraction) — a 5x3 C420
    stream has 6-byte chroma planes where the truncating formula says 3,
    which would shift every later frame pointer and read chroma bytes as
    luma. Multi-frame streams with exact luma means prove the stride."""
    w, h = 5, 3
    planes = [[(f * 17 + i * 11) % 256 for i in range(w * h)] for f in range(3)]
    for chroma in ("C420", "C422"):
        df = spark.createDataFrame(
            [(1, _encode_y4m(w, h, planes, chroma=chroma))],
            "doc_id long, blob binary",
        )
        rows = sorted(sample_frames(df, every=1).collect(),
                      key=lambda r: r.frame_index)
        assert [r.frame_index for r in rows] == [0, 1, 2], chroma
        assert all((r.width, r.height, r.n_frames, r.error) == (w, h, 3, None)
                   for r in rows), chroma
        assert [r.y_mean for r in rows] == [
            sum(p) / (w * h) for p in planes
        ], chroma


def test_null_blobs_survive_all_operators(spark):
    """A NULL blob cell must not fail the task in any of the five
    mapInPandas bodies — the 'garbage rows survive' contract extends to
    NULLs (ADVICE r06): featurizer emits NULL features; decoders emit a
    'null blob' error row."""
    from aws_glue_data_catalog_replication_utility_spark.functions.multimodal import (
        blob_features,
        decode_audio,
        resize_image,
    )

    df = spark.createDataFrame(
        [(1, _encode_ppm(2, 1, [[(10, 20, 30), (40, 50, 60)]])), (2, None)],
        "doc_id long, blob binary",
    )
    feats = {r.doc_id: r for r in blob_features(df).collect()}
    assert feats[1].byte_length is not None
    assert (feats[2].byte_length, feats[2].content_md5, feats[2].magic_hex) == (
        None, None, None,
    )
    for op in (
        decode_image,
        decode_audio,
        lambda d: sample_frames(d, every=1),
        lambda d: resize_image(d, 1, 1),
    ):
        rows = {r.doc_id: r for r in op(df).collect()}
        assert rows[2].error == "null blob", op
        assert len(rows) == 2, op


def test_resize_image_nearest_neighbor_with_duckdb_twin(spark):
    """Nearest-neighbor resize (src = (x*w//out_w, y*h//out_h)) in the
    mapInPandas harness: downscaled pixels pinned against a DuckDB
    query computing the same integer index map over the source pixel
    relation; BMP and PPM inputs with identical pixels resize to
    identical PNM blobs (container normalization, 32-bit alpha
    dropped); garbage rows survive with a NULL blob."""
    import duckdb

    from aws_glue_data_catalog_replication_utility_spark.functions.multimodal import (
        resize_image,
    )

    w, h, ow, oh = 6, 4, 3, 2
    rgb = [
        [((x * 41 + y * 3) % 256, (y * 67) % 256, (x * 11) % 256) for x in range(w)]
        for y in range(h)
    ]
    df = spark.createDataFrame(
        [
            (1, _encode_ppm(w, h, rgb)),
            (2, _encode_bmp(w, h, rgb)),
            (3, _encode_bmp(w, h, rgb, bits=32)),
            (4, b"not an image at all"),
        ],
        "doc_id long, blob binary",
    )
    rows = {r.doc_id: r for r in resize_image(df, ow, oh).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE px (y int, x int, ch int, v int)")
    for y in range(h):
        for x in range(w):
            for c, v in enumerate(rgb[y][x]):
                con.execute("INSERT INTO px VALUES (?, ?, ?, ?)", [y, x, c, v])
    want = bytes(
        v for (v,) in con.execute(
            """
            SELECT p.v
            FROM range(?) oy(y), range(?) ox(x), range(3) oc(ch)
            JOIN px p ON p.y = oy.y * ? // ? AND p.x = ox.x * ? // ?
                     AND p.ch = oc.ch
            ORDER BY oy.y, ox.x, oc.ch
            """,
            [oh, ow, h, oh, w, ow],
        ).fetchall()
    )

    header = b"P6\n%d %d\n255\n" % (ow, oh)
    for doc in (1, 2, 3):
        r = rows[doc]
        assert (r.format, r.width, r.height, r.error) == ("ppm", ow, oh, None)
        assert bytes(r.blob) == header + want
    assert rows[4].error == "unrecognized container" and rows[4].blob is None


def test_resize_image_composes_with_decode_and_upscale(spark):
    """resize -> decode composes as the thumbnail-stats pipeline: a 2x
    integer upscale repeats every pixel in a 2x2 block, so channel
    means are EXACTLY the original's; identity resize of a PGM is
    pixel-lossless; out-of-range sizes raise."""
    import pytest

    from aws_glue_data_catalog_replication_utility_spark.functions.multimodal import (
        resize_image,
    )

    w, h = 4, 3
    rgb = [[(x * 30, y * 50, 7) for x in range(w)] for y in range(h)]
    gray = [[(x * y * 23) % 256 for x in range(w)] for y in range(h)]
    df = spark.createDataFrame(
        [(1, _encode_ppm(w, h, rgb)), (2, _encode_pgm(w, h, gray))],
        "doc_id long, blob binary",
    )
    resized = resize_image(df, 2 * w, 2 * h)
    stats = {r.doc_id: r for r in decode_image(resized).collect()}
    base = {r.doc_id: r for r in decode_image(df).collect()}
    for doc in (1, 2):
        assert stats[doc].channel_means == base[doc].channel_means
        assert (stats[doc].width, stats[doc].height) == (2 * w, 2 * h)
    assert stats[2].format == "pgm" and stats[2].channels == 1

    ident = {r.doc_id: r for r in resize_image(df, w, h).collect()}
    assert bytes(ident[2].blob) == b"P5\n%d %d\n255\n" % (w, h) + bytes(
        gray[y][x] for y in range(h) for x in range(w)
    )
    with pytest.raises(ValueError, match="out_w"):
        resize_image(df, 0, 5)
