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
    decode_image,
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
