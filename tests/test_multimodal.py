"""Multimodal column model tests: binary blob + metadata plumbing and
the Arrow-batched mapInPandas featurizer (functions/multimodal.py) —
the generalization of the reference's S3 side-channel for oversized
payloads (S3Util.java:44-71, LargeTable.java:14-21)."""

from __future__ import annotations

import hashlib

import pytest

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


def test_decode_image_is_explicit_stub(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(NotImplementedError):
        decode_image(attach_blob(df))
