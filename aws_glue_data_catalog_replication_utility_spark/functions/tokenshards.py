"""Binary token shards: the Megatron-LM indexed-dataset handoff.

The last step of a training-data pipeline is not parquet — trainers
memory-map flat binary token shards. This module writes the publicly
documented Megatron-LM "MMIDIDX" indexed-dataset layout (one `.bin` of
concatenated token ids + one `.idx` of per-sequence sizes, byte
pointers, and document boundaries; see Megatron-LM
`megatron/core/datasets/indexed_dataset.py`) straight from a DataFrame
with an `array<int>` token column:

  * ONE shuffle: rows hash (or are explicitly assigned) to a shard,
    `repartition(n, shard)` puts each shard wholly inside one task,
    and each task streams its Arrow batches into the shard's
    `.bin`/`.idx` pair — token ids NEVER transit the driver, and task
    memory stays O(batch + one int32 per sequence).
  * Deterministic: rows sort by `order_col` within the shard, shard
    assignment is a seeded xxhash64, and the byte output is a pure
    function of the input (pinned by a write-twice bit-identity test
    and a pure-Python reference writer compared byte for byte).
  * `dtype="auto"` picks uint16 when the ids fit (half the bytes of
    int32 — at 100 TB of tokens this is the difference between 200 TB
    and 400 TB of shard I/O), int32 otherwise; an id outside the
    declared dtype fails the task rather than truncating.

Reference parity note: the reference engine ships replicated data to
consumers via its export side-channels (S3Util.java:223-233 ndjson);
this is the engine's trainer-facing equivalent, generalized to the
binary format trainers actually consume.

The reader (`read_token_shard`) memory-maps a shard back as numpy
arrays — the verification twin for every test, independent of Spark.
"""
from __future__ import annotations

import json
import os
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = b"MMIDIDX\x00\x00"
_VERSION = 1
# Megatron-LM indexed_dataset dtype codes (public layout)
_DTYPE_CODES = {
    "uint8": 1, "int8": 2, "int16": 3, "int32": 4,
    "int64": 5, "float64": 6, "float32": 7, "uint16": 8,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}


def _idx_bytes(dtype: str, sizes, doc_idx) -> bytes:
    """The .idx file body for per-sequence `sizes` (token counts) and
    `doc_idx` (document boundary sequence indices, starting at 0) —
    the pure-Python reference used both by the executor writer and the
    tests' byte-for-byte twin."""
    import numpy as np

    sizes = np.asarray(sizes, dtype=np.int32)
    itemsize = np.dtype(dtype).itemsize
    pointers = np.zeros(len(sizes), dtype=np.int64)
    if len(sizes) > 1:
        np.cumsum(sizes[:-1] * itemsize, out=pointers[1:])
    head = (
        _MAGIC
        + struct.pack("<Q", _VERSION)
        + struct.pack("<B", _DTYPE_CODES[dtype])
        + struct.pack("<Q", len(sizes))
        + struct.pack("<Q", len(doc_idx))
    )
    return (
        head
        + sizes.tobytes()
        + pointers.tobytes()
        + np.asarray(doc_idx, dtype=np.int64).tobytes()
    )


def write_token_shards(
    df: DataFrame,
    out_dir: str,
    tokens_col: str = "tokens",
    order_col: str = "doc_id",
    n_shards: int = 16,
    shard_col: str | None = None,
    dtype: str = "auto",
    seed: str = "shards",
) -> dict:
    """Write `df[tokens_col]` (array<int>, one sequence per row) as
    `n_shards` Megatron indexed-dataset shards `shard-00000.bin/.idx`
    under `out_dir`, plus a `manifest.json` with per-shard doc/token
    counts. Returns the manifest dict.

    `shard_col` pins explicit shard ids (0..n_shards-1) — e.g. a
    curriculum ordering; otherwise rows shard by seeded xxhash64 of
    `order_col`. Rows order by `order_col` within each shard, so the
    output bytes are deterministic for a given input (speculative or
    retried tasks overwrite with identical bytes; the manifest is
    written last, driver-side, so a crashed job never looks complete).

    `dtype`: "auto" resolves to uint16 iff max(id) < 65536 and
    min(id) >= 0 (one cheap agg), else int32; or pass any of
    uint8/uint16/int16/int32/int64 explicitly — ids outside the dtype
    fail the job (never silent truncation)."""
    if dtype not in ("auto",) and dtype not in _DTYPE_CODES:
        raise ValueError(f"dtype {dtype!r} not in {sorted(_DTYPE_CODES)}")
    if dtype == "auto":
        lo, hi = df.select(
            F.min(F.array_min(tokens_col)), F.max(F.array_max(tokens_col))
        ).collect()[0]
        dtype = (
            "uint16"
            if lo is not None and lo >= 0 and hi is not None and hi < 65536
            else "int32"
        )
    os.makedirs(out_dir, exist_ok=True)
    if shard_col is None:
        shard = F.pmod(
            F.xxhash64(F.col(order_col), F.lit(seed)), F.lit(n_shards)
        ).cast("int")
    else:
        shard = F.col(shard_col).cast("int")
    laid = (
        df.select(
            shard.alias("__shard"),
            F.col(order_col).alias("__order"),
            F.col(tokens_col).alias("__tokens"),
        )
        # one shuffle: every shard lands wholly inside one task (hash
        # collisions just mean a task writes more than one shard)
        .repartition(n_shards, F.col("__shard"))
        .sortWithinPartitions("__shard", "__order")
    )
    out_abs = os.path.abspath(out_dir)
    want = dtype

    def write_task(batches):
        import uuid as _uuid

        import numpy as np
        import pyarrow as pa

        # per-attempt temp suffix: shards stage as .bin.<attempt>/
        # .idx.<attempt> and atomically rename into place on close —
        # a speculative duplicate attempt can no longer truncate a
        # finished shard (open(final, 'wb')) and then die, leaving a
        # torn file behind a reported success (ADVICE r11). Both
        # attempts produce identical bytes, so whichever os.replace
        # lands last is immaterial; a killed attempt leaves only temp
        # orphans, never a partial final file.
        attempt = _uuid.uuid4().hex[:12]

        np_dtype = np.dtype(want)
        info = np.iinfo(np_dtype)
        open_shard = None
        bin_fh = None
        sizes: list[int] = []
        results = []

        def close_shard():
            nonlocal bin_fh, open_shard, sizes
            if bin_fh is None:
                return
            bin_fh.close()
            # one document per sequence: doc_idx = [0..n]
            doc_idx = list(range(len(sizes) + 1))
            bin_path = os.path.join(
                out_abs, f"shard-{open_shard:05d}.bin"
            )
            idx_path = os.path.join(
                out_abs, f"shard-{open_shard:05d}.idx"
            )
            with open(idx_path + "." + attempt, "wb") as fh:
                fh.write(_idx_bytes(want, sizes, doc_idx))
            os.replace(bin_path + "." + attempt, bin_path)
            os.replace(idx_path + "." + attempt, idx_path)
            results.append(
                (open_shard, len(sizes), int(sum(sizes)))
            )
            bin_fh, open_shard, sizes = None, None, []

        for b in batches:
            sh_arr = b.column(0).to_numpy(zero_copy_only=False)
            toks = b.column(2)
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            offsets = toks.offsets.to_numpy(zero_copy_only=False)
            values = toks.values.to_numpy(zero_copy_only=False)
            if len(values) and (
                values.min() < info.min or values.max() > info.max
            ):
                raise ValueError(
                    f"token id outside {want} range "
                    f"[{info.min}, {info.max}]: "
                    f"[{values.min()}, {values.max()}]"
                )
            values = values.astype(np_dtype)
            for i in range(b.num_rows):
                sh = int(sh_arr[i])
                if sh != open_shard:
                    close_shard()
                    open_shard = sh
                    bin_fh = open(
                        os.path.join(
                            out_abs,
                            f"shard-{sh:05d}.bin." + attempt,
                        ),
                        "wb",
                    )
                lo_o, hi_o = offsets[i], offsets[i + 1]
                bin_fh.write(values[lo_o:hi_o].tobytes())
                sizes.append(int(hi_o - lo_o))
        close_shard()
        if results:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in results], pa.int32()),
                    pa.array([r[1] for r in results], pa.int64()),
                    pa.array([r[2] for r in results], pa.int64()),
                ],
                names=["shard", "docs", "tokens"],
            )

    meta_rows = laid.mapInArrow(
        write_task, "shard int, docs long, tokens long"
    ).collect()
    shards = sorted(
        (
            {"shard": int(r.shard), "docs": int(r.docs),
             "tokens": int(r.tokens)}
            for r in meta_rows
        ),
        key=lambda d: d["shard"],
    )
    manifest = {
        "format": "megatron-indexed-dataset",
        "dtype": dtype,
        "n_shards": n_shards,
        "shards": shards,
        "docs": sum(s["docs"] for s in shards),
        "tokens": sum(s["tokens"] for s in shards),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def read_token_shard(prefix: str):
    """Read one shard back as (list of numpy arrays, dtype name) —
    the Spark-independent verification twin. `prefix` is the path
    without extension (`.../shard-00000`)."""
    import numpy as np

    with open(prefix + ".idx", "rb") as fh:
        magic = fh.read(9)
        if magic != _MAGIC:
            raise ValueError(f"{prefix}.idx: bad magic {magic!r}")
        (version,) = struct.unpack("<Q", fh.read(8))
        if version != _VERSION:
            raise ValueError(f"unsupported idx version {version}")
        (code,) = struct.unpack("<B", fh.read(1))
        dtype = _CODE_DTYPES[code]
        (n_seq,) = struct.unpack("<Q", fh.read(8))
        (n_doc,) = struct.unpack("<Q", fh.read(8))
        sizes = np.frombuffer(fh.read(4 * n_seq), dtype=np.int32)
        pointers = np.frombuffer(fh.read(8 * n_seq), dtype=np.int64)
        doc_idx = np.frombuffer(fh.read(8 * n_doc), dtype=np.int64)
    data = np.memmap(prefix + ".bin", dtype=np.dtype(dtype), mode="r")
    seqs = [
        data[p // np.dtype(dtype).itemsize:
             p // np.dtype(dtype).itemsize + s].copy()
        for p, s in zip(pointers, sizes)
    ]
    return seqs, dtype, doc_idx
