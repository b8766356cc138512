"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata, with Arrow-batched mapInPandas processing (driver-contract
extension; no counterpart in the reference — /root/reference is tabular
only).

Design for 100 TB of media:

- media is an opaque `binary` column with a typed metadata struct
  (media_type, width/height/channels, sample_rate, n_frames, frame_bytes).
  Binaries never pass through Python row-at-a-time — every transform is
  `mapInPandas`, i.e. Arrow record batches of bytes into pandas, vectorized
  numpy over the buffers, Arrow back out;
- transforms are per-row independent (narrow): no shuffle anywhere in
  decode / resize / frame-sample / featurize — whatever partitioning the
  scan produced is preserved. Partition sizing is the only scale knob
  (`spark.sql.files.maxPartitionBytes` against large media files);
- decode: real codecs (PIL / libav) are NOT in this container, so
  `decode_image` degrades to a clearly-marked deterministic fake decoder
  over the synthetic header format below, keeping schema, batching, and
  UDF signatures production-shaped (the swap-in point is one function).

Synthetic media format (deterministic from the `documents` fixture, so
tests and the driver's checks are reproducible): a 16-byte header
`MM01 | media_kind u8 | width u16 | height u16 | channels u8 |
sample_rate u32 | n_frames u16` followed by an arithmetic payload
`byte[i] = (doc_id*131 + i*7919 + 13) % 256`. The payload formula is
deliberately SQL-expressible (integer arithmetic only, no RNG) so every
media query — decode stats, frame sampling, resize, byte-histogram
features — has an exact DuckDB oracle over `generate_series`, upgrading
the whole multimodal surface from rows-only to value-hash-checked.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"MM01"
_HEADER = ">4sBHHBIH"  # magic, kind, width, height, channels, rate, n_frames
HEADER_BYTES = struct.calcsize(_HEADER)
KINDS = {0: "image", 1: "audio", 2: "video"}

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, content binary, "
    "meta struct<width:int, height:int, channels:int, "
    "sample_rate:int, n_frames:int, n_bytes:int>"
)


def _make_blob(doc_id: int) -> bytes:
    """Deterministic synthetic media blob for a document.

    Payload bytes follow `(doc_id*131 + i*7919 + 13) % 256` — mirrored
    verbatim by the DuckDB oracles in plans/extensions.py; change both
    together.
    """
    kind = doc_id % 3
    width, height, channels = 8 + doc_id % 8, 6 + doc_id % 6, 3
    rate = 8000 if kind else 0
    n_frames = 4 + doc_id % 5 if kind == 2 else 1
    frame = width * height * channels
    idx = np.arange(frame * n_frames, dtype=np.int64)
    payload = ((doc_id * 131 + idx * 7919 + 13) % 256).astype(np.uint8)
    header = struct.pack(_HEADER, MAGIC, kind, width, height, channels,
                         rate, n_frames)
    return header + payload.tobytes()


def attach_media(docs: DataFrame) -> DataFrame:
    """documents -> media table (doc_id, media_type, content, meta)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [_make_blob(int(d)) for d in pdf["doc_id"]]
            metas = [_parse_header(b) for b in blobs]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "media_type": [KINDS[m["kind"]] for m in metas],
                "content": blobs,
                "meta": [{k: v for k, v in m.items() if k != "kind"}
                         for m in metas],
            })

    # rebalance before the per-row blob synthesis: a single-file fixture
    # scan is one partition, and mapInPandas parallelism follows input
    # partitioning (explicit count so AQE can't coalesce it away)
    n = docs.sparkSession.sparkContext.defaultParallelism
    return docs.select("doc_id").repartition(n, F.col("doc_id")) \
        .mapInPandas(gen, MEDIA_SCHEMA)


def _parse_header(blob: bytes) -> dict:
    magic, kind, w, h, c, rate, n_frames = struct.unpack_from(_HEADER, blob)
    if magic != MAGIC:
        raise ValueError("not a MM01 blob")
    return dict(kind=int(kind), width=int(w), height=int(h), channels=int(c),
                sample_rate=int(rate), n_frames=int(n_frames),
                n_bytes=len(blob) - HEADER_BYTES)


def decode_image(media: DataFrame) -> DataFrame:
    """Decode image blobs to per-image pixel statistics.

    Production swap-in point: replace `_decode_fake` with a real codec
    (PIL.Image.open over the bytes). The container has no image libs, so
    decoding is the deterministic fake over the MM01 format — everything
    around it (schema, Arrow batching, partition preservation) is real.
    """
    out_schema = ("doc_id bigint, width int, height int, channels int, "
                  "mean_px double, std_px double")

    def _decode_fake(blob: bytes) -> tuple[np.ndarray, dict]:
        meta = _parse_header(blob)
        arr = np.frombuffer(blob, dtype=np.uint8, offset=HEADER_BYTES)
        px = arr[: meta["width"] * meta["height"] * meta["channels"]]
        return px.reshape(meta["height"] * meta["width"], meta["channels"]), meta

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401  (absent in this container)
            raise NotImplementedError(
                "real image decode not wired; remove the fake in decode_image")
        except ImportError:
            decode = _decode_fake
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                px, meta = decode(bytes(blob))
                rows.append((int(doc_id), meta["width"], meta["height"],
                             meta["channels"], float(px.mean()),
                             float(px.std())))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                              "channels", "mean_px", "std_px"])

    return (media.filter(F.col("media_type") == "image")
            .select("doc_id", "content").mapInPandas(gen, out_schema))


def resize_image(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize on the fake pixel buffer (numpy index math —
    the same vectorized shape a real resampler takes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(blob)
                m = _parse_header(blob)
                px = (np.frombuffer(blob, np.uint8, offset=HEADER_BYTES)
                      [: m["width"] * m["height"] * m["channels"]]
                      .reshape(m["height"], m["width"], m["channels"]))
                yi = (np.arange(out_h) * m["height"] // out_h)
                xi = (np.arange(out_w) * m["width"] // out_w)
                resized = px[yi][:, xi]
                header = struct.pack(_HEADER, MAGIC, 0, out_w, out_h,
                                     m["channels"], 0, 1)
                out_rows.append((int(doc_id), header + resized.tobytes()))
            yield pd.DataFrame(out_rows, columns=["doc_id", "content"])

    return (media.filter(F.col("media_type") == "image")
            .select("doc_id", "content")
            .mapInPandas(gen, "doc_id bigint, content binary"))


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: keep every n-th frame, one output row per kept
    frame (doc_id, frame_idx, frame binary)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(blob)
                m = _parse_header(blob)
                fsize = m["width"] * m["height"] * m["channels"]
                for i in range(0, m["n_frames"], every_n):
                    start = HEADER_BYTES + i * fsize
                    rows.append((int(doc_id), i, blob[start:start + fsize]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return (media.filter(F.col("media_type") == "video")
            .select("doc_id", "content")
            .mapInPandas(gen, "doc_id bigint, frame_idx int, frame binary"))


def media_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Byte-histogram feature vector per blob (array<float>) — the
    feature-extraction slot; real embeddings would replace the histogram."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["content"]:
                arr = np.frombuffer(bytes(blob), np.uint8, offset=HEADER_BYTES)
                hist = np.bincount(arr // (256 // n_bins), minlength=n_bins)
                feats.append((hist / max(len(arr), 1)).astype("float32"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                "media_type": pdf["media_type"].values,
                                "features": feats})

    return (media.select("doc_id", "media_type", "content")
            .mapInPandas(gen, "doc_id bigint, media_type string, "
                              "features array<float>"))


def byte_histogram(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """media_features in long form: one row per (doc, bin) with the exact
    integer bin count and the double fraction.

    This is the hash-stable projection of the feature vector — integer
    counts plus a double division of two exact integers are bit-identical
    across engines, unlike the float32 array (which the driver's
    canonicalizer can't hash at all). Same Arrow-batched mapInPandas
    plumbing, no shuffle.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, bins, counts, fracs = [], [], [], [], []
            for doc_id, mt, blob in zip(pdf["doc_id"], pdf["media_type"],
                                        pdf["content"]):
                arr = np.frombuffer(bytes(blob), np.uint8, offset=HEADER_BYTES)
                hist = np.bincount(arr // (256 // n_bins), minlength=n_bins)
                ids.extend([int(doc_id)] * n_bins)
                types.extend([mt] * n_bins)
                bins.extend(range(n_bins))
                counts.extend(int(c) for c in hist)
                fracs.extend(float(c) / float(len(arr)) for c in hist)
            yield pd.DataFrame({"doc_id": ids, "media_type": types,
                                "bin": bins, "n_in_bin": counts,
                                "frac": fracs})

    return (media.select("doc_id", "media_type", "content")
            .mapInPandas(gen, "doc_id bigint, media_type string, bin int, "
                              "n_in_bin bigint, frac double"))


def ahash64(media: DataFrame) -> DataFrame:
    """64-bit average-hash fingerprint per media blob, packed as four
    16-bit band keys (doc_id, h0..h3).

    The payload splits into 64 equal-share segments (seg(i) = i*64 // L,
    the standard balanced partition); bit j is set when segment j's mean
    exceeds the global mean — evaluated as the exact integer rational
    seg_sum*L > total*seg_len, so the fingerprint is bit-reproducible
    (and DuckDB-oracle-checkable) with no float thresholds. For real
    images the same function body runs over decoded pixels (swap
    `_decode_fake`'s buffer in); banding into 4x16 bits is the SimHash
    pigeonhole: hamming <= 3 implies at least one identical band, so a
    band equi-join is a recall-lossless candidate generator.
    """
    out_schema = "doc_id bigint, h0 int, h1 int, h2 int, h3 int"
    shifts = np.arange(16, dtype=np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8,
                                    offset=HEADER_BYTES).astype(np.int64)
                n = arr.size
                seg = (np.arange(n, dtype=np.int64) * 64) // n
                sums = np.bincount(seg, weights=arr,
                                   minlength=64).astype(np.int64)
                lens = np.bincount(seg, minlength=64).astype(np.int64)
                bits = (sums * n > int(arr.sum()) * lens).astype(np.int64)
                hs = [int((bits[k * 16:(k + 1) * 16] << shifts).sum())
                      for k in range(4)]
                rows.append((int(doc_id), *hs))
            yield pd.DataFrame(
                rows, columns=["doc_id", "h0", "h1", "h2", "h3"])

    return media.select("doc_id", "content").mapInPandas(gen, out_schema)
