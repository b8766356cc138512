"""Multimodal binary-column plumbing tests: schema, Arrow batch shape,
decode/resize/frame-sample/featurize over mapInPandas (driver-contract
extension; decode is a deterministic fake — real codecs absent)."""

from __future__ import annotations

import numpy as np
import pytest

from traffic_data_pipeline_spark.multimodal.media import (
    HEADER_BYTES,
    attach_media,
    decode_image,
    media_features,
    resize_image,
    sample_frames,
    _make_blob,
    _parse_header,
)
from traffic_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    m = attach_media(docs).cache()
    yield m
    m.unpersist()


def test_media_table_shape(media, spark, sf_dir):
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert media.count() == n_docs
    types = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}
    row = media.filter("doc_id = 3").first()
    meta = _parse_header(_make_blob(3))
    assert row.meta.width == meta["width"]
    assert row.meta.n_bytes == len(row.content) - HEADER_BYTES


def test_decode_image_stats(media):
    out = decode_image(media)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows  # images exist (doc_id % 3 == 0)
    some = next(iter(rows))
    blob = _make_blob(some)
    m = _parse_header(blob)
    px = np.frombuffer(blob, np.uint8, offset=HEADER_BYTES)[
        : m["width"] * m["height"] * m["channels"]]
    assert rows[some].width == m["width"]
    assert rows[some].mean_px == pytest.approx(float(px.mean()))
    assert rows[some].std_px == pytest.approx(float(px.std()))


def test_resize_image(media):
    out = resize_image(media, 4, 3)
    row = out.first()
    m = _parse_header(bytes(row.content))
    assert (m["width"], m["height"]) == (4, 3)
    assert len(row.content) == HEADER_BYTES + 4 * 3 * m["channels"]


def test_sample_frames(media):
    out = sample_frames(media, every_n=2)
    rows = out.collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc_id, idxs in by_doc.items():
        m = _parse_header(_make_blob(doc_id))
        assert sorted(idxs) == list(range(0, m["n_frames"], 2))
        fsize = m["width"] * m["height"] * m["channels"]
        assert all(len(bytes(r.frame)) == fsize for r in rows
                   if r.doc_id == doc_id)


def test_media_features(media):
    out = media_features(media, n_bins=16)
    row = out.first()
    v = np.array(row.features)
    assert v.shape == (16,)
    assert v.sum() == pytest.approx(1.0, abs=1e-3)
    assert (v >= 0).all()


def test_ahash64_identical_blobs_pair_at_zero(spark):
    from traffic_data_pipeline_spark.multimodal.media import ahash64

    # doc_id and doc_id + 3840 share dims (3840 = lcm(8,6,3,5) blocks)
    # and payload (3840 % 256 == 0 keeps doc_id*131 % 256 fixed), so the
    # blobs are byte-identical and must fingerprint identically
    docs = spark.createDataFrame([(1,), (3841,), (7,)], "doc_id long")
    h = {r.doc_id: (r.h0, r.h1, r.h2, r.h3)
         for r in ahash64(attach_media(docs)).collect()}
    assert h[1] == h[3841]
    assert all(0 <= v < 1 << 16 for v in h[1])


def test_ahash64_bits_match_integer_rational(spark):
    from traffic_data_pipeline_spark.multimodal.media import ahash64

    docs = spark.createDataFrame([(11,)], "doc_id long")
    (row,) = ahash64(attach_media(docs)).collect()
    blob = _make_blob(11)
    arr = np.frombuffer(blob, dtype=np.uint8, offset=HEADER_BYTES).astype(int)
    n = arr.size
    seg = (np.arange(n) * 64) // n
    expect_bits = []
    for j in range(64):
        s, ln = int(arr[seg == j].sum()), int((seg == j).sum())
        expect_bits.append(1 if s * n > int(arr.sum()) * ln else 0)
    got_bits = []
    for h in (row.h0, row.h1, row.h2, row.h3):
        got_bits.extend((h >> m) & 1 for m in range(16))
    assert got_bits == expect_bits
