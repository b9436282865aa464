"""Multimodal plumbing: real Spark-side pipeline, stubbed codec boundary."""

from __future__ import annotations

import math

import numpy as np
import pytest

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.multimodal import (
    attach_text_payload,
    byte_stats,
    decode_image,
    fake_decode,
    resize_images,
    sample_frames,
)


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "image/jpeg")


def test_fake_decode_deterministic_shape():
    img = fake_decode(b"abc", (8, 8))
    assert img.shape == (8, 8, 3)
    assert img.dtype == np.uint8
    assert (img == fake_decode(b"abc", (8, 8))).all()


def test_byte_stats_matches_numpy(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(20)
    assets = attach_text_payload(docs)
    got = {r.asset_id: r for r in byte_stats(assets).collect()}
    for row in docs.select("doc_id", "text").collect():
        buf = np.frombuffer(row.text.encode("utf-8"), dtype=np.uint8)
        r = got[row.doc_id]
        assert r.n_bytes == buf.size
        assert r.sum_bytes == int(buf.sum(dtype=np.int64))
        assert r.n_distinct_bytes == len(np.unique(buf))
        assert math.isclose(r.mean_byte, float(buf.mean()), rel_tol=1e-12)
        hist = np.bincount(buf, minlength=256).astype(np.float64)
        p = hist[hist > 0] / buf.size
        assert math.isclose(r.byte_entropy, float(-(p * np.log2(p)).sum()), rel_tol=1e-12)


def test_resize_images_shape(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(5)
    out = resize_images(attach_text_payload(docs), height=4, width=4).collect()
    assert len(out) == 5
    for r in out:
        assert r.height == 4 and r.width == 4
        assert len(r.pixels) == 4 * 4 * 3


def test_sample_frames_counts(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(5)
    frames = sample_frames(
        attach_text_payload(docs), every_n_bytes=100, frame_bytes=32
    ).collect()
    by_asset: dict[int, list] = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    lengths = {
        r.doc_id: len(r.text.encode("utf-8"))
        for r in docs.select("doc_id", "text").collect()
    }
    for asset_id, rows in by_asset.items():
        expected = -(-lengths[asset_id] // 100)  # ceil
        assert len(rows) == expected
        assert all(len(r.frame) <= 32 for r in rows)
