"""Multimodal column plumbing: binary payload schema, Arrow batch
feature extraction, and the stubbed real-decode path."""

from __future__ import annotations

import hashlib

import pytest

from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    attach_fake_media,
    decode_image,
    extract_media_features,
    resize_media,
    sample_frames,
)
from opendata_gov_lt_mysql_import_spark.sources.parquet import load_table


class TestMultimodal:
    def test_decode_stub_raises(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")

    def test_media_schema(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        media = attach_fake_media(docs, "doc_id", "text")
        assert [f.name for f in media.schema.fields] == ["media_id", "mime", "payload"]
        assert media.schema["payload"].dataType.simpleString() == "binary"

    def test_resize_fixed_geometry(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").limit(20)
        media = attach_fake_media(docs, "doc_id", "text")
        resized = resize_media(media, 16, 8)
        for r in resized.collect():
            assert len(r["payload"]) == 16 * 8
            assert (r["width"], r["height"]) == (16, 8)

    def test_frame_sampling_fanout(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").limit(20)
        media = attach_fake_media(docs, "doc_id", "text")
        frames = sample_frames(media, every_n_bytes=64, max_frames=4)
        rows = frames.collect()
        per_media = {}
        for r in rows:
            per_media.setdefault(r["media_id"], []).append(r["frame_no"])
        assert set(per_media) == {r["media_id"] for r in media.collect()}
        for nos in per_media.values():
            assert sorted(nos) == list(range(len(nos)))
            assert 1 <= len(nos) <= 4

    def test_feature_extraction_deterministic(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").limit(50)
        media = attach_fake_media(docs, "doc_id", "text")
        feats = extract_media_features(media)
        assert feats.schema == FEATURE_SCHEMA
        rows = {r["media_id"]: r for r in feats.collect()}
        src = {r["doc_id"]: r["text"] for r in docs.collect()}
        assert set(rows) == set(src)
        for doc_id, text in src.items():
            payload = text.encode("utf-8")
            r = rows[doc_id]
            assert r["n_bytes"] == len(payload)
            assert r["fingerprint"] == hashlib.md5(payload).hexdigest()
            assert abs(r["byte_mean"] - sum(payload) / len(payload)) < 1e-9
