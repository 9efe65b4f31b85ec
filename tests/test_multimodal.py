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
    def test_decode_stub_raises_for_compressed_formats(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")

    def test_ppm_decode_roundtrip(self):
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
        )

        img = (np.arange(6 * 4 * 3, dtype=np.uint8)).reshape(4, 6, 3)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        # decode_image dispatches P6 to the real decoder
        assert np.array_equal(decode_image(encode_ppm(img)), img)
        # header comments are tolerated
        with_comment = b"P6\n# a comment\n6 4\n255\n" + img.tobytes()
        assert np.array_equal(decode_ppm(with_comment), img)

    def test_ppm_real_resize_and_features(self, spark):
        """End-to-end real-pixel path: PPM payloads through the Spark
        resize + feature stages; nearest-neighbor values and pixel means
        verified against numpy computed locally."""
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            PPM_MIME,
            decode_ppm,
            encode_ppm,
            extract_media_features,
        )

        imgs = {
            1: np.zeros((8, 8, 3), dtype=np.uint8),
            2: np.full((4, 4, 3), 200, dtype=np.uint8),
            3: np.arange(16 * 8 * 3, dtype=np.uint64).reshape(8, 16, 3).astype(np.uint8),
        }
        media = spark.createDataFrame(
            [(i, PPM_MIME, bytearray(encode_ppm(a))) for i, a in imgs.items()],
            "media_id long, mime string, payload binary",
        )
        resized = {r["media_id"]: r for r in resize_media(media, 4, 4).collect()}
        for i, a in imgs.items():
            out = decode_ppm(bytes(resized[i]["payload"]))
            assert out.shape == (4, 4, 3)
            rows = (np.arange(4) * a.shape[0] // 4).clip(0, a.shape[0] - 1)
            cols = (np.arange(4) * a.shape[1] // 4).clip(0, a.shape[1] - 1)
            assert np.array_equal(out, a[rows][:, cols])

        feats = {
            r["media_id"]: r
            for r in extract_media_features(media, use_real_decode=True).collect()
        }
        for i, a in imgs.items():
            assert abs(feats[i]["byte_mean"] - float(a.mean())) < 1e-9

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
