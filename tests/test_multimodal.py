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

    def test_wav_roundtrip_and_features(self):
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            audio_features,
            decode_wav,
            encode_wav,
        )

        # mono sine-ish ramp, stereo interleave, chunk tolerance
        mono = (np.arange(-500, 500, dtype=np.int16)) * 30
        arr, rate = decode_wav(encode_wav(mono, 8000))
        assert rate == 8000 and arr.shape == (1000, 1)
        assert np.array_equal(arr[:, 0], mono)

        stereo = np.stack([mono, -mono], axis=1)
        arr2, _ = decode_wav(encode_wav(stereo, 44100))
        assert arr2.shape == (1000, 2)
        assert np.array_equal(arr2, stereo)

        # square wave ±A: rms == peak == A/32768 exactly
        a = 12000
        sq = np.full(4000, a, dtype=np.int16)
        sq[1::2] = -a
        dur, rms, peak, sr, ch = audio_features(encode_wav(sq, 16000))
        assert (dur, sr, ch) == (0.25, 16000, 1)
        assert rms == a / 32768.0 and peak == a / 32768.0

    def test_wav_rejects_non_pcm(self):
        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            decode_wav,
        )

        with pytest.raises(ValueError):
            decode_wav(b"OggS" + b"\0" * 40)
        # IEEE-float format tag (3) is a real WAV but not PCM16
        import struct

        hdr = (
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
            + b"data" + struct.pack("<I", 0)
        )
        with pytest.raises(NotImplementedError):
            decode_wav(hdr)

    def test_audio_features_spark_stage(self, spark, sf_dir):
        """attach_fake_audio → extract_audio_features over real Spark
        batches: closed-form duration/rms/peak per media_id."""
        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            attach_fake_audio,
            extract_audio_features,
        )

        docs = load_table(spark, sf_dir, "documents").limit(40)
        out = extract_audio_features(attach_fake_audio(docs, "doc_id")).collect()
        assert len(out) == 40
        for r in out:
            amp = 1 + (r["media_id"] % 100) * 300
            n = 4000 + (r["media_id"] % 7) * 2000
            assert r["duration_sec"] == n / 16000
            assert round(r["rms"] * 32768) == amp
            assert round(r["peak"] * 32768) == amp
            assert (r["sample_rate"], r["n_channels"]) == (16000, 1)

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

    def test_bmp_decode_roundtrip_and_padding(self):
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            decode_bmp,
            encode_bmp,
        )

        # width 6 → row stride 18 → padded to 20: exercises the 4-byte
        # row alignment both ways
        img = (np.arange(4 * 6 * 3, dtype=np.uint8)).reshape(4, 6, 3)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
        # width 4 → stride 12, no padding
        img2 = np.full((3, 4, 3), 77, dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img2)), img2)
        # decode_image dispatches on the BM magic
        assert np.array_equal(decode_image(encode_bmp(img)), img)

    def test_bmp_rejects_compressed_and_paletted(self):
        import struct

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            decode_bmp,
            encode_bmp,
        )
        import numpy as np

        good = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
        rle = bytearray(good)
        struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
        with pytest.raises(NotImplementedError):
            decode_bmp(bytes(rle))
        pal = bytearray(good)
        struct.pack_into("<H", pal, 28, 8)  # 8-bit paletted
        with pytest.raises(NotImplementedError):
            decode_bmp(bytes(pal))
        with pytest.raises(ValueError):
            decode_bmp(b"XX not a bmp")

    def test_bmp_real_resize_and_features(self, spark):
        """BMP payloads through the Spark resize + real-decode feature
        stages — the second fully-live image codec next to PPM."""
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            BMP_MIME,
            decode_bmp,
            encode_bmp,
            extract_media_features,
        )

        imgs = {
            1: np.full((4, 4, 3), 200, dtype=np.uint8),
            2: np.arange(8 * 6 * 3, dtype=np.uint64).reshape(8, 6, 3).astype(np.uint8),
        }
        media = spark.createDataFrame(
            [(i, BMP_MIME, bytearray(encode_bmp(a))) for i, a in imgs.items()],
            "media_id long, mime string, payload binary",
        )
        resized = {r["media_id"]: r for r in resize_media(media, 3, 5).collect()}
        for i, a in imgs.items():
            out = decode_bmp(bytes(resized[i]["payload"]))
            assert out.shape == (5, 3, 3)
            rows = (np.arange(5) * a.shape[0] // 5).clip(0, a.shape[0] - 1)
            cols = (np.arange(3) * a.shape[1] // 3).clip(0, a.shape[1] - 1)
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


class TestPgmCodec:
    def test_roundtrip_and_comment_header(self):
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            decode_image,
            decode_pgm,
            encode_pgm,
        )

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
        payload = encode_pgm(img)
        assert np.array_equal(decode_pgm(payload), img)
        # dispatch on magic bytes through the generic entry
        assert np.array_equal(decode_image(payload), img)
        with_comment = payload[:2] + b"\n# gray\n" + payload[3:]
        assert np.array_equal(decode_pgm(with_comment), img)

    def test_resize_nearest_neighbor(self):
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            decode_pgm,
            encode_pgm,
            resize_pgm,
        )

        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        small = decode_pgm(resize_pgm(encode_pgm(img), 2, 2))
        assert small.shape == (2, 2)
        # nearest-neighbor picks the top-left of each 2x2 block
        assert np.array_equal(small, img[::2, ::2])

    def test_spark_resize_stage_handles_pgm(self, spark):
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            PGM_MIME,
            decode_pgm,
            encode_pgm,
            resize_media,
        )

        rng = np.random.default_rng(11)
        imgs = {i: rng.integers(0, 256, size=(6, 8), dtype=np.uint8) for i in range(3)}
        media = spark.createDataFrame(
            [(i, PGM_MIME, bytearray(encode_pgm(a))) for i, a in imgs.items()],
            "media_id long, mime string, payload binary",
        )
        resized = {r["media_id"]: r for r in resize_media(media, 4, 3).collect()}
        for i, a in imgs.items():
            out = decode_pgm(bytes(resized[i]["payload"]))
            assert out.shape == (3, 4)
            rows = (np.arange(3) * 6 // 3).clip(0, 5)
            cols = (np.arange(4) * 8 // 4).clip(0, 7)
            assert np.array_equal(out, a[rows][:, cols])


class TestImageDHash:
    def test_upscale_shares_hash_md5_does_not(self, spark):
        import hashlib

        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            dhash_bits,
            encode_bmp,
            resize_bmp,
        )

        x = np.arange(32)
        base = ((x[None, :] * 3 + x[:, None] * 7) % 251).astype(np.uint8)
        small = encode_bmp(np.stack([base] * 3, axis=2))
        big = resize_bmp(small, 64, 64)
        assert hashlib.md5(small).hexdigest() != hashlib.md5(big).hexdigest()
        assert dhash_bits(small) == dhash_bits(big)

    def test_distinct_patterns_separate(self, spark):
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            dhash_bits,
            dhash_hamming,
            encode_bmp,
        )

        x = np.arange(32)
        hashes = []
        for p in range(8):
            base = (
                (x[None, :] * (3 + p) + x[:, None] * (7 + 2 * (p % 5))) % 251
            ).astype(np.uint8)
            hashes.append(dhash_bits(encode_bmp(np.stack([base] * 3, axis=2))))
        assert len(set(hashes)) == len(hashes)
        for i in range(len(hashes)):
            for j in range(i + 1, len(hashes)):
                assert dhash_hamming(hashes[i], hashes[j]) >= 1

    def test_dedup_query_groups_upscales_with_patterns(self, spark):
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            image_dhash_dedup_q,
        )

        out = image_dhash_dedup_q(spark, "/root/testdata/sf0.001").collect()
        # 500 ids over 50 patterns -> every pattern group holds its 10
        # ids INCLUDING the byte-distinct 64x64 upscales (id % 3 == 0)
        assert sum(r["n_images"] for r in out) == 500
        assert all(r["n_images"] == 10 for r in out) and len(out) == 50
        keepers = sorted(r["keeper"] for r in out)
        assert keepers == list(range(50))


class TestAudioEnvelopeDedup:
    def test_gain_and_resample_invariance_md5_distinct(self):
        import hashlib

        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            audio_envelope_hash,
            encode_wav,
        )

        j = np.arange(65)
        amps = 800.0 + ((j * (13 + 3) + 3 * 7) % 97) * 300.0
        s = np.repeat(amps, 123)
        s = s * np.where(np.arange(s.shape[0]) % 2 == 0, 1.0, -1.0)
        base = encode_wav(s.astype(np.int16), 16000)
        up = encode_wav(np.repeat(s, 2).astype(np.int16), 32000)
        gain = encode_wav((s * 0.5).astype(np.int16), 16000)
        assert (
            len({hashlib.md5(x).hexdigest() for x in (base, up, gain)}) == 3
        )
        assert (
            audio_envelope_hash(base)
            == audio_envelope_hash(up)
            == audio_envelope_hash(gain)
        )

    def test_distinct_patterns_separate(self):
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            audio_envelope_hash,
            encode_wav,
        )

        j = np.arange(65)
        hashes = []
        for p in range(8):
            amps = 800.0 + ((j * (13 + p) + p * 7) % 97) * 300.0
            s = np.repeat(amps, 123)
            s = s * np.where(np.arange(s.shape[0]) % 2 == 0, 1.0, -1.0)
            hashes.append(audio_envelope_hash(encode_wav(s.astype(np.int16))))
        assert len(set(hashes)) == len(hashes)

    def test_dedup_query_groups_variants_with_patterns(self, spark):
        from opendata_gov_lt_mysql_import_spark.queries_ml import (
            audio_envelope_dedup_q,
        )

        out = audio_envelope_dedup_q(spark, "/root/testdata/sf0.001").collect()
        # 500 ids over 50 patterns -> every pattern group holds its 10
        # ids INCLUDING the byte-distinct resamples (id % 3 == 0) and
        # gain shifts (id % 5 == 0)
        assert sum(r["n_clips"] for r in out) == 500
        assert all(r["n_clips"] == 10 for r in out) and len(out) == 50
        keepers = sorted(r["keeper"] for r in out)
        assert keepers == list(range(50))


class TestAudioEnvelopeProperties:
    """Property tests over RANDOM staircase signals — the fixed 50
    patterns above pin the query; these pin the hash's contract for any
    signal in its stated invariance class (adjacent segment energies
    well-separated)."""

    def test_gain_and_resample_invariance_random_staircases(self):
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            audio_envelope_hash,
            encode_wav,
        )

        rng = np.random.default_rng(421)
        for _ in range(25):
            # random amplitudes with a guaranteed >=600-unit adjacent gap
            # (the invariance class: comparisons never sit on a tie)
            amps = rng.integers(1, 50, size=65) * 600.0 + 500.0
            while np.any(np.abs(np.diff(amps)) < 600):
                amps = rng.integers(1, 50, size=65) * 600.0 + 500.0
            s = np.repeat(amps, 123)
            s = s * np.where(np.arange(s.shape[0]) % 2 == 0, 1.0, -1.0)
            base = audio_envelope_hash(encode_wav(s.astype(np.int16), 16000))
            for variant in (
                encode_wav(np.repeat(s, 2).astype(np.int16), 32000),
                encode_wav(np.repeat(s, 3).astype(np.int16), 48000),
                encode_wav((s * 0.5).astype(np.int16), 16000),
                encode_wav((s * 0.25).astype(np.int16), 16000),
            ):
                assert audio_envelope_hash(variant) == base

    def test_hash_format_and_stability(self):
        import numpy as np

        from opendata_gov_lt_mysql_import_spark.operators.multimodal import (
            audio_envelope_hash,
            encode_wav,
        )

        rng = np.random.default_rng(77)
        s = (rng.standard_normal(4000) * 3000).astype(np.int16)
        payload = encode_wav(s, 16000)
        h = audio_envelope_hash(payload)
        assert len(h) == 16 and int(h, 16) >= 0
        assert audio_envelope_hash(payload) == h  # pure function
