"""Multimodal column plumbing (beyond-reference surface).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages. Three REAL dependency-free
codecs are live — binary PPM (P6), binary PGM (P5 grayscale),
uncompressed 24/32-bit BMP, and
RIFF/WAVE PCM16 — with real pixel/sample decode, feature extraction,
and nearest-neighbor resize; only compressed formats (JPEG/PNG/MP3/
video), which require codec libraries absent from this container, stay
behind ``NotImplementedError`` with a deterministic fake used by tests.
The Spark-side contract (schema, partitioning, UDF signature, batch
shape) is identical on both paths.

Scale notes: binary payloads ride in the same parquet row groups as their
metadata; ``spark.sql.files.maxPartitionBytes`` governs scan parallelism.
Feature extraction is a narrow mapInPandas (no shuffle); downstream joins
should carry only the extracted features, never the raw bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("fingerprint", StringType()),
    ]
)


PPM_MIME = "image/x-portable-pixmap"


def decode_ppm(payload: bytes):
    """REAL image decode, zero dependencies: binary PPM (P6) → HxWx3
    uint8 numpy array. Header = 'P6', width, height, maxval as ASCII
    tokens (comments allowed), one whitespace byte, then raw RGB.
    Uncompressed formats need no codec — this path is fully live; only
    compressed formats (JPEG/PNG/video) remain behind the stub."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    # tokenize header: skip whitespace and '#' comments
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def encode_ppm(arr) -> bytes:
    """HxWx3 uint8 array → binary PPM payload (the test-fixture encoder
    and the re-encode half of the real resize path)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize for PPM payloads, pure numpy: index
    the decoded array with scaled row/column grids and re-encode."""
    import numpy as np

    img = decode_ppm(payload)
    src_h, src_w = img.shape[:2]
    rows = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    cols = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return encode_ppm(img[rows][:, cols])


PGM_MIME = "image/x-portable-graymap"


def decode_pgm(payload: bytes):
    """REAL grayscale decode, zero dependencies: binary PGM (P5) → HxW
    uint8 numpy array. Same header grammar as PPM (P5, width, height,
    maxval; comments allowed), one whitespace byte, then raw gray."""
    import numpy as np

    if payload[:2] != b"P5":
        raise ValueError("not a binary PGM (P5) payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos)
    return data.reshape(h, w)


def encode_pgm(arr) -> bytes:
    """HxW uint8 array → binary PGM payload."""
    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def resize_pgm(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize for PGM payloads, pure numpy."""
    import numpy as np

    img = decode_pgm(payload)
    src_h, src_w = img.shape
    rows = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    cols = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return encode_pgm(img[rows][:, cols])


BMP_MIME = "image/bmp"


def decode_bmp(payload: bytes):
    """REAL image decode, zero dependencies: uncompressed (BI_RGB)
    24/32-bit BMP → HxWx3 uint8 RGB array. Handles the 4-byte row
    padding, BGR byte order, and both bottom-up (positive height, the
    common case) and top-down (negative height) layouts."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bits,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bits not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP is supported "
            f"(compression={compression}, bits={bits})"
        )
    top_down = h < 0
    h = abs(h)
    bpp = bits // 8
    stride = (w * bpp + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    px = rows[:, : w * bpp].reshape(h, w, bpp)
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB, alpha dropped
    return rgb if top_down else rgb[::-1]


def encode_bmp(arr) -> bytes:
    """HxWx3 uint8 RGB array → uncompressed 24-bit bottom-up BMP (the
    fixture encoder and the re-encode half of the real resize path)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    )
    return header + data


def decode_image(payload: bytes) -> object:
    """Image decode: REAL for the uncompressed formats (binary PPM and
    BI_RGB BMP — pure numpy, dispatched on the magic bytes); compressed
    formats (JPEG/PNG/…) require a codec library not present in this
    container and stay stubbed — swap in Pillow/ffmpeg here when
    available. The plumbing (schema, batching) is identical either way."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"P5":
        return decode_pgm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "compressed image decode requires an imaging library; PPM, PGM and "
        "BMP "
        "payloads decode natively, or use fake_decode_features for opaque "
        "bytes"
    )


WAV_MIME = "audio/wav"


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """REAL audio encode, zero dependencies: int16 PCM samples →
    RIFF/WAVE bytes. ``samples`` is a 1-D (mono) or (n_frames,
    n_channels) int16 array; standard 44-byte canonical header."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    data = arr.tobytes()  # interleaved little-endian, as WAV wants
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes):
    """REAL audio decode, zero dependencies: RIFF/WAVE PCM16 → (int16
    array of shape (n_frames, n_channels), sample_rate). Walks the chunk
    list (tolerates extra chunks like LIST/fact); only uncompressed
    16-bit PCM (format tag 1) is supported — compressed codecs (MP3/AAC/
    OGG) need a library absent from this container."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_channels, sample_rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, n_channels, sample_rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if tag != 1 or bits != 16:
                raise NotImplementedError(
                    "only uncompressed 16-bit PCM WAV is supported "
                    f"(format tag={tag}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if n_channels is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    return arr.reshape(-1, n_channels), sample_rate


def audio_features(payload: bytes) -> tuple[float, float, float, int, int]:
    """Decode-backed audio features over a WAV payload: (duration_sec,
    rms, peak, sample_rate, n_channels), amplitudes normalized to
    [-1, 1] by the int16 full scale."""
    import numpy as np

    if not payload:
        # NULL/empty payload rows yield zero features instead of
        # aborting the whole job inside an executor with a misleading
        # "not RIFF/WAVE" error
        return 0.0, 0.0, 0.0, 0, 0
    arr, rate = decode_wav(payload)
    x = arr.astype(np.float64) / 32768.0
    n = arr.shape[0]
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    peak = float(np.abs(x).max()) if n else 0.0
    return n / rate, rms, peak, rate, arr.shape[1]


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched WAV feature extraction (duration/rms/peak) —
    narrow mapInPandas, same scale contract as the image path: raw
    bytes never leave the stage, downstream carries only features."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [
                audio_features(bytes(p) if p is not None else b"")
                for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "duration_sec": [r[0] for r in rows],
                    "rms": [r[1] for r in rows],
                    "peak": [r[2] for r in rows],
                    "sample_rate": [r[3] for r in rows],
                    "n_channels": [r[4] for r in rows],
                }
            )

    return media.mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA)


def attach_fake_audio(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic WAV fixture generator: a ±A square wave whose
    amplitude and length are closed-form functions of the id — so an
    independent engine can predict duration/rms/peak WITHOUT decoding
    (rms of a ±A square wave is exactly A). The payload itself is a
    fully real RIFF/WAVE file built per-batch in Arrow stages."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = []
            for mid in batch["media_id"]:
                amp = 1 + (int(mid) % 100) * 300
                n = 4000 + (int(mid) % 7) * 2000
                wave = np.full(n, amp, dtype=np.int16)
                wave[1::2] = -amp
                payloads.append(encode_wav(wave, 16000))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "mime": [WAV_MIME] * len(batch),
                    "payload": payloads,
                }
            )

    ids = df.select(F.col(id_col).alias("media_id"))
    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


def fake_decode_features(payload: bytes) -> tuple[int, float, str]:
    """Deterministic stand-in for decode+feature-extract: byte length,
    byte mean, md5 fingerprint."""
    import hashlib

    n = len(payload)
    mean = (sum(payload) / n) if n else 0.0
    return n, mean, hashlib.md5(payload).hexdigest()


def real_decode_features(payload: bytes) -> tuple[int, float, str]:
    """Decode-backed feature extraction (PPM path): pixel mean over the
    DECODED image plus byte length and payload fingerprint — same output
    contract as the fake, real pixels."""
    import hashlib

    img = decode_image(payload)
    return len(payload), float(img.mean()), hashlib.md5(payload).hexdigest()


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic binary payload column from a text column —
    the test-fixture generator for the multimodal path."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize for BMP payloads, pure numpy —
    decode, index with scaled row/column grids, re-encode as 24-bit."""
    import numpy as np

    img = decode_bmp(payload)
    src_h, src_w = img.shape[:2]
    rows = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    cols = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return encode_bmp(img[rows][:, cols])


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: Arrow-batched mapInPandas with a fixed output
    geometry. PPM and BMP payloads get a REAL nearest-neighbor pixel
    resize (pure numpy); other mimes fall back to the deterministic byte
    truncation/padding stand-in (codec libraries absent), keeping batch
    shapes, schema, and downstream contracts identical on both paths."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for batch in batches:
            out = []
            for mime, p in zip(batch["mime"], batch["payload"]):
                b = bytes(p) if p is not None else b""
                if mime == PPM_MIME:
                    out.append(resize_ppm(b, width, height))
                elif mime == PGM_MIME:
                    out.append(resize_pgm(b, width, height))
                elif mime == BMP_MIME:
                    out.append(resize_bmp(b, width, height))
                else:
                    out.append(b[:target].ljust(target, b"\0"))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "mime": batch["mime"],
                    "payload": out,
                    "width": [width] * len(batch),
                    "height": [height] * len(batch),
                }
            )

    return media.mapInPandas(resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: one input row fans out to ≤ max_frames
    rows (1:N mapInPandas — the video-keyframe shape). The frame extractor
    is a deterministic byte-slicer standing in for a real codec."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, nos, payloads = [], [], []
            for mid, p in zip(batch["media_id"], batch["payload"]):
                b = bytes(p) if p is not None else b""
                for i in range(min(max_frames, max(len(b) // every_n_bytes, 1))):
                    ids.append(mid)
                    nos.append(i)
                    payloads.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": payloads})

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


def extract_media_features(media: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` receives an iterator of pandas batches — constant
    memory per task regardless of partition size; the output schema is
    fixed (FEATURE_SCHEMA) so downstream plans are fully typed."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extract_one = real_decode_features if use_real_decode else fake_decode_features
        for batch in batches:
            feats = [extract_one(p if p is not None else b"") for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "mime": batch["mime"],
                    "n_bytes": [f[0] for f in feats],
                    "byte_mean": [f[1] for f in feats],
                    "fingerprint": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash) — image near-dup for training corpora
# ---------------------------------------------------------------------------

DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", StringType()),
    ]
)


def dhash_bits(payload: bytes) -> str:
    """Difference hash (dHash, the classic 64-bit perceptual image
    fingerprint): decode → integer grayscale → nearest-neighbor 9×8
    downsample → bit per adjacent-column comparison, returned as 16
    lowercase hex chars (a string, not BIGINT — the top bit of a full
    64-bit hash overflows signed long). Scale-invariant for exact
    nearest-neighbor upscales: arange(8)·(2s)//8 indexes the same
    source pixels as arange(8)·s//8, so a 2× resize shares the hash —
    exactly why pipelines dedup on dHash instead of byte md5."""
    import numpy as np

    img = decode_image(payload)
    if img.ndim == 3:
        gray = img.astype(np.int64).sum(axis=2) // img.shape[2]
    else:
        gray = img.astype(np.int64)
    h, w = gray.shape
    rows = (np.arange(8) * h // 8).clip(0, h - 1)
    cols = (np.arange(9) * w // 9).clip(0, w - 1)
    g = gray[rows][:, cols]
    bits = (g[:, :-1] > g[:, 1:]).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return f"{val:016x}"


def dhash_hamming(a: str, b: str) -> int:
    """Bit distance between two 16-hex dHashes."""
    return bin(int(a, 16) ^ int(b, 16)).count("1")


def image_dhash(media: DataFrame) -> DataFrame:
    """Arrow mapInPandas dHash stage: (media_id, payload) → (media_id,
    dhash hex16). Constant memory per task; the downstream dedup is a
    plain groupBy on the hash — at 100 TB the hash column IS the
    shuffle key and payloads never move."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            # NULL/empty payloads hash to NULL (decode_image(b"") would
            # otherwise fall through the magic-byte checks and raise a
            # misleading missing-codec error, killing the whole job for
            # one bad row); downstream groupBy treats NULL as its own
            # quarantine group
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "dhash": [
                        dhash_bits(p) if p else None
                        for p in batch["payload"]
                    ],
                }
            )

    return media.mapInPandas(hash_batches, schema=DHASH_SCHEMA)


def attach_synthetic_bmp(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic 24-bit BMP generator for the image-dedup path:
    pattern index = id % 50 (so ~1/50 of ids share pixel content), a
    32×32 gradient parameterized by the pattern, and every third id
    carrying the 64×64 nearest-neighbor UPSCALE of its pattern instead
    — byte-distinct payloads (md5 differs) that dHash must still
    collapse."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = []
            for mid in batch[id_col]:
                p = int(mid) % 50
                x = np.arange(32)
                base = (
                    (x[None, :] * (3 + p) + x[:, None] * (7 + 2 * (p % 5)))
                    % 251
                ).astype(np.uint8)
                img = np.stack([base, base, base], axis=2)
                payload = encode_bmp(img)
                if int(mid) % 3 == 0:
                    payload = resize_bmp(payload, 64, 64)
                payloads.append(payload)
            yield pd.DataFrame(
                {
                    "media_id": batch[id_col],
                    "mime": ["image/bmp"] * len(payloads),
                    "payload": payloads,
                }
            )

    return df.select(F.col(id_col)).mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual audio hashing (energy-envelope hash) — audio near-dup
# ---------------------------------------------------------------------------

EHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ehash", StringType()),
    ]
)


def audio_envelope_hash(payload: bytes) -> str:
    """Perceptual audio fingerprint, the dHash idea transposed to the
    time axis: decode → mono mix → 65 equal-TIME segments → per-segment
    RMS energy → bit per adjacent-segment comparison → 16 lowercase hex
    chars (64 bits). Invariances a byte-md5 dedup provably lacks:

    - GAIN: scaling every sample by g scales every segment energy by g,
      so the adjacent-energy comparisons are unchanged;
    - RESAMPLING: segment boundaries are FRACTIONS of total duration
      (``i*n//65``), so a rate-doubled payload slices the same signal
      regions; boundary rounding perturbs a 123-sample segment's RMS by
      O(1%), far under any real envelope step.

    Chromaprint/AcoustID fingerprint the spectrogram; the envelope hash
    is its dependency-free integer cousin with the same pipeline role —
    the groupBy key that collapses re-encoded/gain-shifted/resampled
    uploads of one recording."""
    import numpy as np

    arr, _rate = decode_wav(payload)
    x = arr.astype(np.float64).mean(axis=1)
    n = x.shape[0]
    if n == 0:
        return "0" * 16
    bounds = np.arange(66) * n // 65
    energies = []
    for i in range(65):
        seg = x[bounds[i] : max(bounds[i + 1], bounds[i] + 1)]
        energies.append(float(np.sqrt(np.mean(seg * seg))))
    val = 0
    for i in range(64):
        val = (val << 1) | int(energies[i] > energies[i + 1])
    return f"{val:016x}"


def audio_envelope(media: DataFrame) -> DataFrame:
    """Arrow mapInPandas envelope-hash stage: (media_id, payload) →
    (media_id, ehash hex16). Same scale contract as ``image_dhash``:
    payload bytes never leave the stage, the 16-char hash is the
    downstream shuffle key; NULL/empty payloads hash to NULL (their own
    quarantine group) instead of aborting the job."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "ehash": [
                        audio_envelope_hash(p) if p else None
                        for p in batch["payload"]
                    ],
                }
            )

    return media.mapInPandas(hash_batches, schema=EHASH_SCHEMA)


def attach_synthetic_wav(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic WAV generator for the audio-dedup path: pattern
    index = id % 50, a 65-step amplitude staircase with a PER-PATTERN
    step size (a fixed step would make the mod-97 wrap sequence — and
    hence the sign-of-difference bits — coincide across offsets;
    adjacent steps stay ≥3900 int16 units apart so envelope comparisons
    never sit on a tie), ~0.5 s at 16 kHz. Every third id ships the 2×
    NEAREST-NEIGHBOR RESAMPLE (32 kHz, byte-distinct), every fifth id
    the 0.5× GAIN-SHIFTED copy — both md5-distinct payloads the
    envelope hash must collapse onto their pattern's group."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            payloads = []
            for mid in batch[id_col]:
                p = int(mid) % 50
                j = np.arange(65)
                amps = 800.0 + ((j * (13 + p) + p * 7) % 97) * 300.0
                samples = np.repeat(amps, 123)  # ~8k samples ≈ 0.5 s
                # alternate sign per sample: a ±A square carrier whose
                # RMS is exactly the step amplitude
                samples = samples * np.where(
                    np.arange(samples.shape[0]) % 2 == 0, 1.0, -1.0
                )
                if int(mid) % 5 == 0:
                    samples = samples * 0.5
                rate = 16000
                if int(mid) % 3 == 0:
                    samples = np.repeat(samples, 2)
                    rate = 32000
                payloads.append(
                    encode_wav(samples.astype(np.int16), sample_rate=rate)
                )
            yield pd.DataFrame(
                {
                    "media_id": batch[id_col],
                    "mime": ["audio/wav"] * len(payloads),
                    "payload": payloads,
                }
            )

    return df.select(F.col(id_col)).mapInPandas(gen, schema=MEDIA_SCHEMA)
