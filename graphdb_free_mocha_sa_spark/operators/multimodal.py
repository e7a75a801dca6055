"""Multimodal (image/audio/video) column plumbing (E4).

Media are opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
UDFs. Two decode modes:

* ``decode="real"`` — REAL decoders with no codec libraries: PCM WAV audio
  (``wave``), **FLAC compressed audio via the pure-Python codec**
  (flac_codec.py — lossless, so bit-exact vs source PCM; round 5b),
  PPM(P6), 24-bit uncompressed BMP, **8-bit PNG** (png_codec.py: stdlib
  zlib + the five scanline filters), **baseline JPEG** (jpeg_codec.py)
  and **GIF** (gif_codec.py) — all round 5. Features are real signal
  statistics (FFT band energies, channel moments, luma grid); resize is
  a real nearest-neighbour resample re-encoded as PPM; audio resample is
  linear-interpolation over the decoded samples. MP3/H.264 still raise
  NotImplementedError — those codecs (PIL/librosa/pyav) are not in this
  container and are beyond a reasonable pure-Python reimplementation.
* ``decode="fake"`` — a deterministic content-hash-seeded fake that keeps
  the Spark-side plumbing (schema, batching, partitioning) testable for
  any payload.

Scale notes: binary payloads never shuffle — all per-media operators are
narrow (mapInPandas over the scan); only extracted features (small fixed-size
vectors) flow into joins/aggregations downstream.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("content", BinaryType()),        # opaque payload
    StructField("meta", StructType([
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("codec", StringType()),
    ])),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("n_bytes", LongType()),
])


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 64), dtype=np.uint8).tobytes()
        meta = (64, 48, None, None, "png") if kind == "image" else \
               (None, None, 16000, None, "pcm") if kind == "audio" else \
               (64, 48, None, 120, "h264")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthesize_real_media(spark, n: int = 24, seed: int = 42) -> DataFrame:
    """Media table with GENUINE payloads the real decoders accept:
    PPM(P6) images and 16-bit PCM WAV tones — built with stdlib only."""
    import io
    import wave
    from graphdb_free_mocha_sa_spark.operators.png_codec import encode_png
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 32 + (i % 3) * 16, 24 + (i % 2) * 8
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if i % 6 == 0:       # rotate: PNG / JPEG(4:2:0) / raw PPM
                rows.append((i, "image",
                             bytearray(encode_png(img, filter_mode="mixed")),
                             (w, h, None, None, "png")))
            elif i % 6 == 2:
                from graphdb_free_mocha_sa_spark.operators.jpeg_codec import (
                    encode_jpeg)
                rows.append((i, "image",
                             bytearray(encode_jpeg(img, quality=92,
                                                   subsample=True)),
                             (w, h, None, None, "jpeg")))
            else:
                rows.append((i, "image", bytearray(encode_ppm(img)),
                             (w, h, None, None, "ppm")))
        elif i % 4 == 1:
            rate = 8000
            t = np.arange(rate // 4) / rate
            tone = (np.sin(2 * np.pi * (220 + 20 * i) * t) * 2 ** 14)
            if i % 8 == 5:       # rotate: FLAC (real compressed audio)
                from graphdb_free_mocha_sa_spark.operators.flac_codec import (
                    encode_flac)
                rows.append((i, "audio",
                             bytearray(encode_flac(
                                 tone.astype(np.int16), rate)),
                             (None, None, rate, None, "flac")))
            elif i % 16 == 9:    # rotate: IMA-ADPCM (real lossy 4:1)
                from graphdb_free_mocha_sa_spark.operators.adpcm_codec import (
                    encode_adpcm_wav)
                rows.append((i, "audio",
                             bytearray(encode_adpcm_wav(
                                 tone.astype(np.int16), rate)),
                             (None, None, rate, None, "ima_adpcm")))
            else:                # PCM WAV
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(rate)
                    wf.writeframes(tone.astype(np.int16).tobytes())
                rows.append((i, "audio", bytearray(buf.getvalue()),
                             (None, None, rate, None, "pcm_s16le")))
        else:
            # real VIDEO: MJPEG elementary stream or animated GIF
            w, h = 24, 16
            nf = 6 + (i % 3)
            yy, xx = np.mgrid[0:h, 0:w]
            if i % 8 == 3:
                from graphdb_free_mocha_sa_spark.operators.gif_codec import (
                    encode_gif)
                pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
                frames = [((xx + yy + f) % 32).astype(np.uint8)
                          for f in range(nf)]
                rows.append((i, "video", bytearray(encode_gif(frames, pal)),
                             (w, h, None, nf, "gif")))
            else:
                from graphdb_free_mocha_sa_spark.operators.jpeg_codec import (
                    encode_jpeg)
                stream = b"".join(
                    encode_jpeg(np.clip(np.stack(
                        [(xx * 4 + f * 10) % 256, (yy * 6) % 256,
                         (xx + yy + f * 5) % 256], axis=2), 0, 255)
                        .astype(np.uint8), quality=90)
                    for f in range(nf))
                rows.append((i, "video", bytearray(stream),
                             (w, h, None, nf, "mjpeg")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(content: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: hash-seeded vector."""
    seed = int.from_bytes(content[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    return np.random.default_rng(seed).standard_normal(FEATURE_DIM).astype(np.float32)


# ------------------------------------------------------- real decoders


def decode_image(content: bytes) -> np.ndarray:
    """(h, w, 3) uint8 array from PPM(P6), 24-bit uncompressed BMP, or
    8-bit PNG (pure-Python codec, png_codec.py — stdlib zlib, no PIL)."""
    import struct
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        from graphdb_free_mocha_sa_spark.operators.png_codec import decode_png_rgb
        return decode_png_rgb(content)
    if content[:2] == b"\xFF\xD8":
        from graphdb_free_mocha_sa_spark.operators.jpeg_codec import decode_jpeg
        img = decode_jpeg(content)
        return np.repeat(img, 3, axis=2) if img.shape[2] == 1 else img
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from graphdb_free_mocha_sa_spark.operators.gif_codec import decode_gif
        return decode_gif(content)
    if content[:2] == b"P6":
        parts: list[bytes] = []
        pos = 2
        while len(parts) < 3:
            while pos < len(content) and content[pos:pos + 1].isspace():
                pos += 1
            if content[pos:pos + 1] == b"#":          # comment line
                pos = content.index(b"\n", pos) + 1
                continue
            end = pos
            while not content[end:end + 1].isspace():
                end += 1
            parts.append(content[pos:end])
            pos = end
        w, h, maxv = (int(x) for x in parts)
        pos += 1                                      # single whitespace
        px = np.frombuffer(content, np.uint8, count=w * h * 3, offset=pos)
        return px.reshape(h, w, 3).copy()
    if content[:2] == b"BM":
        off, = struct.unpack_from("<I", content, 10)
        w, h = struct.unpack_from("<ii", content, 18)
        bpp, comp = struct.unpack_from("<HI", content, 28)
        if bpp != 24 or comp != 0:
            raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
        row_bytes = (w * 3 + 3) & ~3
        rows = []
        for y in range(abs(h)):
            r = np.frombuffer(content, np.uint8, count=w * 3,
                              offset=off + y * row_bytes).reshape(w, 3)
            rows.append(r[:, ::-1])                   # BGR → RGB
        img = np.stack(rows)
        return img[::-1] if h > 0 else img            # bottom-up unless h<0
    raise NotImplementedError(
        "real image decode supports PNG(8-bit)/baseline JPEG/PPM(P6)/BMP24 "
        "(progressive JPEG, palette PNG etc. still unimplemented)")


def decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """(float32 mono samples in [-1,1], sample_rate) from a PCM WAV, an
    IMA-ADPCM WAV (fmt tag 0x11, pure-Python codec, adpcm_codec.py) or a
    FLAC stream (pure-Python codec, flac_codec.py) — REAL compressed-audio
    decode paths, FLAC bit-exact vs the source PCM."""
    import io
    import struct as _struct
    import wave
    if content[:4] == b"fLaC":
        from graphdb_free_mocha_sa_spark.operators.flac_codec import (
            decode_flac)
        x, rate = decode_flac(content)
        f = x.astype(np.float32) / 32768.0
        if f.ndim > 1:
            f = f.mean(axis=1)
        return f, rate
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        # peek the fmt tag: wave.open only reads PCM
        pos, tag = 12, 0x0001
        while pos + 8 <= len(content):
            cid = content[pos:pos + 4]
            clen = _struct.unpack("<I", content[pos + 4:pos + 8])[0]
            if cid == b"fmt ":
                tag = _struct.unpack("<H", content[pos + 8:pos + 10])[0]
                break
            pos += 8 + clen + (clen & 1)
        if tag == 0x0011:
            from graphdb_free_mocha_sa_spark.operators.adpcm_codec import (
                decode_adpcm_wav)
            x, rate = decode_adpcm_wav(content)
            return x.astype(np.float32) / 32768.0, rate
    with wave.open(io.BytesIO(content), "rb") as wf:
        rate = wf.getframerate()
        width = wf.getsampwidth()
        nch = wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"PCM width {width} unsupported")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def _image_feature_from_array(raw: np.ndarray) -> np.ndarray:
    img = raw.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    luma = img.mean(axis=2)
    # 3x3 luma grid via block means
    gy = np.array_split(luma, 3, axis=0)
    grid = [float(b.mean()) for row in gy for b in np.array_split(row, 3, axis=1)]
    feat = ([float(img[..., c].mean()) for c in range(3)]
            + [float(img[..., c].std()) for c in range(3)]
            + grid + [w / max(h, 1)])
    out = np.zeros(FEATURE_DIM, np.float32)
    out[:min(len(feat), FEATURE_DIM)] = feat[:FEATURE_DIM]
    return out


def _real_feature(kind: str, content: bytes) -> np.ndarray:
    if kind == "image":
        return _image_feature_from_array(decode_image(content))
    elif kind == "audio":
        x, rate = decode_audio(content)
        if len(x) == 0:
            x = np.zeros(1, np.float32)
        spec = np.abs(np.fft.rfft(x))
        bands = [float(b.mean()) if len(b) else 0.0
                 for b in np.array_split(spec, 12)]
        zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) if len(x) > 1 else 0.0
        feat = [float(x.mean()), float(x.std()),
                float(np.sqrt(np.mean(x * x))), zcr] + bands
    elif kind == "video" and (content[:2] == b"\xFF\xD8"
                              or content[:6] in (b"GIF87a", b"GIF89a")):
        # MJPEG elementary stream or animated GIF: average the image
        # features of up to 3 evenly spaced REALLY-decoded frames; the
        # last slot carries the frame count
        if content[:2] == b"\xFF\xD8":
            frames = split_mjpeg_frames(content)
            if not frames:
                raise ValueError("empty MJPEG stream")
            picks = frames[:: max(1, len(frames) // 3)][:3]
            per = np.stack([_real_feature("image", f) for f in picks])
        else:
            from graphdb_free_mocha_sa_spark.operators.gif_codec import (
                decode_gif_frames)
            frames = decode_gif_frames(content)
            picks = frames[:: max(1, len(frames) // 3)][:3]
            per = np.stack([_image_feature_from_array(f) for f in picks])
        feat = per.mean(axis=0).tolist()
        feat[FEATURE_DIM - 1] = float(len(frames))
    else:
        raise NotImplementedError(
            "real video decode supports MJPEG and animated GIF "
            "(H.264/VP9 need pyav)")
    out = np.zeros(FEATURE_DIM, np.float32)
    out[:min(len(feat), FEATURE_DIM)] = feat[:FEATURE_DIM]
    return out


def extract_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Per-media feature vectors via Arrow-batched mapInPandas.

    ``decode="real"`` runs the stdlib/numpy decoders (PCM WAV, PPM/BMP24);
    compressed codecs and video raise NotImplementedError per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                feats = [list(map(float, _real_feature(k, bytes(c))))
                         for k, c in zip(pdf["kind"], pdf["content"])]
            else:
                feats = [list(map(float, _fake_feature(bytes(c))))
                         for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": pdf["content"].map(len).astype("int64"),
            })

    return media.mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("content", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def resize_images(media: DataFrame, width: int, height: int,
                  decode: str = "fake") -> DataFrame:
    """Image resize. ``decode="real"``: decode PPM/BMP24 → nearest-neighbour
    resample (pure numpy index grid) → re-encode as PPM. Fake path
    truncates/pads the payload to w*h (plumbing only)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = width * height
        for pdf in batches:
            if decode == "real":
                out = []
                for c in pdf["content"]:
                    img = decode_image(bytes(c))
                    h0, w0 = img.shape[:2]
                    yi = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                    xi = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                    out.append(encode_ppm(img[yi][:, xi]))
            else:
                out = [bytes(c)[:size].ljust(size, b"\0") for c in pdf["content"]]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "content": [bytearray(o) for o in out],
                                "width": width, "height": height})

    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


RESAMPLED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("content", BinaryType()),         # re-encoded PCM WAV
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
])


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """16-bit mono PCM WAV from float samples in [-1, 1] (stdlib wave)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.clip(samples * 32767.0, -32768, 32767)
                       .astype(np.int16).tobytes())
    return buf.getvalue()


def resample_audio(media: DataFrame, rate: int,
                   decode: str = "fake") -> DataFrame:
    """Audio resample (the audio analogue of resize_images, E4).

    ``decode="real"``: decode PCM WAV → linear-interpolation resample to
    ``rate`` → re-encode 16-bit mono WAV. Fake path re-stamps metadata
    only (plumbing). Arrow-batched mapInPandas; payloads never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "content",
                                   "sample_rate", "n_samples")}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if decode == "real":
                    x, r0 = decode_audio(bytes(c))
                    n1 = max(1, int(round(len(x) * rate / max(r0, 1))))
                    t1 = np.linspace(0.0, max(len(x) - 1, 0), n1)
                    y = np.interp(t1, np.arange(len(x)), x) if len(x) \
                        else np.zeros(1, np.float32)
                    payload = encode_wav(y, rate)
                else:
                    payload, y = bytes(c), np.zeros(0)
                out["media_id"].append(mid)
                out["content"].append(bytearray(payload))
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(y))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, RESAMPLED_SCHEMA)


def split_mjpeg_frames(content: bytes) -> list[bytes]:
    """Split an MJPEG elementary stream (concatenated JPEGs — the payload
    format of motion-JPEG cameras/HTTP streams) into individual frames by
    SOI/EOI scanning, honoring entropy-data byte stuffing via the real
    JPEG structure (frames end at their EOI marker)."""
    frames = []
    pos = 0
    n = len(content)
    while pos < n - 1:
        if content[pos] == 0xFF and content[pos + 1] == 0xD8:
            end = content.find(b"\xFF\xD9", pos + 2)
            if end < 0:
                break
            frames.append(content[pos:end + 2])
            pos = end + 2
        else:
            pos += 1
    return frames


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),           # the sampled frame (JPEG)
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def sample_frames(media: DataFrame, every_n: int = 30,
                  decode: str = "fake") -> DataFrame:
    """Video frame sampling. ``decode="real"``: MJPEG elementary streams
    (codec "mjpeg") are REALLY split into frames (SOI/EOI scan), every
    n-th frame is kept and decoded for its dimensions via the pure-Python
    JPEG codec — one output row per sampled frame with the frame bytes.
    H.264/VP9 still raise NotImplementedError (no pyav in container).
    Fake path: one row per sampled frame index from metadata only."""
    if decode == "real":
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {k: [] for k in
                       ("media_id", "frame_idx", "frame", "width", "height")}
                for mid, codec, c in zip(pdf["media_id"],
                                         pdf["codec"], pdf["content"]):
                    if codec == "mjpeg":
                        frames = split_mjpeg_frames(bytes(c))
                        decoded = None
                    elif codec == "gif":
                        from graphdb_free_mocha_sa_spark.operators.gif_codec \
                            import decode_gif_frames
                        from graphdb_free_mocha_sa_spark.operators.png_codec \
                            import encode_png
                        decoded = decode_gif_frames(bytes(c))
                        frames = [encode_png(f) for f in decoded]
                    else:
                        raise NotImplementedError(
                            f"real frame sampling supports MJPEG and GIF "
                            f"(codec={codec!r} needs pyav)")
                    for i in range(0, len(frames), every_n):
                        img = decoded[i] if decoded is not None \
                            else decode_image(frames[i])
                        out["media_id"].append(mid)
                        out["frame_idx"].append(i)
                        out["frame"].append(bytearray(frames[i]))
                        out["width"].append(img.shape[1])
                        out["height"].append(img.shape[0])
                yield pd.DataFrame(out)

        vids = media.filter(F.col("kind") == "video") \
            .select("media_id", F.col("meta.codec").alias("codec"), "content")
        return vids.mapInPandas(run, FRAME_SCHEMA)
    vids = media.filter((F.col("kind") == "video") & F.col("meta.n_frames").isNotNull())
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1,
                             F.lit(every_n))).alias("frame_idx"))
