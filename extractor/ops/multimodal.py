"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The *decode* step is REAL for lossless containers — PNG/GIF/TIFF/BMP
(own stdlib decoders, ``extractor/imagecodec.py``) and PCM WAV audio
(``extractor/audiocodec.py``) — and stubbed only for lossy codecs
(JPEG/WebP/MP3 need a codec library not present in this container;
those raise ``NotImplementedError`` → contained error rows).
Everything Spark-side is real and tested either way: the binary-column
schema, the Arrow batch shape through ``mapInPandas`` (bytes round-trip),
partition-size control for large blobs, and the feature-extraction output
schema.

Synthetic payload format (deterministic, self-describing):
    b"FAKEIMG|<width>|<height>|<fmt>|" + pseudo-random pixel bytes
so the "decoder" can be exercised end-to-end without codecs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("error", T.StringType()),
    ]
)


def synth_media_df(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table — generated on executors, like
    ``extractor.transcripts`` (no driver-side data)."""

    def gen(iterator):
        import pandas as pd

        kinds = ("image", "audio", "video")
        fmts = ("png", "jpg", "bmp")
        rows = []
        for pdf in iterator:
            for i in pdf["id"]:
                i = int(i)
                h = hashlib.md5(f"{seed}:{i}".encode()).digest()
                width = 16 + h[0] % 64
                height = 16 + h[1] % 64
                fmt = fmts[h[2] % 3]
                body = (h * ((width * height) // len(h) + 1))[: width * height]
                payload = f"FAKEIMG|{width}|{height}|{fmt}|".encode() + body
                rows.append(
                    (
                        i,
                        kinds[h[3] % 3],
                        payload,
                        {
                            "width": width,
                            "height": height,
                            "format": fmt,
                            "n_bytes": len(payload),
                        },
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )
            rows = []

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def decode_payload(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an image payload to ``(width, height, pixel_bytes)``.

    REAL for the lossless containers: PNG (all 8-bit color types, own
    stdlib decoder — ``extractor.imagecodec.png_decode``), GIF (own
    LSB-first LZW, first frame), baseline TIFF (none/PackBits/LZW
    strips), and 24-bit BI_RGB BMP — and for baseline-sequential JPEG
    (own DCT+Huffman decoder, ``extractor.jpegcodec``, any sampling
    factors incl. 4:2:0, validated against real libjpeg-encoded files),
    all byte-sniffed; also the self-describing synthetic ``FAKEIMG|``
    payloads used by the oracle-checked contract entries.  JPEG decode
    covers baseline, extended sequential, AND progressive; only
    WebP/AVIF (and arithmetic-coded JPEG) remain the honest boundary —
    they raise ``NotImplementedError``; callers convert that to an
    error row."""
    from extractor.imagecodec import (
        bmp_decode,
        gif_decode,
        png_decode,
        sniff_image,
        tiff_decode,
    )
    from extractor.jpegcodec import jpeg_decode

    if payload is None:
        raise ValueError("null payload")
    payload = bytes(payload)
    if payload.startswith(b"FAKEIMG|"):
        _, w, h, _fmt, body = payload.split(b"|", 4)
        return int(w), int(h), body
    kind = sniff_image(payload)
    if kind == "png":
        w, h, _ch, pixels = png_decode(payload)
        return w, h, pixels
    if kind == "gif":
        w, h, _ch, pixels = gif_decode(payload)
        return w, h, pixels
    if kind == "tiff":
        w, h, _ch, pixels = tiff_decode(payload)
        return w, h, pixels
    if kind == "bmp":
        w, h, _ch, pixels = bmp_decode(payload)
        return w, h, pixels
    if kind == "jpeg":
        w, h, _ch, pixels = jpeg_decode(payload)
        return w, h, pixels
    raise NotImplementedError(
        "image decoding for %r requires a codec library not available in "
        "this environment (PNG/GIF/TIFF/BMP/baseline-JPEG decode for real)"
        % (kind or "unrecognized bytes")
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Decode → fixed-dim feature vector, as an Arrow-batched kernel.
    Per-row errors are contained (O4 semantics), never failing the batch.

    Scale: blobs make rows heavy — pair with a LOW arrow batch size and
    ``spark.sql.files.maxPartitionBytes`` sized so (batch rows × blob size)
    fits executor memory; the kernel itself is O(batch bytes)."""

    def kernel(iterator):
        import numpy as np
        import pandas as pd

        for pdf in iterator:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, body = decode_payload(
                        bytes(payload) if payload is not None else None
                    )
                    arr = np.frombuffer(body, dtype=np.uint8).astype(np.float32)
                    # deterministic pooled "embedding": mean over strided bins
                    pad = (-len(arr)) % FEATURE_DIM
                    if pad:
                        arr = np.pad(arr, (0, pad))
                    feats = arr.reshape(FEATURE_DIM, -1).mean(axis=1) / 255.0
                    out.append(
                        (media_id, w, h, [float(x) for x in feats], None)
                    )
                except Exception as exc:
                    out.append((media_id, None, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "features", "error"]
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("error", T.StringType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio decode → fixed-dim RMS-energy profile, as an Arrow-batched
    kernel — the audio twin of :func:`extract_features`.

    REAL for PCM WAV (stdlib ``wave`` via ``extractor/audiocodec.py``,
    8/16-bit, any channel layout — channels mixed down before binning);
    the synthetic ``FAKEIMG|`` payloads decode through a deterministic
    byte→sample view so the plumbing is exercised without codecs; MP3/
    Ogg/FLAC raise into contained error rows (O4).  Same scale posture
    as the image kernel: map-only, O(batch bytes), blob-heavy rows pair
    with a low Arrow batch size."""

    def kernel(iterator):
        import numpy as np
        import pandas as pd

        from extractor.audiocodec import wav_decode

        for pdf in iterator:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    raw = bytes(payload)
                    if raw.startswith(b"FAKEIMG|"):
                        _, _w, _h, _fmt, body = raw.split(b"|", 4)
                        arr = (
                            np.frombuffer(body, dtype=np.uint8).astype(
                                np.float32
                            )
                            - 128.0
                        ) / 128.0
                        nch, rate, nframes = 1, 16000, len(arr)
                    else:
                        nch, rate, nframes, arr = wav_decode(raw)
                        if nch > 1:  # mono mixdown before binning
                            arr = arr.reshape(-1, nch).mean(axis=1)
                    pad = (-len(arr)) % FEATURE_DIM
                    if pad:
                        arr = np.pad(arr, (0, pad))
                    rms = np.sqrt(
                        (arr.reshape(FEATURE_DIM, -1) ** 2).mean(axis=1)
                    )
                    out.append(
                        (
                            media_id, nch, rate, nframes,
                            [float(x) for x in rms], None,
                        )
                    )
                except Exception as exc:
                    out.append(
                        (media_id, None, None, None, None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "n_channels", "sample_rate", "n_frames",
                    "features", "error",
                ],
            )

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)
    )


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning — pure metadata math, fully JVM-side: target dims
    preserving aspect ratio (the byte-level resample is the stubbed part)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("meta.width"), F.col("meta.height")).cast("double"),
    )
    return media.select(
        "media_id",
        "kind",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.round(F.col("meta.width") * scale).cast("int").alias("target_width"),
        F.round(F.col("meta.height") * scale).cast("int").alias("target_height"),
    )


def frame_stride_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Stride frame-sampling plan for video rows: explode frame indices
    0..n step every_n (n proxied from byte length) — the fixed-stride
    counterpart of :func:`frame_sample_plan` (which spaces a bounded
    frame count evenly).  Shows the explode-side-table pattern for
    frame-level work without decoding."""
    video = media.where(F.col("kind") == "video")
    n_frames = (F.col("meta.n_bytes") / 256).cast("int")
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames, F.lit(every_n))).alias("frame_idx"),
    )


def dhash_groups(features: DataFrame, bits: int = 8) -> DataFrame:
    """Perceptual-hash (dHash) near-duplicate bucketing over the feature
    vectors — image dedup for a multimodal corpus: the gradient hash
    (Krawetz's dHash, public) sets bit *i* iff ``f[i] > f[i+1]``, so
    visually-similar images (similar pooled intensity profiles) land in
    the same bucket regardless of absolute brightness.  Buckets with ≥2
    members are the near-dup candidate groups an exact verifier would
    re-rank — the same bucket-then-verify topology as MinHash-LSH, on
    the image axis.

    The comparison chain is a pure codegen'd ``aggregate(sequence)``
    over the feature array (map-only, no Python); grouping is ONE
    dhash-keyed agg.  With the feature kernel's float32 values emulated
    exactly by the oracle, even the float comparisons are
    engine-reproducible.  Output: ``(dhash, n_media, min_media_id,
    max_media_id)`` for each candidate group."""
    sig = F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT),"
        " (acc, i) -> acc + CAST(CASE WHEN"
        "   element_at(features, CAST(i + 1 AS INT)) >"
        "   element_at(features, CAST(i + 2 AS INT))"
        " THEN 1 ELSE 0 END AS BIGINT)"
        " * shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)))"
    )
    return (
        features.where(F.col("features").isNotNull())
        .select("media_id", sig.alias("dhash"))
        .groupBy("dhash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.min("media_id").alias("min_media_id"),
            F.max("media_id").alias("max_media_id"),
        )
        .where(F.col("n_media") >= 2)
    )


def frame_sample_plan(media: DataFrame, max_frames: int = 8) -> DataFrame:
    """Deterministic video frame-sampling PLAN: for every ``video`` row,
    the evenly-spaced frame indices a decode stage would extract — the
    Spark-side half of video ingestion (the actual frame decode needs a
    codec library absent here, exactly like ``decode_payload``; the
    plumbing — schema, per-frame rows, timestamps — is real and
    oracle-checked).

    Stream parameters derive deterministically from the typed metadata
    (no codec probe): ``duration_s = 5 + (width - 16)`` and fps by
    container format (png→24, jpg→30, bmp→60 — stand-ins for real
    containers).  ``n = min(max_frames, total_frames)`` indices, the
    i-th at ``frame_idx = i * total_frames DIV n`` (the uniform sampler
    every video pipeline uses), with its millisecond timestamp
    ``ts_ms = frame_idx * 1000 DIV fps``.

    Scale shape: map-only — one ``sequence``/``posexplode`` per video
    row (≤ max_frames rows out per video, never total_frames), all
    JVM-side; no shuffle, no Python.  Partition count follows the
    input, so a downstream decode kernel (Arrow-batched, like
    ``extract_features``) inherits sane batch sizes.

    Output: ``(media_id, frame_no, frame_idx, ts_ms, total_frames)``."""
    vids = media.where(F.col("kind") == "video").select(
        "media_id",
        (F.lit(5) + F.col("meta.width") - F.lit(16))
        .cast("long")
        .alias("duration_s"),
        F.when(F.col("meta.format") == "png", F.lit(24))
        .when(F.col("meta.format") == "jpg", F.lit(30))
        .otherwise(F.lit(60))
        .cast("long")
        .alias("fps"),
    )
    vids = vids.withColumn(
        "total_frames", F.col("duration_s") * F.col("fps")
    ).withColumn(
        "n", F.least(F.lit(max_frames).cast("long"), F.col("total_frames"))
    )
    return vids.select(
        "media_id",
        "total_frames",
        "fps",
        "n",
        F.posexplode(F.sequence(F.lit(0), F.col("n") - 1)).alias(
            "frame_no", "_i"
        ),
    ).select(
        "media_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        F.expr("frame_no * total_frames DIV n").alias("frame_idx"),
        F.expr("(frame_no * total_frames DIV n) * 1000 DIV fps").alias(
            "ts_ms"
        ),
        "total_frames",
    )
