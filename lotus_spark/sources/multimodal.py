"""Multimodal (image/audio/video) column plumbing.

The reference's multimodal support is a pandas ExtensionDtype holding PIL
images fetched lazily from paths/URLs/base64 (``lotus/dtype_extensions/
image.py:12-61``, ``lotus/utils.py:75-120``). Spark-native model: media are
opaque ``binary`` columns (or URI strings) plus a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.

Decode has two tiers: ``fake=True`` is the deterministic test decode
(hermetic — exercises schema, partitioning, UDF signature, batch shape);
``fake=False`` is the production tier — PIL (images), PyAV (video frames)
and soundfile (audio) import lazily PER EXECUTOR and raise a clear
NotImplementedError when absent (they are not in this container), never a
silent wrong answer.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# media column convention: binary payload + metadata struct
MEDIA_META_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),      # png/jpeg/wav/mp4/...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", StringType()),
        StructField("phash", StringType()),
    ]
)


def _decode_image_bytes(data: bytes, fake: bool) -> dict:
    """Decode image bytes → dict(width, height, mean_luma, phash).

    ``fake=True`` is the deterministic test decode. ``fake=False`` uses PIL
    when importable (production tier; per-executor lazy import); without
    PIL it raises NotImplementedError — the operators stay import-gated,
    never silently wrong (reference fetch/decode semantics:
    ``lotus/dtype_extensions/image.py:12-61``).
    """
    if not fake:
        try:  # pragma: no cover - PIL absent in the test container
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(data))
            gray = img.convert("L")
            import numpy as np

            arr = np.asarray(gray, dtype=np.float64)
            # 8x8 average-hash (aHash): downsample, threshold on the mean
            small = np.asarray(gray.resize((8, 8)), dtype=np.float64)
            bits = (small > small.mean()).astype(np.uint8).ravel()
            phash = bytes(
                int("".join(map(str, bits[i : i + 8])), 2)
                for i in range(0, 64, 8)
            ).hex()
            return {
                "width": int(img.width),
                "height": int(img.height),
                "mean_luma": f"{arr.mean() / 255:.4f}",
                "phash": phash,
            }
        except ImportError as e:
            raise NotImplementedError(
                "image decoding requires PIL, which is not installed in "
                "this container; pass fake=True for the deterministic test "
                "decode"
            ) from e
    # sha256 (r10; was blake2b): the fake tier's whole point is
    # deterministic plumbing checks, and sha256 is computable by DuckDB
    # too — so the image-features pipeline is ORACLE-replayable end to
    # end (staged row q_image_features), not just shape-tested
    h = hashlib.sha256(data or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "mean_luma": f"{h[2] / 255:.4f}",
        "phash": h[:8].hex(),
    }


def image_features(
    df: DataFrame,
    binary_col: str = "media",
    uri_col: str = "uri",
    fake: bool = False,
) -> DataFrame:
    """Arrow-batched decode + feature extraction over a binary image column."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_image_bytes(
                    bytes(b) if b is not None else b"", fake
                )
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {
                    "uri": pdf[uri_col].astype(str),
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_luma": [f["mean_luma"] for f in feats],
                    "phash": [f["phash"] for f in feats],
                }
            )

    return df.select(uri_col, binary_col).mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample(
    df: DataFrame,
    binary_col: str = "media",
    uri_col: str = "uri",
    every_n: int = 30,
    fake: bool = False,
) -> DataFrame:
    """Video → sampled frame rows (uri, frame_idx, frame binary).

    Decode is stubbed (ffmpeg absent): with ``fake=True`` each video yields
    deterministic pseudo-frames so downstream stages (explode shape, per-frame
    features) are exercised for real.
    """
    schema = StructType(
        [
            StructField("uri", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for uri, b in zip(pdf[uri_col], pdf[binary_col]):
                data = bytes(b) if b is not None else b""
                if not fake:
                    try:  # pragma: no cover - PyAV absent in the container
                        import io

                        import av

                        with av.open(io.BytesIO(data)) as container:
                            for i, frame in enumerate(
                                container.decode(video=0)
                            ):
                                if i % every_n == 0:
                                    rows.append((
                                        str(uri), i,
                                        frame.to_image().tobytes(),
                                    ))
                        continue
                    except ImportError as e:
                        raise NotImplementedError(
                            "video decoding requires PyAV/ffmpeg; pass "
                            "fake=True for the deterministic test decode"
                        ) from e
                # sha256-hex payloads (r10; was raw blake2b): ascii-hex
                # bytes make the downstream image_features(frame) hash
                # DuckDB-recomputable — sha256(sha256(text || '#' || i))
                # — so the whole frame_sample → per-frame features chain
                # is oracle-replayable (staged row q_video_frame_features)
                n_frames = 1 + (len(data) % 5)
                for i in range(n_frames):
                    fh = hashlib.sha256(
                        data + f"#{i}".encode()
                    ).hexdigest().encode()
                    rows.append((str(uri), i * every_n, fh))
            yield pd.DataFrame(rows, columns=["uri", "frame_idx", "frame"])

    return df.select(uri_col, binary_col).mapInPandas(run, schema=schema)


RESIZED_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("media", BinaryType()),
    ]
)


def image_resize(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "media",
    uri_col: str = "uri",
    fake: bool = False,
) -> DataFrame:
    """Resize an image binary column to (width, height) — Arrow-batched
    binary-in/binary-out ``mapInPandas``.

    Real implementation requires PIL (``Image.open(...).resize(...)``);
    with ``fake=True`` the payload is a deterministic function of
    (input bytes, target dims) sized ∝ the target area, so batch shapes,
    binary round-tripping and downstream feature stages are exercised for
    real.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for uri, b in zip(pdf[uri_col], pdf[binary_col]):
                data = bytes(b) if b is not None else b""
                if not fake:
                    try:  # pragma: no cover - PIL absent in the container
                        import io

                        from PIL import Image

                        img = Image.open(io.BytesIO(data))
                        buf = io.BytesIO()
                        img.resize((width, height)).save(
                            buf, format=img.format or "PNG"
                        )
                        out.append((str(uri), width, height, buf.getvalue()))
                        continue
                    except ImportError as e:
                        raise NotImplementedError(
                            "image resizing requires PIL, which is not "
                            "installed in this container; pass fake=True "
                            "for the deterministic test path"
                        ) from e
                # sha256-hex seed (r10, module-wide convention): keeps
                # every fake tier DuckDB-recomputable should a resize
                # row ever stage (image/audio/frame tiers already are)
                seed = hashlib.sha256(
                    data + f"#{width}x{height}".encode()
                ).hexdigest().encode()
                n = max(1, (width * height) // 256)
                payload = (seed * (n // len(seed) + 1))[:n]
                out.append((str(uri), width, height, payload))
            yield pd.DataFrame(
                out, columns=["uri", "width", "height", "media"]
            )

    return df.select(uri_col, binary_col).mapInPandas(run, schema=RESIZED_SCHEMA)


def fetch_media(
    df: DataFrame,
    uri_col: str,
    out_col: str = "media",
) -> DataFrame:
    """Materialize a URI column into binary payloads — the Spark analog of
    the reference's lazy image fetch (``lotus/utils.py:75-120``: local
    paths, ``file://``, ``data:`` base64, ``http(s)://``, ``s3://``).

    ``data:`` URIs and local paths decode with the standard library;
    http(s) needs ``requests`` and s3 needs ``boto3`` — both import-gated
    per executor (absent in this container). Fetching runs inside
    ``mapInPandas``, so reads are distributed and batched per task, never
    driver-side.
    """
    out_schema = StructType(df.schema.fields + [StructField(out_col, BinaryType())])

    def fetch_one(uri) -> bytes | None:
        if uri is None:
            return None
        uri = str(uri)
        if uri.startswith("data:"):
            import base64

            payload = uri.split(",", 1)[1] if "," in uri else ""
            return base64.b64decode(payload)
        if uri.startswith(("http://", "https://")):
            try:
                import requests  # type: ignore
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "http(s) media fetch requires `requests`"
                ) from e
            return requests.get(uri, timeout=30).content  # pragma: no cover
        if uri.startswith("s3://"):
            try:
                import boto3  # type: ignore
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "s3 media fetch requires `boto3`"
                ) from e
            bucket, key = uri[5:].split("/", 1)  # pragma: no cover
            return boto3.client("s3").get_object(  # pragma: no cover
                Bucket=bucket, Key=key)["Body"].read()
        path = uri[7:] if uri.startswith("file://") else uri
        with open(path, "rb") as f:
            return f.read()

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [fetch_one(u) for u in pdf[uri_col]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def attach_media_meta(df: DataFrame, uri_col: str, media_type: str) -> DataFrame:
    """Build the metadata struct from a URI column (format from extension)."""
    fmt = F.lower(F.element_at(F.split(F.col(uri_col), r"\."), -1))
    return df.withColumn(
        "media_meta",
        F.struct(
            F.col(uri_col).alias("uri"),
            F.lit(media_type).alias("media_type"),
            fmt.alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("duration_s", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("rms_energy", StringType()),
        StructField("afingerprint", StringType()),
    ]
)


def audio_features(
    df: DataFrame,
    binary_col: str = "media",
    uri_col: str = "uri",
    fake: bool = False,
) -> DataFrame:
    """Audio binary column → (duration, sample_rate, RMS energy, fingerprint).

    Decode is stubbed (no soundfile/librosa in this container): ``fake=True``
    yields a deterministic pseudo-decode so the Spark plumbing (schema,
    Arrow batching, partitioning) is exercised for real; the real
    implementation drops in at the marked point.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for uri, b in zip(pdf[uri_col], pdf[binary_col]):
                data = bytes(b) if b is not None else b""
                if not fake:
                    try:  # pragma: no cover - soundfile absent in container
                        import io

                        import numpy as np
                        import soundfile as sf

                        wav, sr = sf.read(io.BytesIO(data), dtype="float64")
                        dur = len(wav) / sr if sr else 0.0
                        rms = float(np.sqrt(np.mean(np.square(wav)))) if len(wav) else 0.0
                        fp = hashlib.sha256(
                            np.asarray(wav, dtype=np.float32).tobytes()
                        ).hexdigest()[:16]
                        rows.append((
                            str(uri), f"{dur:.2f}", int(sr),
                            f"{rms:.4f}", fp,
                        ))
                        continue
                    except ImportError as e:
                        raise NotImplementedError(
                            "audio decoding requires soundfile; pass "
                            "fake=True for the deterministic test decode"
                        ) from e
                # sha256 (r10; was blake2b): DuckDB-computable, so the
                # audio plumbing is oracle-replayable like the image
                # tier (staged row q_audio_features)
                h = hashlib.sha256(data).digest()
                rows.append((
                    str(uri),
                    f"{1 + h[0] % 300}.{h[1] % 100:02d}",
                    (8000, 16000, 22050, 44100)[h[2] % 4],
                    f"{h[3] / 255:.4f}",
                    h[:8].hex(),
                ))
            yield pd.DataFrame(
                rows,
                columns=["uri", "duration_s", "sample_rate", "rms_energy",
                         "afingerprint"],
            )

    return df.select(uri_col, binary_col).mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )
