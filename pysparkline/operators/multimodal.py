"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (image/audio libraries are not available in
this environment — see ``decode_image``); everything around it — schema,
batching, partition sizing, UDF signatures — is real and tested. Swapping the
stub for Pillow/torchaudio/ffmpeg is a one-function change.

Scale notes: binary payloads ride in Parquet as BYTE_ARRAY; keep
``spark.sql.files.maxPartitionBytes`` low enough that a batch of decoded
frames fits executor memory (decoded size >> encoded size — budget ~10x).
``mapInPandas`` streams record batches, so peak memory is one Arrow batch of
binaries + its decoded output, not the whole partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


DECODE_AVAILABLE = False  # flips when a real decoder is wired in


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake decode.

    Real implementation would be ``PIL.Image.open(io.BytesIO(payload))``;
    that library is not in this container. The fake is deterministic in the
    payload bytes so tests are stable: a 4x4 'image' whose pixels derive from
    a rolling hash of the payload.
    """
    if DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire in PIL/torchvision here")
    h = 2166136261
    vals = []
    data = payload or b"\x00"
    for i in range(48):  # 4*4*3
        h = (h ^ data[i % len(data)]) * 16777619 & 0xFFFFFFFF
        vals.append(h % 256)
    return np.array(vals, dtype=np.uint8).reshape(4, 4, 3)


IMAGE_FEATURES_SCHEMA = (
    "id long, width int, height int, channels int, "
    "mean_r double, mean_g double, mean_b double, payload_bytes long"
)


def image_features(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas`` (Arrow batches).

    Output schema is fixed and engine-friendly (flat doubles/ints) so the
    result joins back into relational pipelines with no special handling.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[binary_col]):
                img = decode_image(bytes(payload) if payload is not None else b"")
                rows.append(
                    {
                        "id": _id,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "channels": img.shape[2],
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                        "payload_bytes": int(len(payload) if payload is not None else 0),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample(
    df: DataFrame, id_col: str, binary_col: str, every_n: int = 10
) -> DataFrame:
    """Video frame-sampling plumbing: emits (id, frame_idx, frame_binary) rows.
    Decode stubbed the same way; the row-explosion shape (1 video -> k frames)
    and schema are the real contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload) if payload is not None else b""
                n_frames = max(1, len(data) // 64)  # fake: 64 bytes per "frame"
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "id": _id,
                            "frame_idx": idx,
                            "frame_binary": data[idx * 64 : (idx + 1) * 64],
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(
        batches, schema="id long, frame_idx int, frame_binary binary"
    )


def resize_images(
    df: DataFrame, id_col: str, binary_col: str, width: int = 2, height: int = 2
) -> DataFrame:
    """Resize plumbing: decode (stub) -> nearest-neighbor downsample ->
    re-emit raw RGB bytes + dims. The batch shape and output schema are the
    production contract; only decode_image is fake."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[binary_col]):
                img = decode_image(bytes(payload) if payload is not None else b"")
                ys = np.linspace(0, img.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, width).astype(int)
                small = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "id": _id,
                        "width": width,
                        "height": height,
                        "rgb": small.tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(
        batches, schema="id long, width int, height int, rgb binary"
    )


def audio_features(
    df: DataFrame, id_col: str, binary_col: str, n_bands: int = 4
) -> DataFrame:
    """Audio feature plumbing: (id, duration_s, rms, band_0..band_{n-1}).

    STUB decode (torchaudio/librosa not in this container): treats the payload
    as 8-bit PCM at a fake 8 kHz — deterministic in the bytes. The schema and
    Arrow batching are the production contract."""

    cols = ", ".join(f"band_{i} double" for i in range(n_bands))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[binary_col]):
                data = np.frombuffer(
                    bytes(payload) if payload else b"\x80", dtype=np.uint8
                ).astype(np.float64)
                sig = (data - 128.0) / 128.0
                row = {
                    "id": _id,
                    "duration_s": float(len(sig) / 8000.0),
                    "rms": float(np.sqrt((sig**2).mean())),
                }
                chunks = np.array_split(sig, n_bands)
                for i, ch in enumerate(chunks):
                    row[f"band_{i}"] = float(np.abs(ch).mean()) if len(ch) else 0.0
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(
        batches, schema=f"id long, duration_s double, rms double, {cols}"
    )
