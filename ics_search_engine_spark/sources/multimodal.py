"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed through Arrow-batched mapInPandas.

The decode step itself is STUBBED (image/audio libraries are not in
this container — see ``DecodeUnavailable`` / deterministic fake), but
everything Spark-side is real and tested: schemas, batch shapes,
UDF signatures, partitioning.

Schema convention:
    media: (media_id string, kind string in {image,audio,video},
            payload binary, meta map<string,string>)

Operators:
* decode_features  — payload → fixed-width float feature vector
* resize_stub      — image payload → resized payload (+ updated meta)
* frame_sample     — video payload → one row per sampled frame

Swap ``_decode_real`` with a PIL/ffmpeg implementation to go live; the
deterministic fake derives features from md5(payload) so tests are
reproducible and the full pipeline (including downstream ANN over the
feature vectors) runs end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 16


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-decode hook: media libraries absent."""


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    raise DecodeUnavailable(
        "real image/audio decode requires PIL/torchvision/ffmpeg — "
        "not available in this environment; use fake=True"
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake feature extractor: md5(payload) expanded to
    FEATURE_DIM floats in [-1, 1)."""
    h = hashlib.md5(payload).digest()
    seeds = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
    reps = int(np.ceil(FEATURE_DIM / len(seeds)))
    return (np.tile(seeds, reps)[:FEATURE_DIM] / 128.0) - 1.0


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, kind, features array<double>) via mapInPandas —
    payload bytes never round-trip through Python rows; Arrow batches
    carry them and the loop is per-batch numpy."""
    decode = _decode_fake if fake else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                decode(b"" if p is None else bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id string, kind string, features array<double>"
    )


def resize_stub(
    media: DataFrame, width: int = 32, height: int = 24, fake: bool = True
) -> DataFrame:
    """Image payload → "resized" payload with updated meta — the 1→1
    payload-transform shape (batch in, same-length batch out, bytes
    stay in Arrow).  The fake resize deterministically downsamples the
    byte stream to width*height bytes (repeating if short); a real
    implementation swaps the inner function for PIL's
    ``Image.resize``.  Non-image rows pass through untouched."""

    target = width * height

    def _fake_resize(payload: bytes) -> bytes:
        if not payload:
            return bytes(target)
        arr = np.frombuffer(payload, dtype=np.uint8)
        idx = (np.arange(target) * len(arr)) // target
        return bytes(arr[idx % len(arr)].tobytes())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads, metas = [], []
            for kind, payload, meta in zip(
                pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "image":
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                if not fake:
                    raise DecodeUnavailable(
                        "real image resize requires PIL — use fake=True"
                    )
                payloads.append(
                    _fake_resize(b"" if payload is None else bytes(payload))
                )
                m = dict(meta) if meta is not None else {}
                m["w"], m["h"] = str(width), str(height)
                metas.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(
        run,
        schema=(
            "media_id string, kind string, payload binary, "
            "meta map<string,string>"
        ),
    )


def frame_sample(media: DataFrame, every_n: int = 2, fake: bool = True
                 ) -> DataFrame:
    """Video → one row per sampled frame (frame payloads faked as
    sliced bytes).  Demonstrates the 1→N mapInPandas expansion shape
    (batch in, longer batch out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, frames = [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                payload = bytes(payload)
                n_frames = max(len(payload) // 8, 1)
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    fnos.append(fno)
                    frames.append(payload[fno * 8 : (fno + 1) * 8])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": fnos, "frame_payload": frames}
            )

    return media.mapInPandas(
        run,
        schema="media_id string, frame_no int, frame_payload binary",
    )


def synthetic_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/demo."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randint(0, 256, size=64 + (i % 5) * 16, dtype=np.uint8))
        rows.append((f"m{i:05d}", kind, payload, {"w": str(64 + i), "h": "48"}))
    return spark.createDataFrame(
        rows, "media_id string, kind string, payload binary, meta map<string,string>"
    )
