"""Multimodal (image/audio/video) column plumbing for the lake.

Beyond-parity extension: a 100 TB training-data pipeline carries media
as opaque ``binary`` columns plus typed metadata, and runs decode /
feature-extract / resize / frame-sample as Arrow-batched Python
stages. The Spark-side plumbing here — schemas, ``mapInPandas``
pipelines, batch shapes, partition sizing — is real and tested; the
actual codec call is stubbed behind :func:`register_decoder` because
this container ships no image/audio libraries (a deterministic fake
decoder backs the tests).

Design rules for the hot path:

- media bytes stay in one ``binary`` column; metadata (width, height,
  sample rate, …) lives in plain typed columns so Catalyst can filter
  and prune WITHOUT touching the payload (e.g. ``WHERE width >= 64``
  never deserializes bytes);
- every Python crossing is ``mapInPandas`` over Arrow batches —
  payload bytes move zero-copy, and one batch holds many rows so
  per-row Python overhead amortizes;
- CPU-heavy decode stages fan out first (see catalog.fan_out): the
  cost model is compute-per-row ≫ shuffle-per-row.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema contract for a media table (one row per asset).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),  # opaque payload
        StructField("format", StringType(), True),  # png, wav, mp4, ...
        StructField("width", IntegerType(), True),  # images/video
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),  # video
        StructField("sample_rate", IntegerType(), True),  # audio
    ]
)

#: Output schema of the feature-extraction stage.
FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, feature array<double>"
)

#: Output schema of the frame-sampling stage (one row per kept frame).
FRAME_SCHEMA = "media_id long, frame_index int, frame_bytes binary"

Decoder = Callable[[bytes, str], np.ndarray]

_DECODERS: dict[str, Decoder] = {}


def register_decoder(kind: str, fn: Decoder) -> None:
    """Register the real codec for ``kind`` (image/audio/video).

    In production this wraps Pillow / soundfile / pyav. The container
    has none of them, so tests register :func:`fake_decoder` and the
    default raises — loudly, not silently — when no decoder exists.
    """
    _DECODERS[kind] = fn


def fake_decoder(payload: bytes, fmt: str) -> np.ndarray:
    """Deterministic stand-in codec: bytes → tiny float array.

    Derives a fixed-length pseudo-signal from the payload bytes so
    tests get stable, content-dependent output with real batch shapes.
    """
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (arr.astype(np.float64) - 128.0) / 128.0


def _decoder_for(kind: str) -> Decoder:
    if kind not in _DECODERS:
        raise NotImplementedError(
            f"no decoder registered for kind={kind!r}; call "
            "register_decoder() with a real codec (Pillow/soundfile/pyav) "
            "or multimodal.fake_decoder for tests"
        )
    return _DECODERS[kind]


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + featurize every asset: Arrow-batched ``mapInPandas``.

    The iterator-of-batches signature keeps memory bounded: one Arrow
    batch of payloads lives in Python at a time, whatever the
    partition size. Output is (media_id, kind, n_bytes, feature).
    """
    decoders = dict(_DECODERS)  # captured in the closure → shipped to workers

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind, fmt in zip(
                pdf["content"], pdf["kind"], pdf["format"]
            ):
                if kind not in decoders:
                    raise NotImplementedError(
                        f"no decoder registered for kind={kind!r}"
                    )
                feats.append(
                    decoders[kind](payload or b"", fmt).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    cols = ["media_id", "kind", "content", "format"]
    return df.select(*cols).mapInPandas(fn, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sample video assets: one output row per kept frame.

    The row-explosion happens inside the Arrow batch (cheap) rather
    than via a JVM explode of pre-materialized frames (which would
    ship every frame through the shuffle). Frame decode is stubbed:
    the payload is sliced deterministically per frame index.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["content"], pdf["n_frames"]
            ):
                n = int(n_frames) if pd.notna(n_frames) else 0
                payload = payload or b""
                for i in range(0, n, every_nth):
                    ids.append(mid)
                    idxs.append(i)
                    # stub "frame decode": deterministic byte slice
                    frames.append(payload[i % max(len(payload), 1):][:16])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_bytes": frames}
            )

    cols = ["media_id", "content", "n_frames"]
    return (
        df.filter(F.col("kind") == "video")
        .select(*cols)
        .mapInPandas(fn, schema=FRAME_SCHEMA)
    )


def resize_metadata(df: DataFrame, max_side: int) -> DataFrame:
    """Compute post-resize dimensions JVM-side — no payload touch.

    Aspect-preserving clamp of (width, height) to ``max_side``. This
    is the planning half of a resize: the byte-level resample joins in
    only when a real codec is registered. Pure column expressions, so
    it runs in codegen and the binary column is never deserialized.
    """
    w, h = F.col("width"), F.col("height")
    scale = F.when(
        F.greatest(w, h) > max_side,
        max_side / F.greatest(w, h).cast("double"),
    ).otherwise(F.lit(1.0))
    return df.withColumns(
        {
            "resized_width": F.floor(w * scale).cast("int"),
            "resized_height": F.floor(h * scale).cast("int"),
        }
    )
