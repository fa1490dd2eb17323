"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media payloads ride as ``binary`` columns (or as ``media_ref`` blob
keys in the span table, rayhist.model). The decode/feature kernels
need codec libraries that are NOT in this container, so the kernels
are STUBBED behind ``RAYHIST_FAKE_DECODE`` (deterministic fake) /
``NotImplementedError`` — but the Ray-side plumbing is real and
tested: schema, actor signature, batch sizing, output layout.

Scale notes: media batches are sized by BYTES not rows — a stage
holding decoded frames must keep ``batch_size`` small (rows) and rely
on the object store for the encoded payloads; the actor pool amortizes
codec initialization.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synth_media_table(refs: list[str], kind: str = "image") -> pa.Table:
    """Deterministic fake media rows for plumbing tests: payload is a
    seeded byte blob derived from the ref."""
    payloads, widths, heights = [], [], []
    for r in refs:
        seed = hashlib.md5(r.encode()).digest()
        payloads.append(seed * 8)  # 128 opaque bytes
        widths.append(16 + seed[0] % 64)
        heights.append(16 + seed[1] % 64)
    return pa.table(
        {
            "media_ref": pa.array(refs),
            "kind": pa.array([kind] * len(refs)),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "duration_ms": pa.array([0] * len(refs), type=pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaDecodeStage:
    """Actor-pool stage: decode payload -> fixed-dim feature vector.

    A real deployment loads the codec/model once here (``__init__``);
    the sandbox has no codec libraries, so with RAYHIST_FAKE_DECODE=1
    (default in tests) the "decode" is a deterministic byte-hash
    feature — same signature, same output schema, same batch shape.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.dim = feature_dim
        self.fake = os.environ.get("RAYHIST_FAKE_DECODE", "1") == "1"
        if not self.fake:  # pragma: no cover
            raise NotImplementedError(
                "real media decode needs PIL/ffmpeg which are not in this container; "
                "set RAYHIST_FAKE_DECODE=1 for the deterministic fake"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            h = hashlib.sha256(payload).digest()
            feats.append(np.frombuffer(h[: self.dim * 2], dtype=np.uint16).astype(np.float32) / 65535.0)
        out = batch.select(["media_ref", "kind", "width", "height"])
        return out.append_column(
            "feature", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32()))
        )


def decode_media(ds: ray.data.Dataset, concurrency=(1, 4), batch_size: int = 256) -> ray.data.Dataset:
    """The media feature-extraction pipeline stage: small batches
    (payloads are wide), actor pool for codec state."""
    return ds.map_batches(
        MediaDecodeStage, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
