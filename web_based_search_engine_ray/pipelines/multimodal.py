"""Multimodal column plumbing (binary payloads + typed metadata).

Image/audio/video payloads are opaque ``binary`` columns processed by
actor-pool ``map_batches`` stages.  The decode libraries (PIL,
torchaudio, ffmpeg) are NOT in this container, so the codec layer is a
clearly-marked STUB with two modes:

- ``mode="fake"`` (default): a deterministic md5-seeded fake decoder so
  the Ray-side plumbing — schema, batch sizing, actor state, output
  layout — is real and testable end-to-end;
- ``mode="strict"``: raises ``NotImplementedError`` at decode time,
  which is what production would hit until a real codec is wired into
  ``_decode_real``.

Batch-size guidance baked in: payloads are large, so callers should use
small ``batch_size`` (the bench uses 32) and let blocks stay small via
``DataContext.target_max_block_size`` when payloads are MB-scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16


def _decode_real(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "no image/audio codec available in this environment; "
        "plug PIL/torchaudio here"
    )


def _decode_fake(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic pseudo-decode: md5-seeded 'dimensions' and feature
    vector.  STUB — stands in for a real decoder."""
    d = hashlib.md5(payload).digest()
    w = 64 + d[0]
    h = 64 + d[1]
    rng = np.random.default_rng(int.from_bytes(d[2:10], "big"))
    feat = rng.standard_normal(FEATURE_DIM)
    return w, h, feat / np.linalg.norm(feat)


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload → (width, height, features).

    Real-codec state (model weights, decoder contexts) belongs in
    ``__init__`` — once per actor.  ``payload_col`` names the binary
    column (tests use the corpus ``html`` bytes as a stand-in blob).
    """

    def __init__(self, payload_col: str = "payload", mode: str = "fake"):
        if mode not in ("fake", "strict"):
            raise ValueError(mode)
        self.payload_col = payload_col
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        ws, hs, feats = [], [], []
        for p in payloads:
            if self.mode == "strict":
                _decode_real(p)
            w, h, f = _decode_fake(p)
            ws.append(w)
            hs.append(h)
            feats.append(f.astype(np.float32).tolist())
        cols = {
            name: batch[name]
            for name in batch.column_names
            if name != self.payload_col
        }
        cols["width"] = pa.array(ws, type=pa.int32())
        cols["height"] = pa.array(hs, type=pa.int32())
        cols["features"] = pa.array(feats, type=pa.list_(pa.float32()))
        return pa.table(cols)


def media_pipeline(ds, *, payload_col: str = "payload", batch_size: int = 32,
                   concurrency=(1, 4)):
    """Standard multimodal shape: small batches, actor pool, drop the
    heavy payload column as early as possible (projection before
    shuffle)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
