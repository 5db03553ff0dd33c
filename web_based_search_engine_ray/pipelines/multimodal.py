"""Multimodal column plumbing (binary payloads + typed metadata).

Image/audio/video payloads are opaque ``binary`` columns processed by
actor-pool ``map_batches`` stages.  The decode libraries (PIL,
torchaudio, ffmpeg) are NOT in this container, so the codec layer is a
PLUGGABLE DECODER REGISTRY with two built-ins:

- ``"fake"`` (default): a deterministic md5-seeded fake decoder so the
  Ray-side plumbing — schema, batch sizing, actor state, output
  layout — is real and testable end-to-end;
- ``"strict"``: raises ``NotImplementedError`` at decode time, which is
  what production hits until a real codec is registered.

Wiring a real codec needs NO edits to this stage::

    from web_based_search_engine_ray.pipelines import multimodal

    class PilDecoder:
        schema = [("width", pa.int32()), ("height", pa.int32()),
                  ("features", pa.list_(pa.float32()))]
        def __init__(self):
            from PIL import Image      # heavy import once per ACTOR
            self._Image = Image
        def decode_batch(self, payloads):
            ...  # -> {name: pyarrow array} matching self.schema

    multimodal.register_decoder("pil", PilDecoder)
    media_pipeline(ds, decoder="pil")

Batch-size guidance: payloads are large, so size ``batch_size`` by
payload, not row count — ~32 for MB-scale images (the bench uses 32-64
on KB-scale blobs), single digits for video segments — and cap block
size via ``DataContext.target_max_block_size`` so a block × actor-pool
concurrency stays within the worker heap.
"""

from __future__ import annotations

import hashlib
from typing import Callable

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16

#: decoder name -> zero-arg factory returning a decoder instance with
#: ``schema: list[(name, pa.DataType)]`` and
#: ``decode_batch(payloads: list[bytes]) -> dict[str, pa.Array]``
_DECODERS: dict[str, Callable[[], object]] = {}


def register_decoder(name: str, factory: Callable[[], object]) -> None:
    """Register a codec under ``name`` (overwrites).  The factory runs
    once per ACTOR (inside ``MediaFeatureExtractor.__init__``), so
    heavy state — model weights, decoder contexts — belongs in the
    decoder's ``__init__``."""
    _DECODERS[name] = factory


def get_decoder(name: str):
    try:
        return _DECODERS[name]()
    except KeyError:
        raise ValueError(
            f"unknown media decoder {name!r}; registered: "
            f"{sorted(_DECODERS)}"
        ) from None


_MEDIA_SCHEMA = [
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("features", pa.list_(pa.float32())),
]


class FakeDecoder:
    """Deterministic pseudo-decode: md5-seeded 'dimensions' and a unit
    feature vector.  STUB — stands in for a real decoder so the
    pipeline shape is testable without codec libraries."""

    schema = _MEDIA_SCHEMA

    def decode_batch(self, payloads: list[bytes]) -> dict[str, pa.Array]:
        ws, hs, feats = [], [], []
        for p in payloads:
            d = hashlib.md5(p).digest()
            ws.append(64 + d[0])
            hs.append(64 + d[1])
            rng = np.random.default_rng(int.from_bytes(d[2:10], "big"))
            f = rng.standard_normal(FEATURE_DIM)
            feats.append((f / np.linalg.norm(f)).astype(np.float32).tolist())
        return {
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "features": pa.array(feats, type=pa.list_(pa.float32())),
        }


class StrictDecoder:
    """Honest production boundary: no codec library is present in this
    environment, so decoding raises instead of faking."""

    schema = _MEDIA_SCHEMA

    def decode_batch(self, payloads: list[bytes]) -> dict[str, pa.Array]:
        raise NotImplementedError(
            "no image/audio codec available in this environment; "
            "register_decoder() a PIL/torchaudio-backed decoder"
        )


register_decoder("fake", FakeDecoder)
register_decoder("strict", StrictDecoder)


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload → the decoder's typed columns.

    ``decoder`` is a registry name (or a zero-arg factory); it is
    instantiated ONCE per actor in ``__init__`` — real-codec state
    (model weights, decoder contexts) loads here, not per batch.
    ``payload_col`` names the binary column (tests use the corpus
    ``html`` bytes as a stand-in blob); it is DROPPED from the output
    so the heavy bytes don't travel further down the pipeline.

    ``mode=`` is accepted as a backward-compatible alias for
    ``decoder=`` ("fake"/"strict")."""

    def __init__(self, payload_col: str = "payload",
                 decoder: str | Callable[[], object] = "fake",
                 mode: str | None = None):
        if mode is not None:
            decoder = mode
        self.payload_col = payload_col
        self.decoder = (
            get_decoder(decoder) if isinstance(decoder, str) else decoder()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        decoded = self.decoder.decode_batch(payloads)
        cols = {
            name: batch[name]
            for name in batch.column_names
            if name != self.payload_col
        }
        for name, typ in self.decoder.schema:
            cols[name] = decoded[name].cast(typ)
        return pa.table(cols)


def media_pipeline(ds, *, payload_col: str = "payload", batch_size: int = 32,
                   concurrency=(1, 4), decoder: str = "fake"):
    """Standard multimodal shape: small batches, actor pool, drop the
    heavy payload column as early as possible (projection before
    shuffle).

    A ``decoder`` NAME is resolved to its factory HERE, on the driver:
    the registry is a driver-process module global, so a name
    registered via :func:`register_decoder` at runtime would not exist
    inside fresh actor processes (only the built-ins re-register on
    import).  Shipping the factory itself (cloudpickled into the actor
    constructor) makes the documented register-then-run flow work in
    any distributed run; unknown names also fail fast on the driver."""
    if isinstance(decoder, str):
        try:
            factory = _DECODERS[decoder]
        except KeyError:
            raise ValueError(
                f"unknown media decoder {decoder!r}; registered: "
                f"{sorted(_DECODERS)}"
            ) from None
    else:
        factory = decoder
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={
            "payload_col": payload_col, "decoder": factory,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
