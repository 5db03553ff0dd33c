"""Real stdlib media decoders (PNM images, WAV audio) end to end
through the actor-pool media pipeline."""

import io
import math
import wave

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from web_based_search_engine_ray.pipelines.multimodal import (
    FEATURE_DIM,
    PnmDecoder,
    WavDecoder,
    media_pipeline,
)


def _ppm(w, h, rgb):
    """Binary PPM with constant color + a comment line in the header."""
    body = bytes(rgb) * (w * h)
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + body


def _pgm_gradient(w, h):
    px = (np.arange(w * h) % 256).astype(np.uint8)
    return b"P5 %d %d 255\n" % (w, h) + px.tobytes()


def _wav(freq=440.0, rate=8000, secs=0.25, channels=1):
    n = int(rate * secs)
    t = np.arange(n) / rate
    x = (0.5 * np.sin(2 * math.pi * freq * t) * 32767).astype("<i2")
    if channels == 2:
        x = np.repeat(x, 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(x.tobytes())
    return buf.getvalue()


def test_pnm_decoder_math():
    d = PnmDecoder()
    out = d.decode_batch([_ppm(4, 3, (255, 0, 0)), _pgm_gradient(16, 2)])
    assert out["width"].to_pylist() == [4, 16]
    assert out["height"].to_pylist() == [3, 2]
    assert out["channels"].to_pylist() == [3, 1]
    # red: luma = 0.299*255
    assert abs(out["mean_luma"][0].as_py() - 0.299 * 255) < 1e-9
    # gradient 0..31: mean 15.5
    assert abs(out["mean_luma"][1].as_py() - 15.5) < 1e-9
    f = out["features"][0].as_py()
    assert len(f) == FEATURE_DIM and abs(sum(f) - 1.0) < 1e-6


def test_pnm_decoder_guards():
    d = PnmDecoder()
    with pytest.raises(ValueError, match="not a binary"):
        d.decode_batch([b"JFIF...."])


def test_wav_decoder_math():
    d = WavDecoder()
    out = d.decode_batch([_wav(), _wav(channels=2)])
    assert out["n_channels"].to_pylist() == [1, 2]
    assert out["sample_rate"].to_pylist() == [8000, 8000]
    assert abs(out["duration_s"][0].as_py() - 0.25) < 1e-9
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert abs(out["rms"][0].as_py() - 0.5 / math.sqrt(2)) < 0.01
    assert len(out["features"][0].as_py()) == FEATURE_DIM


def test_media_pipeline_real_decoders(ray_session):
    imgs = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0, 1], type=pa.int64()),
                "payload": pa.array(
                    [_ppm(8, 8, (0, 255, 0)), _pgm_gradient(8, 8)],
                    type=pa.binary(),
                ),
            }
        )
    )
    out = (
        media_pipeline(imgs, decoder="pnm", batch_size=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert "payload" not in out.columns  # heavy bytes dropped
    assert out["width"].tolist() == [8, 8]
    assert abs(out.loc[0, "mean_luma"] - 0.587 * 255) < 1e-9

    wavs = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array([0], type=pa.int64()),
                "payload": pa.array([_wav()], type=pa.binary()),
            }
        )
    )
    wout = media_pipeline(wavs, decoder="wav", batch_size=1).to_pandas()
    assert wout["sample_rate"].tolist() == [8000]


def test_pnmseq_frame_sampling(ray_session):
    """Concatenated-PPM 'video': parse all frames, sample every
    stride-th, per-sampled-frame mean luma features."""
    import numpy as np
    import pyarrow as pa

    from web_based_search_engine_ray.pipelines.multimodal import (
        FEATURE_DIM,
        PnmSeqDecoder,
    )

    w, h = 4, 3
    frames = []
    for f in range(5):
        px = np.full(w * h, f * 10, dtype=np.uint8)
        frames.append(b"P5 %d %d 255\n" % (w, h) + px.tobytes())
    payload = b"".join(frames)
    d = PnmSeqDecoder(stride=2)
    out = d.decode_batch([payload])
    assert out["n_frames"][0].as_py() == 5
    assert out["n_sampled"][0].as_py() == 3  # frames 0, 2, 4
    assert out["width"][0].as_py() == 4
    assert out["mean_luma"][0].as_py() == pytest.approx((0 + 20 + 40) / 3)
    feats = out["features"][0].as_py()
    assert feats[:3] == [0.0, 20.0, 40.0]
    assert len(feats) == FEATURE_DIM
    with pytest.raises(ValueError, match="stride"):
        PnmSeqDecoder(stride=0)
