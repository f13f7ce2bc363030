"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride the pipeline as ``binary`` columns with a
``media_type`` string and per-type metadata — exactly how a 100 TB
training-data pipeline treats media: never decode in the shuffle path,
decode late inside bounded actor-pool stages with SMALL batch sizes
(payload bytes × batch_size × concurrency must fit the worker heap).

The codec libraries (PIL / soundfile) are auto-detected at import:
``decoder="auto"`` uses the real decode when the library imported and
the deterministic stub otherwise; ``decoder="real"`` insists (and
raises ``NotImplementedError`` with a clear message when the library is
absent — the case in this container); ``decoder="fake"`` is a
*deterministic* pseudo-decode derived from the payload bytes so every
downstream stage (resize, feature extraction, frame sampling — real
numpy code) is exercised end-to-end. The Ray-side plumbing — schema,
actor signature, batch sizing, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

try:  # pragma: no cover - not present in this container
    import soundfile  # noqa: F401

    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False


def _resolve_decoder(decoder: str, have_real: bool, needs: str) -> str:
    """'auto' -> 'real' when the codec lib imported, else 'fake';
    explicit 'real' without the lib raises the documented guard."""
    if decoder == "auto":
        return "real" if have_real else "fake"
    if decoder == "real" and not have_real:
        raise NotImplementedError(
            f"real decode needs {needs}, which is not in this "
            f"environment; use decoder='fake' (deterministic stub) or "
            f"decoder='auto'")
    if decoder not in ("real", "fake"):
        raise ValueError(f"bad decoder: {decoder}")
    return decoder


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic pseudo-decode: payload bytes -> (h, w, 3) uint8.

    NOT a real image decode — a seeded PRNG expansion of the payload
    digest, stable across runs/nodes, used to exercise the pipeline."""
    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class ImageDecodeStage:
    """Actor: (media_id, payload, width, height) -> decoded pixel column.

    Output appends ``pixels`` as flat uint8 list + (height, width) kept.
    Use small ``batch_size`` (default 32) — decoded frames are ~W*H*3
    bytes each and must fit heap × concurrency.
    """

    def __init__(self, decoder: str = "fake"):
        self.decoder = _resolve_decoder(decoder, _HAVE_PIL,
                                        "PIL/pillow")

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels: list[np.ndarray] = []
        hs, ws = [], []
        for payload, h, w in zip(batch["payload"].to_pylist(),
                                 batch["height"].to_pylist(),
                                 batch["width"].to_pylist()):
            if self.decoder == "real":  # pragma: no cover - needs PIL
                import io

                from PIL import Image as _Img

                img = np.asarray(
                    _Img.open(io.BytesIO(payload)).convert("RGB"),
                    dtype=np.uint8)
                h, w = img.shape[0], img.shape[1]
                pixels.append(img.reshape(-1))
            else:
                pixels.append(_fake_pixels(payload, h, w).reshape(-1))
            hs.append(h)
            ws.append(w)
        offsets = np.zeros(len(pixels) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in pixels], out=offsets[1:])
        values = (np.concatenate(pixels) if pixels
                  else np.empty(0, dtype=np.uint8))
        return pa.table({
            "media_id": batch["media_id"],
            "height": pa.array(hs, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "pixels": pa.LargeListArray.from_arrays(
                pa.array(offsets), pa.array(values)),
        })


def decode_images(media: ray.data.Dataset, decoder: str = "fake",
                  batch_size: int = 32,
                  concurrency: int = 4) -> ray.data.Dataset:
    return media.map_batches(
        ImageDecodeStage, fn_constructor_args=(decoder,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


def resize_images(decoded: ray.data.Dataset, out_h: int, out_w: int,
                  batch_size: int = 32) -> ray.data.Dataset:
    """Real nearest-neighbor resize over the decoded pixel column."""

    def resize(batch: pa.Table) -> pa.Table:
        out: list[np.ndarray] = []
        for px, h, w in zip(batch["pixels"].to_pylist(),
                            batch["height"].to_pylist(),
                            batch["width"].to_pylist()):
            img = np.asarray(px, dtype=np.uint8).reshape(h, w, 3)
            ri = (np.arange(out_h) * h // out_h)
            ci = (np.arange(out_w) * w // out_w)
            out.append(img[ri][:, ci].reshape(-1))
        offsets = np.zeros(len(out) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in out], out=offsets[1:])
        values = (np.concatenate(out) if out
                  else np.empty(0, dtype=np.uint8))
        return pa.table({
            "media_id": batch["media_id"],
            "height": pa.array([out_h] * batch.num_rows, pa.int64()),
            "width": pa.array([out_w] * batch.num_rows, pa.int64()),
            "pixels": pa.LargeListArray.from_arrays(
                pa.array(offsets), pa.array(values)),
        })

    return decoded.map_batches(resize, batch_format="pyarrow",
                               batch_size=batch_size)


def image_features(decoded: ray.data.Dataset,
                   batch_size: int = 32) -> ray.data.Dataset:
    """Per-image channel means/stds (real vectorized feature extraction)."""

    def feats(batch: pa.Table) -> pa.Table:
        means, stds = [], []
        for px in batch["pixels"].to_pylist():
            img = np.asarray(px, dtype=np.float64).reshape(-1, 3)
            means.append(img.mean(axis=0))
            stds.append(img.std(axis=0))
        m = np.array(means) if means else np.zeros((0, 3))
        s = np.array(stds) if stds else np.zeros((0, 3))
        return pa.table({
            "media_id": batch["media_id"],
            "mean_r": pa.array(m[:, 0]), "mean_g": pa.array(m[:, 1]),
            "mean_b": pa.array(m[:, 2]),
            "std_r": pa.array(s[:, 0]), "std_g": pa.array(s[:, 1]),
            "std_b": pa.array(s[:, 2]),
        })

    return decoded.map_batches(feats, batch_format="pyarrow",
                               batch_size=batch_size)


def sample_frames(media: ray.data.Dataset, every_n: int = 10,
                  frame_bytes: int = 1024,
                  batch_size: int = 8) -> ray.data.Dataset:
    """Video frame sampling (flat-map): payload -> every Nth fixed-size
    chunk as a pseudo-frame row (real codec would emit decoded frames).
    One row in -> many rows out; batch_size stays small because each
    input row fans out payload-proportionally."""

    def sample(batch: pa.Table) -> pa.Table:
        mids, fidx, frames = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            n_frames = max(len(payload) // frame_bytes, 1)
            for f in range(0, n_frames, every_n):
                mids.append(mid)
                fidx.append(f)
                frames.append(payload[f * frame_bytes:
                                      (f + 1) * frame_bytes])
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_index": pa.array(fidx, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
        })

    return media.map_batches(sample, batch_format="pyarrow",
                             batch_size=batch_size)


# ---------------------------------------------------------------------------
# audio: stubbed decode -> REAL vectorized feature extraction
# ---------------------------------------------------------------------------

def _fake_pcm(payload: bytes, n_samples: int) -> np.ndarray:
    """Deterministic pseudo-decode: payload bytes -> float32 PCM in
    [-1, 1]. Same contract as ``_fake_pixels`` — a seeded expansion of
    the payload digest, stable across runs/nodes."""
    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return (rng.random(n_samples, dtype=np.float32) * 2.0 - 1.0)


class AudioDecodeStage:
    """Actor: (media_id, payload, sample_rate, n_samples) -> PCM column.

    Small batches — decoded PCM is 4 B/sample; batch_size x concurrency
    x clip length must fit the worker heap. ``decoder="real"`` needs a
    codec library (soundfile/libav) absent from this container and
    raises clearly; the fake decode keeps every downstream stage real.
    """

    def __init__(self, decoder: str = "fake"):
        self.decoder = _resolve_decoder(decoder, _HAVE_SOUNDFILE,
                                        "soundfile/libav")

    def __call__(self, batch: pa.Table) -> pa.Table:
        clips: list[np.ndarray] = []
        rates: list[int] = []
        for payload, n, sr in zip(batch["payload"].to_pylist(),
                                  batch["n_samples"].to_pylist(),
                                  batch["sample_rate"].to_pylist()):
            if self.decoder == "real":  # pragma: no cover - needs lib
                import io

                import soundfile as _sf

                data, sr = _sf.read(io.BytesIO(payload),
                                    dtype="float32")
                if data.ndim > 1:  # mono mixdown
                    data = data.mean(axis=1, dtype=np.float32)
                clips.append(np.asarray(data, dtype=np.float32))
            else:
                clips.append(_fake_pcm(payload, int(n)))
            rates.append(int(sr))
        offsets = np.zeros(len(clips) + 1, dtype=np.int64)
        np.cumsum([len(c) for c in clips], out=offsets[1:])
        values = (np.concatenate(clips) if clips
                  else np.empty(0, dtype=np.float32))
        return pa.table({
            "media_id": batch["media_id"],
            "sample_rate": pa.array(rates, pa.int64()),
            "pcm": pa.LargeListArray.from_arrays(
                pa.array(offsets), pa.array(values)),
        })


def decode_audio(media: ray.data.Dataset, decoder: str = "fake",
                 batch_size: int = 16,
                 concurrency: int = 4) -> ray.data.Dataset:
    return media.map_batches(
        AudioDecodeStage, fn_constructor_args=(decoder,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


def audio_features(decoded: ray.data.Dataset,
                   batch_size: int = 16) -> ray.data.Dataset:
    """REAL per-clip features over the PCM column (vectorized numpy):
    duration_sec, rms, zero-crossing rate, spectral centroid (rfft).
    The decode is the only stubbed step — this math runs unchanged on
    real PCM."""

    def feats(batch: pa.Table) -> pa.Table:
        col = batch["pcm"].combine_chunks()
        offsets = np.asarray(col.offsets, dtype=np.int64)
        values = np.asarray(col.values.to_numpy(zero_copy_only=False),
                            dtype=np.float32)
        sr = np.asarray(batch["sample_rate"].to_numpy(
            zero_copy_only=False), dtype=np.int64)
        dur, rms, zcr, cent = [], [], [], []
        for i in range(batch.num_rows):
            x = values[offsets[i]:offsets[i + 1]]
            n = len(x)
            dur.append(n / max(int(sr[i]), 1))
            rms.append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
            zcr.append(float(np.mean(np.signbit(x[1:]) !=
                                     np.signbit(x[:-1]))) if n > 1
                       else 0.0)
            if n:
                spec = np.abs(np.fft.rfft(x.astype(np.float64)))
                freqs = np.fft.rfftfreq(n, d=1.0 / max(int(sr[i]), 1))
                tot = spec.sum()
                cent.append(float((spec * freqs).sum() / tot)
                            if tot > 0 else 0.0)
            else:
                cent.append(0.0)
        return pa.table({
            "media_id": batch["media_id"],
            "duration_sec": pa.array(dur, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
            "zcr": pa.array(zcr, pa.float64()),
            "spectral_centroid": pa.array(cent, pa.float64()),
        })

    return decoded.map_batches(feats, batch_format="pyarrow",
                               batch_size=batch_size)
