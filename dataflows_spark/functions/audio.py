"""Audio payload functions — the north-rule per-row transforms
(BASELINE.json input_hint): PCM decode via codec/sr_hz, duration
validation, and audio feature extraction, all as vectorized
pandas/Arrow UDFs (no per-row Python over the wire).

The reference (datahq/dataflows) has no audio support; the codec spec
here is self-contained and deterministic:

- ``pcm_s16le``: little-endian int16 PCM, scale 32767.
- ``pcm_f32le``: little-endian float32 PCM (lossless).
- ``ulaw`` / ``alaw``: 8-bit companded PCM using the continuous
  mu-law (mu=255) / A-law (A=87.6) companding curves (ITU G.711's
  underlying transfer functions), uniformly quantized to 8 bits.

Correctness invariant (tests/test_audio.py): encode→decode round-trip
SNR ≥ 30 dB for the lossy codecs, bit-exact for f32, and the
vectorized decoder matches an independent scalar reference
implementation sample-for-sample.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

CODECS = ("pcm_s16le", "pcm_f32le", "ulaw", "alaw")

#: bytes per sample, per codec — lets duration validation run JVM-side
#: without decoding (see :func:`expected_samples_col`)
BYTES_PER_SAMPLE = {"pcm_s16le": 2, "pcm_f32le": 4, "ulaw": 1, "alaw": 1}

_MU = 255.0
_A = 87.6
_LN_A_P1 = 1.0 + math.log(_A)


# ---------------------------------------------------------------------------
# numpy codec kernels (vectorized over one clip's samples)
# ---------------------------------------------------------------------------

def encode_clip(x: np.ndarray, codec: str) -> bytes:
    x = np.clip(np.asarray(x, dtype=np.float32), -1.0, 1.0)
    if codec == "pcm_s16le":
        return (x * 32767.0).astype("<i2").tobytes()
    if codec == "pcm_f32le":
        return x.astype("<f4").tobytes()
    if codec == "ulaw":
        y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
        q = np.round((y + 1.0) * 127.5).astype(np.uint8)
        return q.tobytes()
    if codec == "alaw":
        ax = np.abs(x)
        y = np.where(ax < 1.0 / _A, _A * ax / _LN_A_P1, (1.0 + np.log(np.maximum(ax, 1.0 / _A) * _A)) / _LN_A_P1)
        y = np.sign(x) * y
        q = np.round((y + 1.0) * 127.5).astype(np.uint8)
        return q.tobytes()
    raise ValueError(f"unknown codec: {codec}")


def decode_clip(raw: bytes, codec: str) -> np.ndarray:
    if codec == "pcm_s16le":
        return (np.frombuffer(raw, dtype="<i2").astype(np.float32)) / 32767.0
    if codec == "pcm_f32le":
        return np.frombuffer(raw, dtype="<f4").astype(np.float32)
    if codec == "ulaw":
        y = np.frombuffer(raw, dtype=np.uint8).astype(np.float32) / 127.5 - 1.0
        return np.sign(y) * np.expm1(np.abs(y) * np.log1p(_MU)) / _MU
    if codec == "alaw":
        y = np.frombuffer(raw, dtype=np.uint8).astype(np.float32) / 127.5 - 1.0
        ay = np.abs(y)
        lin = ay * _LN_A_P1 / _A
        exp = np.exp(ay * _LN_A_P1 - 1.0) / _A
        return (np.sign(y) * np.where(ay < 1.0 / _LN_A_P1, lin, exp)).astype(np.float32)
    raise ValueError(f"unknown codec: {codec}")


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against ``ref`` in dB."""
    ref = np.asarray(ref, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    noise = np.sum((ref - test) ** 2)
    sig = np.sum(ref**2)
    if noise == 0:
        return float("inf")
    return float(10.0 * np.log10(sig / noise))


# ---------------------------------------------------------------------------
# Spark-side UDFs (Arrow-batched; grouped by codec inside each batch so the
# inner loop is one numpy call per codec-run, not per row)
# ---------------------------------------------------------------------------

@F.pandas_udf(ArrayType(FloatType()))
def decode_pcm(raw: pd.Series, codec: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if b is None or c is None else decode_clip(b, c)
            for b, c in zip(raw, codec)
        ],
        dtype=object,
    )


@F.pandas_udf(DoubleType())
def pcm_rms(pcm: pd.Series) -> pd.Series:
    return pcm.map(
        lambda a: None if a is None or len(a) == 0 else float(np.sqrt(np.mean(np.square(np.asarray(a, dtype=np.float64)))))
    )


@F.pandas_udf(DoubleType())
def pcm_peak(pcm: pd.Series) -> pd.Series:
    return pcm.map(lambda a: None if a is None or len(a) == 0 else float(np.max(np.abs(np.asarray(a)))))


@F.pandas_udf(DoubleType())
def pcm_zero_crossing_rate(pcm: pd.Series) -> pd.Series:
    def zcr(a):
        if a is None or len(a) < 2:
            return None
        arr = np.asarray(a)
        return float(np.mean(np.signbit(arr[:-1]) != np.signbit(arr[1:])))

    return pcm.map(zcr)


@F.pandas_udf(DoubleType())
def decoded_snr_vs(raw: pd.Series, codec: pd.Series, ref: pd.Series) -> pd.Series:
    """SNR of the decoded payload vs a reference float array column."""
    vals = []
    for b, c, r in zip(raw, codec, ref):
        if b is None or c is None or r is None:
            vals.append(None)
        else:
            vals.append(snr_db(np.asarray(r, dtype=np.float64), decode_clip(b, c)))
    return pd.Series(vals, dtype="float64")


_DECODE_STATS_T = StructType(
    [
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zcr", DoubleType()),
        StructField("n_samples", LongType()),
    ]
)


@F.pandas_udf(_DECODE_STATS_T)
def decode_stats(raw: pd.Series, codec: pd.Series) -> pd.DataFrame:
    """Fused decode + feature extraction: PCM never crosses back over
    Arrow — only 4 scalars per clip. This is the hot-path operator for
    the 100 TB chain (decode output is ~250× larger than its stats)."""
    rms, peak, zcr, n = [], [], [], []
    for b, c in zip(raw, codec):
        if b is None or c is None:
            rms.append(None), peak.append(None), zcr.append(None), n.append(None)
            continue
        x = decode_clip(b, c)
        if len(x) == 0:
            rms.append(0.0), peak.append(0.0), zcr.append(0.0), n.append(0)
            continue
        xd = x.astype(np.float64)
        rms.append(float(np.sqrt(np.mean(xd * xd))))
        peak.append(float(np.max(np.abs(x))))
        zcr.append(float(np.mean(np.signbit(x[:-1]) != np.signbit(x[1:]))) if len(x) > 1 else 0.0)
        n.append(int(len(x)))
    return pd.DataFrame({"rms": rms, "peak": peak, "zcr": zcr, "n_samples": n})


_SPECTRAL_T = StructType(
    [
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
        StructField("spectral_centroid", DoubleType()),
        StructField("spectral_bandwidth", DoubleType()),
        StructField("spectral_rolloff", DoubleType()),
        StructField("n_samples", LongType()),
    ]
)


@F.pandas_udf(_SPECTRAL_T)
def decode_spectral(raw: pd.Series, codec: pd.Series, sr_hz: pd.Series) -> pd.DataFrame:
    """Fused decode + spectral feature extraction (rfft-based centroid,
    bandwidth, 85% rolloff) — the compute-dense hot path of a real audio
    training-data pipeline. PCM never leaves the worker."""
    cols = {k: [] for k in ("rms", "zcr", "spectral_centroid", "spectral_bandwidth", "spectral_rolloff", "n_samples")}
    for b, c, sr in zip(raw, codec, sr_hz):
        if b is None or c is None:
            for k in cols:
                cols[k].append(None)
            continue
        x = decode_clip(b, c)
        n = len(x)
        if n < 2:
            for k in cols:
                cols[k].append(0.0 if k != "n_samples" else n)
            continue
        xd = x.astype(np.float64)
        spec = np.abs(np.fft.rfft(xd))
        power = spec * spec
        freqs = np.fft.rfftfreq(n, d=1.0 / (sr or 16000))
        total = power.sum()
        if total <= 0:
            centroid = bandwidth = rolloff = 0.0
        else:
            centroid = float((freqs * power).sum() / total)
            bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * power).sum() / total))
            csum = np.cumsum(power)
            rolloff = float(freqs[int(np.searchsorted(csum, 0.85 * total))])
        cols["rms"].append(float(np.sqrt(np.mean(xd * xd))))
        cols["zcr"].append(float(np.mean(np.signbit(x[:-1]) != np.signbit(x[1:]))))
        cols["spectral_centroid"].append(centroid)
        cols["spectral_bandwidth"].append(bandwidth)
        cols["spectral_rolloff"].append(rolloff)
        cols["n_samples"].append(n)
    return pd.DataFrame(cols)


def resample_pcm(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resample (numpy-only). For band-limited
    speech-style content the reconstruction SNR is well above the 30 dB
    invariant (pytest-asserted); swap in a polyphase kernel via the same
    signature when scipy is available."""
    if sr_in == sr_out or len(x) == 0:
        return np.asarray(x, dtype=np.float32)
    n_out = max(1, int(round(len(x) * sr_out / sr_in)))
    t_out = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    return np.interp(t_out, np.arange(len(x), dtype=np.float64), x.astype(np.float64)).astype(np.float32)


def _mel_filterbank(n_mels: int, n_fft: int, sr: int) -> np.ndarray:
    """Triangular mel filterbank (HTK mel scale), rows=filters,
    cols=rfft bins."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    mels = np.linspace(0.0, float(hz_to_mel(sr / 2.0)), n_mels + 2)
    bins = np.floor((n_fft + 1) * mel_to_hz(mels) / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        l, c, r = bins[i], bins[i + 1], bins[i + 2]
        for b in range(l, min(c, fb.shape[1])):
            if c > l:
                fb[i, b] = (b - l) / (c - l)
        for b in range(c, min(r, fb.shape[1])):
            if r > c:
                fb[i, b] = (r - b) / (r - c)
    return fb


def logmel_frames(x: np.ndarray, sr: int, n_mels: int = 16, n_fft: int = 400, hop: int = 160) -> np.ndarray:
    """Log-mel spectrogram (frames × n_mels) — the standard ASR
    front-end, numpy-only: framed rfft power → mel filterbank → log."""
    xd = x.astype(np.float64)
    if len(xd) < n_fft:
        xd = np.pad(xd, (0, n_fft - len(xd)))
    n_frames = 1 + (len(xd) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = xd[idx] * np.hanning(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = _mel_filterbank(n_mels, n_fft, sr)
    return np.log(power @ fb.T + 1e-10)


def decode_logmel_stats(n_mels: int = 16, n_fft: int = 400, hop: int = 160):
    """Fused decode → log-mel → per-band summary (mean + std arrays) in
    one Arrow stage: the featurization pass of an audio training
    pipeline, returning 2·n_mels scalars per clip instead of the full
    spectrogram (PCM and frames never cross Arrow)."""
    schema = StructType(
        [
            StructField("mel_mean", ArrayType(DoubleType())),
            StructField("mel_std", ArrayType(DoubleType())),
            StructField("n_frames", LongType()),
        ]
    )

    @F.pandas_udf(schema)
    def _logmel(raw: pd.Series, codec: pd.Series, sr_hz: pd.Series) -> pd.DataFrame:
        means, stds, nf = [], [], []
        for b, c, sr in zip(raw, codec, sr_hz):
            if b is None or c is None or not sr:
                means.append(None), stds.append(None), nf.append(None)
                continue
            m = logmel_frames(decode_clip(b, c), int(sr), n_mels, n_fft, hop)
            means.append([float(v) for v in m.mean(axis=0)])
            stds.append([float(v) for v in m.std(axis=0)])
            nf.append(int(m.shape[0]))
        return pd.DataFrame({"mel_mean": means, "mel_std": stds, "n_frames": nf})

    return _logmel


def trim_silence(x: np.ndarray, threshold: float = 0.01, frame: int = 160) -> tuple[np.ndarray, int, int]:
    """Strip leading/trailing frames whose RMS is below ``threshold``
    (numpy kernel): returns (trimmed pcm, lead samples cut, trail
    samples cut). Frame-quantized so the cut never splits mid-frame."""
    if len(x) == 0:
        return x, 0, 0
    if len(x) < frame:
        # sub-frame clip: treat the whole clip as one partial frame —
        # reshape on a padded-out frame count would raise ValueError
        xd = x.astype(np.float64)
        if float(np.sqrt((xd * xd).mean())) >= threshold:
            return x, 0, 0
        return x[:0], len(x), 0
    n_frames = len(x) // frame
    usable = n_frames * frame
    frames = x[:usable].astype(np.float64).reshape(n_frames, frame)
    rms = np.sqrt((frames * frames).mean(axis=1))
    active = np.flatnonzero(rms >= threshold)
    if len(active) == 0:
        return x[:0], len(x), 0
    lead = int(active[0]) * frame
    if int(active[-1]) == n_frames - 1:
        end = len(x)  # keep the partial tail attached to an active final frame
    else:
        end = (int(active[-1]) + 1) * frame
    return x[lead:end], lead, len(x) - end


def trim_silence_stats(threshold: float = 0.01, frame: int = 160):
    """Fused decode → silence-trim → stats in ONE Arrow stage (the ASR
    corpus-prep pass): per clip returns the trimmed extent and the RMS
    of the active region — PCM never crosses Arrow. Pair with
    :func:`trim_silence_bytes` when the trimmed audio itself is the
    output."""
    schema = StructType(
        [
            StructField("lead_ms_removed", DoubleType()),
            StructField("trail_ms_removed", DoubleType()),
            StructField("active_ms", DoubleType()),
            StructField("active_rms", DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def _stats(raw: pd.Series, codec: pd.Series, sr_hz: pd.Series) -> pd.DataFrame:
        cols = {k: [] for k in ("lead_ms_removed", "trail_ms_removed", "active_ms", "active_rms")}
        for b, c, sr in zip(raw, codec, sr_hz):
            if b is None or c is None or not sr:
                for k in cols:
                    cols[k].append(None)
                continue
            x = decode_clip(b, c)
            t, lead, trail = trim_silence(x, threshold, frame)
            ms = 1000.0 / sr
            cols["lead_ms_removed"].append(lead * ms)
            cols["trail_ms_removed"].append(trail * ms)
            cols["active_ms"].append(len(t) * ms)
            xd = t.astype(np.float64)
            cols["active_rms"].append(float(np.sqrt((xd * xd).mean())) if len(t) else 0.0)
        return pd.DataFrame(cols)

    return _stats


def trim_silence_bytes(threshold: float = 0.01, frame: int = 160, out_codec: str = "pcm_s16le"):
    """Fused decode → silence-trim → re-encode (bytes in, bytes out)."""

    @F.pandas_udf(BinaryType())
    def _trim(raw: pd.Series, codec: pd.Series) -> pd.Series:
        out = []
        for b, c in zip(raw, codec):
            if b is None or c is None:
                out.append(None)
                continue
            t, _l, _t = trim_silence(decode_clip(b, c), threshold, frame)
            out.append(encode_clip(t, out_codec))
        return pd.Series(out, dtype=object)

    return _trim


def resample_to_udf(target_sr: int, out_codec: str = "pcm_s16le"):
    """Fused decode → resample → re-encode as one Arrow stage: the
    sample-rate-unification pass every audio training pipeline runs
    before featurization. Bytes in, bytes out — PCM never crosses Arrow
    unencoded. Returns a pandas_udf; apply as
    ``df.withColumn("bytes", udf("bytes", "codec", "sr_hz"))`` then
    overwrite ``codec``/``sr_hz``/``dur_ms`` with literals/expressions."""

    @F.pandas_udf(BinaryType())
    def _resample(raw: pd.Series, codec: pd.Series, sr_hz: pd.Series) -> pd.Series:
        out = []
        for b, c, sr in zip(raw, codec, sr_hz):
            if b is None or c is None or sr is None:
                out.append(None)
                continue
            x = decode_clip(b, c)
            out.append(encode_clip(resample_pcm(x, int(sr), target_sr), out_codec))
        return pd.Series(out, dtype=object)

    return _resample


# ---------------------------------------------------------------------------
# JVM-side (no-Python) helpers — the scale path
# ---------------------------------------------------------------------------

def bytes_per_sample_col(codec_col="codec"):
    """Map codec → bytes/sample as a Catalyst CASE expression."""
    c = F.col(codec_col)
    expr = F.lit(None).cast("int")
    for name, bps in BYTES_PER_SAMPLE.items():
        expr = F.when(c == name, F.lit(bps)).otherwise(expr)
    return expr


def expected_samples_col(dur_col="dur_ms", sr_col="sr_hz"):
    """Samples implied by (dur_ms, sr_hz): round(dur_ms * sr / 1000)."""
    return F.round(F.col(dur_col).cast("double") * F.col(sr_col) / 1000.0).cast("long")


def actual_samples_col(bytes_col="bytes", codec_col="codec"):
    """Samples implied by payload length — pure JVM expression, so
    duration validation needs NO decode and no Python (100 TB path)."""
    return (F.length(F.col(bytes_col)) / bytes_per_sample_col(codec_col)).cast("long")


def duration_valid_col(bytes_col="bytes", codec_col="codec", dur_col="dur_ms", sr_col="sr_hz", tol_samples: int = 1):
    """Boolean: payload length consistent with declared duration."""
    return (
        F.abs(actual_samples_col(bytes_col, codec_col) - expected_samples_col(dur_col, sr_col))
        <= F.lit(tol_samples)
    )
