"""Audio codec + clips-table tests: the BASELINE.json input_hint
invariant (decoded-PCM SNR ≥ 30 dB, transcript equality) plus an
independent scalar reference decoder cross-check."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataflows_spark.functions import audio
from dataflows_spark.sources.clips import clips_df


def _signal(n=4000, sr=16000):
    rng = np.random.Generator(np.random.Philox(key=[7, 1]))
    t = np.arange(n) / sr
    x = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1330 * t)
    return np.clip(x + 0.02 * rng.standard_normal(n), -0.999, 0.999).astype(np.float32)


# -- independent scalar reference decoders (pure Python, per sample) --------

def _ref_decode(raw: bytes, codec: str):
    import struct

    if codec == "pcm_s16le":
        vals = struct.unpack(f"<{len(raw)//2}h", raw)
        return [v / 32767.0 for v in vals]
    if codec == "pcm_f32le":
        return list(struct.unpack(f"<{len(raw)//4}f", raw))
    if codec == "ulaw":
        out = []
        for b in raw:
            y = b / 127.5 - 1.0
            s = 1.0 if y >= 0 else -1.0
            out.append(s * (math.expm1(abs(y) * math.log1p(255.0))) / 255.0)
        return out
    if codec == "alaw":
        A = 87.6
        lnap1 = 1.0 + math.log(A)
        out = []
        for b in raw:
            y = b / 127.5 - 1.0
            s = 1.0 if y >= 0 else -1.0
            ay = abs(y)
            if ay < 1.0 / lnap1:
                out.append(s * ay * lnap1 / A)
            else:
                out.append(s * math.exp(ay * lnap1 - 1.0) / A)
        return out
    raise ValueError(codec)


@pytest.mark.parametrize("codec,min_snr", [
    ("pcm_s16le", 80.0),
    ("pcm_f32le", 200.0),  # lossless (inf); guard with big number
    ("ulaw", 30.0),
    ("alaw", 30.0),
])
def test_roundtrip_snr(codec, min_snr):
    x = _signal()
    raw = audio.encode_clip(x, codec)
    y = audio.decode_clip(raw, codec)
    assert len(y) == len(x)
    s = audio.snr_db(x, y)
    assert s >= min_snr, f"{codec}: SNR {s:.1f} dB < {min_snr}"


@pytest.mark.parametrize("codec", audio.CODECS)
def test_vectorized_decode_matches_scalar_reference(codec):
    x = _signal(n=500)
    raw = audio.encode_clip(x, codec)
    fast = audio.decode_clip(raw, codec)
    ref = np.array(_ref_decode(raw, codec), dtype=np.float64)
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-6)


def test_clips_table_schema_and_determinism(spark):
    df1 = clips_df(spark, 50, seed=42, dur_min=200, dur_max=1000, partitions=4)
    df2 = clips_df(spark, 50, seed=42, dur_min=200, dur_max=1000, partitions=2)
    rows1 = {r["clip_id"]: r for r in df1.collect()}
    rows2 = {r["clip_id"]: r for r in df2.collect()}
    assert set(rows1) == set(rows2) and len(rows1) == 50
    # identical bytes regardless of partitioning
    for cid in rows1:
        assert rows1[cid]["bytes"] == rows2[cid]["bytes"]
        assert rows1[cid]["transcript"] == rows2[cid]["transcript"]
    # codec skew: majority pcm_s16le
    codecs = [r["codec"] for r in rows1.values()]
    assert codecs.count("pcm_s16le") >= 0.6 * len(codecs)


def test_duration_validation_jvm_side(spark):
    df = clips_df(spark, 200, seed=42, dur_min=200, dur_max=1000, partitions=4)
    flagged = df.withColumn("ok", audio.duration_valid_col())
    bad = flagged.filter(~F.col("ok")).count()
    total = flagged.count()
    # ~1% corrupted by construction
    assert 0 < bad < 0.05 * total
    # the validation plan must contain no Python evaluation
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan.split("mapInPandas")[0]


def test_decode_pcm_udf_and_snr(spark):
    df = clips_df(spark, 30, seed=42, dur_min=200, dur_max=800, partitions=2)
    out = (
        df.withColumn("pcm", audio.decode_pcm("bytes", "codec"))
        .withColumn("rms", audio.pcm_rms("pcm"))
        .withColumn("n", F.size("pcm"))
        .select("clip_id", "codec", "dur_ms", "sr_hz", "n", "rms")
        .collect()
    )
    assert len(out) == 30
    for r in out:
        assert r["rms"] is not None and 0.05 < r["rms"] < 1.0
        assert r["n"] > 0


def test_resample_snr_invariant(spark):
    """Fused decode→resample→re-encode keeps the decoded-PCM SNR ≥30 dB
    invariant (north rule) for band-limited content, and the Spark path
    is bit-identical to the local numpy kernel."""
    import numpy as np

    from dataflows_spark.functions import audio

    sr_in, sr_out, f0 = 16000, 8000, 440.0
    t = np.arange(int(0.25 * sr_in)) / sr_in
    x = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    raw = audio.encode_clip(x, "pcm_s16le")
    df = spark.createDataFrame(
        [("c1", bytearray(raw), "pcm_s16le", sr_in)],
        schema="clip_id string, bytes binary, codec string, sr_hz int",
    )
    out = df.withColumn("bytes", audio.resample_to_udf(sr_out)("bytes", "codec", "sr_hz")).collect()[0]
    got = audio.decode_clip(bytes(out["bytes"]), "pcm_s16le")
    assert len(got) == int(round(len(x) * sr_out / sr_in))
    # reference: ideal sine sampled directly at the target rate
    t8 = np.arange(len(got)) / sr_out
    ref = (0.5 * np.sin(2 * np.pi * f0 * t8)).astype(np.float32)
    assert audio.snr_db(ref, got) >= 30.0
    # bit-parity with the local kernel (same decode/resample/encode path)
    local = audio.decode_clip(
        audio.encode_clip(audio.resample_pcm(audio.decode_clip(raw, "pcm_s16le"), sr_in, sr_out), "pcm_s16le"),
        "pcm_s16le",
    )
    assert np.array_equal(got, local)


def test_trim_silence_kernel_and_udf(spark):
    """Silence trimming: frame-quantized lead/trail cut, stats + bytes
    paths agree, all-silent clips trim to zero."""
    import numpy as np

    from dataflows_spark.functions import audio

    sr = 16000
    lead = np.zeros(3200, dtype=np.float32)            # 200 ms silence
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / sr)).astype(np.float32)
    trail = np.zeros(1600, dtype=np.float32)           # 100 ms silence
    x = np.concatenate([lead, tone, trail])

    t, l, r = audio.trim_silence(x, threshold=0.01, frame=160)
    assert l == 3200 and r == 1600 and len(t) == 8000

    raw = audio.encode_clip(x, "pcm_s16le")
    df = spark.createDataFrame(
        [("c1", bytearray(raw), "pcm_s16le", sr), ("c2", bytearray(audio.encode_clip(np.zeros(1600, dtype=np.float32), "ulaw")), "ulaw", sr)],
        schema="clip_id string, bytes binary, codec string, sr_hz int",
    )
    stats = {r_["clip_id"]: r_ for r_ in df.withColumn(
        "st", audio.trim_silence_stats()("bytes", "codec", "sr_hz")
    ).select("clip_id", "st.*").collect()}
    assert abs(stats["c1"]["lead_ms_removed"] - 200.0) < 1e-9
    assert abs(stats["c1"]["trail_ms_removed"] - 100.0) < 1e-9
    assert abs(stats["c1"]["active_ms"] - 500.0) < 1e-9
    assert stats["c2"]["active_ms"] == 0.0  # all silence

    trimmed = {r_["clip_id"]: bytes(r_["b"]) for r_ in df.withColumn(
        "b", audio.trim_silence_bytes()("bytes", "codec")
    ).select("clip_id", "b").collect()}
    got = audio.decode_clip(trimmed["c1"], "pcm_s16le")
    assert len(got) == 8000
    assert audio.snr_db(tone, got) >= 30.0


def test_trim_silence_partial_tail_kept():
    """A partial final frame following an ACTIVE last full frame is
    signal continuation — it must be kept, not quantized away."""
    import numpy as np

    from dataflows_spark.functions import audio

    x = np.concatenate([
        np.zeros(320, dtype=np.float32),
        np.full(480 + 37, 0.5, dtype=np.float32),  # active through a partial tail
    ])
    t, lead, trail = audio.trim_silence(x, threshold=0.01, frame=160)
    assert lead == 320 and trail == 0 and len(t) == 480 + 37


def test_logmel_concentrates_tone_energy(spark):
    """A pure tone's energy lands in the mel band containing its
    frequency; the fused UDF matches the local kernel."""
    import numpy as np

    from dataflows_spark.functions import audio

    sr, f0 = 16000, 440.0
    t = np.arange(sr // 2) / sr
    x = (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    m = audio.logmel_frames(x, sr, n_mels=16)
    band = int(m.mean(axis=0).argmax())
    # 440 Hz sits low on the mel scale for a 0..8 kHz range
    assert 0 <= band <= 4

    raw = audio.encode_clip(x, "pcm_s16le")
    df = spark.createDataFrame(
        [("c1", bytearray(raw), "pcm_s16le", sr)],
        schema="clip_id string, bytes binary, codec string, sr_hz int",
    )
    r = df.withColumn("lm", audio.decode_logmel_stats(n_mels=16)("bytes", "codec", "sr_hz")).select("lm.*").collect()[0]
    assert int(np.argmax(r["mel_mean"])) == band
    assert r["n_frames"] == m.shape[0]
    # the UDF sees the int16-quantized roundtrip — compare like for like
    m_q = audio.logmel_frames(audio.decode_clip(raw, "pcm_s16le"), sr, n_mels=16)
    assert np.allclose(r["mel_mean"], m_q.mean(axis=0))


def test_trim_silence_subframe_clip(spark):
    """Clips shorter than one frame must not crash the reshape (advisor
    round-2): an active sub-frame clip is kept whole, a silent one trims
    to zero, and the UDF survives a batch containing one."""
    import numpy as np

    from dataflows_spark.functions import audio

    loud = np.full(100, 0.5, dtype=np.float32)          # 100 < frame=160
    t, lead, trail = audio.trim_silence(loud, threshold=0.01, frame=160)
    assert lead == 0 and trail == 0 and len(t) == 100

    quiet = np.zeros(100, dtype=np.float32)
    t, lead, trail = audio.trim_silence(quiet, threshold=0.01, frame=160)
    assert lead == 100 and trail == 0 and len(t) == 0

    df = spark.createDataFrame(
        [("short", bytearray(audio.encode_clip(loud, "pcm_s16le")), "pcm_s16le", 16000)],
        schema="clip_id string, bytes binary, codec string, sr_hz int",
    )
    row = df.withColumn("st", audio.trim_silence_stats()("bytes", "codec", "sr_hz")).select("st.*").collect()[0]
    assert abs(row["active_ms"] - 100 * 1000.0 / 16000) < 1e-9
