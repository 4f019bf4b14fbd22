"""Property-based invariants (hypothesis) — the reference's semantics
hold over GENERATED inputs, not just goldens (SURVEY §5.2: differential
testing). Spark jobs are expensive per-example, so properties that need
the cluster run numpy-side against the same kernels the UDFs call;
one representative end-to-end property runs through Spark."""

import numpy as np
from hypothesis import given, settings, strategies as st

from dataflows_spark.functions import audio
from dataflows_spark.functions.multimodal import decode_ppm, encode_ppm, nn_resize


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.floats(min_value=-1.0, max_value=1.0, width=32), min_size=1, max_size=4000),
    st.sampled_from(["pcm_s16le", "pcm_f32le", "ulaw", "alaw"]),
)
def test_codec_roundtrip_snr_invariant(samples, codec):
    """decode(encode(x)) meets the SNR≥30dB north-rule invariant for
    every codec on arbitrary in-range signals (silence excepted — SNR
    is undefined at zero signal power, the validation path treats it
    as pass-through)."""
    x = np.asarray(samples, dtype=np.float32)
    y = audio.decode_clip(audio.encode_clip(x, codec), codec)
    assert len(y) == len(x)
    if float(np.sum(x.astype(np.float64) ** 2)) < 1e-6:
        return  # silence: SNR undefined
    assert audio.snr_db(x, y) >= 30.0


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_ppm_resize_roundtrip_properties(w, h, tw, th, seed):
    """encode/decode are inverse; nn_resize hits the exact target shape
    and only emits pixel values present in the source."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 1]))
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    out = nn_resize(img, (tw, th))
    assert out.shape == (th, tw, 3)
    assert set(np.unique(out)) <= set(np.unique(img))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(min_value=-1.0, max_value=1.0, width=32), min_size=8, max_size=2000),
    st.sampled_from([(16000, 8000), (8000, 16000), (16000, 16000), (44100, 16000)]),
)
def test_resample_length_and_energy(samples, rates):
    """resample_pcm emits round(n·sr_out/sr_in) samples and preserves
    in-range amplitude bounds."""
    sr_in, sr_out = rates
    x = np.asarray(samples, dtype=np.float32)
    y = audio.resample_pcm(x, sr_in, sr_out)
    assert len(y) == (len(x) if sr_in == sr_out else max(1, int(round(len(x) * sr_out / sr_in))))
    if len(x):
        assert float(np.max(np.abs(y))) <= float(np.max(np.abs(x))) + 1e-6


def test_find_replace_matches_python_re_on_generated_inputs(spark):
    """End-to-end differential property through Spark: find_replace ==
    Python re.sub for a batch of generated (text, pattern) cases."""
    import re as _re

    from dataflows_spark import Flow, find_replace

    cases = [
        ("aaa bbb ccc", r"b+", "X"),
        ("Customer#0001", r"0+(\d)", "$1"),
        ("no match here", r"zzz", "Q"),
        ("  spaces   collapse  ", r"\s+", " "),
        ("MiXeD CaSe", r"[A-Z]", "_"),
    ]
    for i, (t, pat, rep) in enumerate(cases):
        results, _, _ = Flow(
            [{"i": i, "t": t}],
            find_replace([{"name": "t", "patterns": [{"find": pat, "replace": rep}]}]),
        ).results(spark)
        expected = _re.sub(pat, rep.replace("$1", r"\1"), t)
        assert results[0][0]["t"] == expected, (pat, rep)
