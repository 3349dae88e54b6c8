"""Audio payload synthesis + the per-row SNR/transcript invariant
(BASELINE.json input_hint: decoded-PCM SNR ≥ 30 dB + transcript equality,
via Arrow-batched pandas UDFs — no per-row Python)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsschema_spark.audio import (
    audio_invariant_udf,
    decode_payload,
    expected_transcript_udf,
    snr_db,
    synth_pcm,
    synth_transcript,
    wav_decode,
    wav_encode,
)
from jsschema_spark.synth import clips_table


def test_wav_roundtrip_local():
    pcm = synth_pcm("clip-000000000123", 16000, 16000)
    payload = wav_encode(pcm, 16000)
    sr, decoded = wav_decode(payload)
    assert sr == 16000
    assert np.array_equal(pcm, decoded)
    assert snr_db(pcm, decoded) == 99.0  # lossless


def test_synth_is_deterministic():
    # synth_pcm returns a scratch VIEW — copy to compare across calls
    a = synth_pcm("clip-x", 8000, 4000).copy()
    b = synth_pcm("clip-x", 8000, 4000).copy()
    c = synth_pcm("clip-y", 8000, 4000).copy()
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert synth_transcript("clip-x") == synth_transcript("clip-x")
    assert synth_transcript("clip-x") != synth_transcript("clip-y")


def test_snr_math():
    ref = synth_pcm("clip-z", 16000, 8000)
    noisy = ref + np.random.default_rng(1).integers(-50, 50, size=len(ref)).astype(np.int16)
    assert 30 < snr_db(ref, noisy) < 99
    garbage = np.zeros(len(ref), dtype=np.int16)
    assert snr_db(ref, garbage) <= 0.1
    assert snr_db(ref, ref[:10]) == float("-inf")  # length mismatch


def test_codec_stub():
    # opus is the remaining honest stub; flac decodes for real (round 6,
    # jsschema_spark/flac.py) so a garbage payload is now a ValueError
    with pytest.raises(NotImplementedError):
        decode_payload("opus", b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_payload("flac", b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_payload("pcm_s16le", b"junk")


@pytest.fixture(scope="module")
def clips_audio(spark):
    df = clips_table(
        spark, 600, with_audio=True,
        corrupt_pcm_mod=53, mismatch_txt_mod=53, empty_txt_mod=67,
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_audio_invariant_on_spark(spark, clips_audio):
    df = clips_audio.withColumn(
        "inv", audio_invariant_udf(F.col("clip_id"), F.col("bytes"))
    ).withColumn("transcript_ref", expected_transcript_udf(F.col("clip_id")))
    out = df.select(
        "clip_id",
        F.col("inv.snr_db").alias("snr"),
        F.col("inv.decode_ok").alias("ok"),
        (F.col("transcript") == F.col("transcript_ref")).alias("txt_eq"),
        (F.length("transcript") == 0).alias("txt_empty"),
    ).cache()
    n = out.count()
    clean = out.where(F.col("snr") >= 30).count()
    corrupted = out.where((F.col("snr") < 30)).count()
    assert clean + corrupted == n
    assert corrupted > 0, "synth should inject corrupted payloads"
    assert clean > corrupted * 10, "corruption rate should be low"
    assert out.where(~F.col("ok")).count() == 0  # all payloads decode
    # transcript mismatches exist but are rare; empty transcripts count as mismatch
    mism = out.where(~F.col("txt_eq")).count()
    assert 0 < mism < n // 10
    out.unpersist()


def test_invariant_plan_is_arrow_batched(spark, clips_audio):
    df = clips_audio.withColumn("inv", audio_invariant_udf(F.col("clip_id"), F.col("bytes")))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
    assert "BatchEvalPython" not in plan


def test_spectral_profile_physical_invariants():
    """The numpy spectral kernel against physics: a pure tone's ZCR is
    2f, its centroid and rolloff sit at f; white noise centers near
    sr/4; silence padding is measured as leading/trailing ms."""
    import numpy as np

    from jsschema_spark.audio import spectral_profile

    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr  # 1 second
    tone = (10000 * np.sin(2 * np.pi * 1000 * t)).astype(np.int16)
    zcr, cent, roll, act, lead, trail = spectral_profile(tone, sr)
    assert abs(zcr - 2000) < 40
    assert abs(cent - 1000) < 10
    assert abs(roll - 1000) < 20
    assert act == 1.0 and lead == 0.0 and trail == 0.0

    pad = np.zeros(int(0.2 * sr), dtype=np.int16)
    padded = np.concatenate([pad, tone, pad])
    *_, act2, lead2, trail2 = spectral_profile(padded, sr)
    assert abs(lead2 - 200) <= 20 and abs(trail2 - 200) <= 20
    assert abs(act2 - 1.0 / 1.4) < 0.03

    silence = np.zeros(sr, dtype=np.int16)
    z, c, r, a, l, tr = spectral_profile(silence, sr)
    assert (z, c, r, a) == (0.0, 0.0, 0.0, 0.0)
    assert abs(l - 1000) < 25 and abs(tr - 1000) < 25

    rng = np.random.default_rng(3)
    noise = (8000 * rng.standard_normal(sr)).clip(-32768, 32767).astype(np.int16)
    _, cn, _, an, *_ = spectral_profile(noise, sr)
    assert abs(cn - sr / 4) < sr * 0.03  # flat spectrum centers at sr/4
    assert an == 1.0

    assert spectral_profile(np.array([], dtype=np.int16), sr) == (0.0,) * 6


def test_audio_spectral_scan_matches_kernel(spark, tmp_path):
    """The file-granular Spark scan returns exactly what the kernel
    computes per clip (and flags undecodable payloads)."""
    import numpy as np
    import pandas as pd

    from jsschema_spark.audio import spectral_profile, wav_decode, wav_encode
    from jsschema_spark.audio import audio_spectral_scan

    sr = 16000
    t = np.arange(sr // 2, dtype=np.float64) / sr
    clips = {
        "c-tone": wav_encode((9000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16), sr),
        "c-quiet": wav_encode(np.zeros(sr // 4, dtype=np.int16), sr),
        "c-bad": b"not a wav at all",
    }
    pdf = pd.DataFrame(
        {"clip_id": list(clips), "bytes": [bytearray(v) for v in clips.values()]}
    )
    src = str(tmp_path / "spec_clips")
    import os
    os.makedirs(src)
    pdf.to_parquet(os.path.join(src, "part0.parquet"))

    got = {r.clip_id: r for r in audio_spectral_scan(spark, src).collect()}
    assert not got["c-bad"].decode_ok
    for cid in ("c-tone", "c-quiet"):
        srx, samples = wav_decode(clips[cid])
        expect = spectral_profile(samples, srx)
        row = got[cid]
        assert row.decode_ok
        vals = (row.zcr_hz, row.centroid_hz, row.rolloff85_hz,
                row.active_ratio, row.leading_silence_ms, row.trailing_silence_ms)
        assert all(abs(a - b) < 1e-9 for a, b in zip(vals, expect)), cid


def test_transcript_rate_check(spark):
    """Cross-column consistency: each reason fires on its own row shape and
    passing rows are absent."""
    from jsschema_spark.audio import transcript_rate_check

    rows = [
        ("ok", "one two three four", 2000),        # 2 tps -> pass
        ("fast", " ".join(["w"] * 50), 2000),      # 25 tps
        ("slow", "hi", 30000),                     # 0.033 tps
        ("empty", "   ", 5000),
        ("nodur", "a b c", None),
        ("zerodur", "a b c", 0),
    ]
    df = spark.createDataFrame(rows, "clip_id string, transcript string, dur_ms int")
    out = {r.clip_id: r for r in transcript_rate_check(df).collect()}
    assert set(out) == {"fast", "slow", "empty", "nodur", "zerodur"}
    assert out["fast"].reason == "too_fast" and out["fast"].n_tokens == 50
    assert out["slow"].reason == "too_slow"
    assert out["empty"].reason == "empty_transcript" and out["empty"].n_tokens == 0
    assert out["nodur"].reason == "bad_duration" and out["nodur"].tokens_per_sec is None
    assert out["zerodur"].reason == "bad_duration"
    assert abs(out["fast"].tokens_per_sec - 25.0) < 1e-12


def test_clip_windows_segmentation(spark):
    """Window manifest: full windows only, stride hop_ms, short and null
    clips excluded, tail partials dropped."""
    from jsschema_spark.audio import clip_windows

    df = spark.createDataFrame(
        [("a", 2200), ("b", 1000), ("c", 999), ("d", None)],
        "clip_id string, dur_ms int",
    )
    out = sorted(
        (r.clip_id, r.win_idx, r.start_ms, r.end_ms)
        for r in clip_windows(df, win_ms=1000, hop_ms=500).collect()
    )
    assert out == [
        ("a", 0, 0, 1000), ("a", 1, 500, 1500), ("a", 2, 1000, 2000),
        ("b", 0, 0, 1000),
    ]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        clip_windows(df, win_ms=0)


def _tone(sr, ms, amp=8000):
    import numpy as np
    t = np.arange(int(sr * ms / 1000.0))
    return (amp * np.sin(2 * np.pi * 440.0 * t / sr)).astype(np.int16)


def _silence(sr, ms):
    import numpy as np
    return np.zeros(int(sr * ms / 1000.0), dtype=np.int16)


def test_vad_segments_bridge_and_drop():
    """Short gaps bridge into one utterance; tightening min_gap splits it;
    clicks below min_speech_ms are dropped; pure silence yields nothing."""
    import numpy as np
    from jsschema_spark.audio import vad_segments

    sr = 16000
    pcm = np.concatenate([
        _silence(sr, 300), _tone(sr, 500), _silence(sr, 50),
        _tone(sr, 300), _silence(sr, 400),
    ])
    merged = vad_segments(pcm, sr, min_gap_ms=150.0)
    assert len(merged) == 1
    s, e = merged[0]
    assert abs(s - 300.0) <= 20.0 and abs(e - 1150.0) <= 20.0
    split = vad_segments(pcm, sr, min_gap_ms=20.0)
    assert len(split) == 2
    click = np.concatenate([_silence(sr, 200), _tone(sr, 40), _silence(sr, 200)])
    assert vad_segments(click, sr, min_speech_ms=100.0) == []
    assert vad_segments(_silence(sr, 500), sr) == []


def test_audio_vad_scan_file_granular(spark, tmp_path):
    """The scan emits segment rows per clip and a seg_idx=-1 sentinel for
    silent and undecodable clips."""
    import numpy as np
    import pandas as pd
    from jsschema_spark.audio import audio_vad_scan, wav_encode

    sr = 16000
    speech = np.concatenate([_silence(sr, 200), _tone(sr, 400), _silence(sr, 200)])
    rows = [
        ("speech", wav_encode(speech, sr)),
        ("silent", wav_encode(_silence(sr, 400), sr)),
        ("broken", b"not a wav payload"),
    ]
    pdf = pd.DataFrame(rows, columns=["clip_id", "bytes"])
    d = str(tmp_path / "clips")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(d)
    out = {r.clip_id: r for r in audio_vad_scan(spark, d).collect()}
    assert out["speech"].seg_idx == 0 and out["speech"].decode_ok
    assert abs(out["speech"].start_ms - 200.0) <= 20.0
    assert abs(out["speech"].end_ms - 600.0) <= 20.0
    assert out["silent"].seg_idx == -1 and out["silent"].decode_ok
    assert out["broken"].seg_idx == -1 and not out["broken"].decode_ok


def test_payload_size_check_on_real_wavs(spark, tmp_path):
    """The metadata-derived expected size must match wav_encode's actual
    layout on the engine's own synthesized corpus (modulo the injected
    corrupt/mismatch rows, which the check must CATCH)."""
    from pyspark.sql import functions as F

    from jsschema_spark.audio import payload_size_check
    from jsschema_spark.synth import clips_audio_to_parquet

    src = str(tmp_path / "wavs")
    clips_audio_to_parquet(spark, 400, src, n_files=4)
    df = spark.read.parquet(src).withColumn("codec", F.lit("pcm_s16le"))
    out = payload_size_check(df)
    by = {r["size_status"]: r["n"] for r in out.groupBy("size_status").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # the generator injects ~1/200 truncated payloads and ~1/211 sr
    # mismatches; everything else must be byte-exact
    assert by.get("ok", 0) >= 390
    assert by.get("ok", 0) + by.get("size_mismatch", 0) == 400
    # a mismatch row reports both numbers
    bad = out.where(F.col("size_status") == "size_mismatch").limit(1).collect()
    if bad:
        assert bad[0]["expected_bytes"] != bad[0]["actual_bytes"]

    # codec gating and metadata gating
    gated = payload_size_check(
        df.withColumn("codec", F.lit("opus"))
    ).select("size_status").distinct().collect()
    assert [r["size_status"] for r in gated] == ["not_applicable"]
    badmeta = payload_size_check(
        df.withColumn("sr_hz", F.lit(0))
    ).select("size_status").distinct().collect()
    assert [r["size_status"] for r in badmeta] == ["invalid_metadata"]


def test_bandwidth_check_flags_upsampled_clips(spark, tmp_path):
    """A 2 kHz tone in a 44.1 kHz container is band-limited (upsample
    fraud); a 6 kHz tone at 16 kHz is full-band; silence and garbage get
    their own statuses, never 'band_limited'."""
    import numpy as np
    import pandas as pd
    from jsschema_spark.audio import audio_spectral_scan, bandwidth_check, wav_encode

    def tone(sr, f, ms=400):
        t = np.arange(int(sr * ms / 1000)) / sr
        return (8000 * np.sin(2 * np.pi * f * t)).astype(np.int16)

    rows = [
        ("fake_hires", wav_encode(tone(44100, 2000), 44100), 44100),
        ("genuine", wav_encode(tone(16000, 6000), 16000), 16000),
        ("silent", wav_encode(np.zeros(6400, dtype=np.int16), 16000), 16000),
        ("broken", b"xx", 44100),
    ]
    pdf = pd.DataFrame(rows, columns=["clip_id", "bytes", "sr_hz"])
    d = str(tmp_path / "clips")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(d)

    feats = audio_spectral_scan(spark, d)
    meta = spark.read.parquet(d).select("clip_id", "sr_hz")
    out = {r.clip_id: r for r in
           bandwidth_check(feats.join(meta, "clip_id")).collect()}
    assert out["fake_hires"].band_status == "band_limited"
    assert out["fake_hires"].bandwidth_ratio == pytest.approx(2000 / 22050, rel=0.05)
    assert out["genuine"].band_status == "full_band"
    assert out["genuine"].bandwidth_ratio == pytest.approx(6000 / 8000, rel=0.05)
    assert out["silent"].band_status == "silent"
    assert out["broken"].band_status == "undecodable"


def test_profile_check_classifies_capture_defects(spark, tmp_path):
    import numpy as np
    import pandas as pd
    from jsschema_spark.audio import audio_profile_scan, profile_check, wav_encode

    sr = 16000
    t = np.arange(sr // 2) / sr

    def wav(wave):
        return wav_encode(np.clip(wave, -32768, 32767).astype(np.int16), sr)

    rows = [
        ("ok", wav(8000 * np.sin(2 * np.pi * 440 * t))),
        ("clipped", wav(40000 * np.sin(2 * np.pi * 440 * t))),
        ("dc", wav(8000 * np.sin(2 * np.pi * 440 * t) + 2000)),
        ("silent", wav(np.zeros_like(t))),
        ("broken", b"zz"),
    ]
    d = str(tmp_path / "clips")
    spark.createDataFrame(pd.DataFrame(rows, columns=["clip_id", "bytes"])).coalesce(
        1
    ).write.parquet(d)
    out = {r.clip_id: r for r in profile_check(audio_profile_scan(spark, d)).collect()}
    assert out["ok"].profile_status == "ok"
    assert out["clipped"].profile_status == "clipped" and out["clipped"].clip_frac > 0.3
    assert out["dc"].profile_status == "dc_offset"
    assert abs(out["dc"].dc_offset - 2000) < 50
    assert out["silent"].profile_status == "silent"
    assert out["broken"].profile_status == "undecodable"


def test_transcript_vad_consistency_statuses(spark):
    from jsschema_spark.audio import transcript_vad_consistency

    rows = [
        ("fabricated", 0.0, 5, True),
        ("dropped", 1000.0, 0, True),
        ("ok", 1000.0, 3, True),
        ("gabble", 1000.0, 30, True),
        ("mumble", 4000.0, 1, True),
        ("vacuous", 0.0, 0, True),   # silent + empty transcript = fine
        ("broken", 0.0, 3, False),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, active_ms double, n_tokens int, decode_ok boolean"
    )
    out = {r.clip_id: r for r in transcript_vad_consistency(df).collect()}
    assert out["fabricated"].vad_status == "transcript_without_speech"
    assert out["dropped"].vad_status == "speech_without_transcript"
    assert out["ok"].vad_status == "ok"
    assert out["ok"].tokens_per_active_s == pytest.approx(3.0)
    assert out["gabble"].vad_status == "too_fast"
    assert out["mumble"].vad_status == "too_slow"
    assert out["vacuous"].vad_status == "ok"
    assert out["broken"].vad_status == "undecodable"


def test_duration_check_catches_header_lies(spark):
    import numpy as np
    import pandas as pd
    from jsschema_spark.audio import _profile_rows, duration_check, wav_encode

    def sine(sr, ms):
        t = np.arange(sr * ms // 1000) / sr
        return wav_encode((8000 * np.sin(2 * np.pi * 440 * t)).astype("int16"), sr)

    rows = [
        ("ok", sine(16000, 1000)),
        ("wrong_sr", sine(8000, 1000)),
        ("long", sine(16000, 1400)),
        ("broken", b"x"),
    ]
    prof = _profile_rows([r[0] for r in rows], [r[1] for r in rows])
    df = spark.createDataFrame(prof).withColumns(
        {"sr_hz_meta": F.lit(16000), "dur_ms_meta": F.lit(1000)}
    )
    out = {r.clip_id: r for r in duration_check(df).collect()}
    assert out["ok"].dur_status == "ok"
    assert out["ok"].decoded_ms == pytest.approx(1000.0)
    assert out["wrong_sr"].dur_status == "sr_mismatch"
    assert out["long"].dur_status == "duration_mismatch"
    assert out["broken"].dur_status == "undecodable"


def test_normalize_and_resample_kernels():
    import numpy as np

    from jsschema_spark.audio import (
        band_energy_fingerprint,
        normalize_gain,
        pcm_profile,
        resample_linear,
    )

    sr = 16000
    t = np.arange(sr) / sr
    quiet = (800 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)

    # gain: RMS lands on target; waveform shape (fingerprint) unchanged
    normed = normalize_gain(quiet, target_dbfs=-20.0)
    rms_dbfs, _, clip_frac, _ = pcm_profile(normed)
    assert abs(rms_dbfs - (-20.0)) < 0.1 and clip_frac == 0.0
    fp_a, _ = band_energy_fingerprint(quiet, sr)
    fp_b, _ = band_energy_fingerprint(normed, sr)
    assert fp_a == fp_b  # the gain-invariance the fingerprint promises

    # silence passes through
    z = np.zeros(100, dtype=np.int16)
    assert (normalize_gain(z) == z).all()

    # resample: length scales, tone frequency preserved (ZCR check)
    from jsschema_spark.audio import spectral_profile

    up = resample_linear(quiet, sr, 44100)
    assert len(up) == sr * 44100 // 16000
    zcr, _, _, _, _, _ = spectral_profile(up, 44100)
    assert abs(zcr - 880) < 20  # 440 Hz tone => ~880 crossings/s
    assert (resample_linear(quiet, sr, sr) == quiet).all()


def test_audio_normalize_scan_end_to_end(spark, tmp_path):
    import numpy as np
    import pandas as pd
    from jsschema_spark.audio import (
        audio_normalize_scan,
        audio_profile_scan,
        wav_decode,
        wav_encode,
    )

    def tone(sr, amp, ms=500):
        t = np.arange(sr * ms // 1000) / sr
        return wav_encode((amp * np.sin(2 * np.pi * 440 * t)).astype(np.int16), sr)

    rows = [
        ("hot44", tone(44100, 28000)),
        ("quiet8", tone(8000, 500)),
        ("broken", b"nope"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(pd.DataFrame(rows, columns=["clip_id", "bytes"])).coalesce(
        1
    ).write.parquet(src)

    out = {r.clip_id: r for r in audio_normalize_scan(spark, src, target_sr=16000).collect()}
    assert out["broken"].decode_ok is False and out["broken"].bytes is None
    for cid in ("hot44", "quiet8"):
        sr, pcm = wav_decode(bytes(out[cid].bytes))
        assert sr == 16000
        assert abs(len(pcm) - 8000) <= 2  # 500 ms at 16 kHz
        rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
        import math

        assert abs(20 * math.log10(rms / 32768.0) - (-20.0)) < 0.6


def test_xcorr_offset_alignment():
    import numpy as np
    from jsschema_spark.audio import xcorr_offset

    rng = np.random.default_rng(7)
    b = rng.normal(0, 3000, 8000).astype(np.int16)
    a = np.concatenate(
        [np.zeros(800, dtype=np.int16), b, np.zeros(400, dtype=np.int16)]
    )
    lag, score = xcorr_offset(a, b)
    assert lag == 800 and score > 0.99

    # negative lag: a's content starts inside b
    lag2, score2 = xcorr_offset(b[500:], b)
    assert lag2 == -500 and score2 > 0.99

    _, s_unrel = xcorr_offset(a, rng.normal(0, 3000, 8000).astype(np.int16))
    assert s_unrel < 0.2


def test_payload_duplicates_groups_reuploads(spark):
    import numpy as np
    from jsschema_spark.audio import payload_duplicates, wav_encode

    t = np.arange(1600) / 16000
    wav_a = wav_encode((8000 * np.sin(2 * np.pi * 440 * t)).astype("int16"), 16000)
    wav_b = wav_encode((8000 * np.sin(2 * np.pi * 880 * t)).astype("int16"), 16000)
    rows = [
        ("c1", bytearray(wav_a)), ("c2", bytearray(wav_a)),  # re-upload
        ("c3", bytearray(wav_b)),
        ("c4", None),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = payload_duplicates(df).collect()
    assert len(out) == 1
    assert out[0]["n_clips"] == 2 and out[0]["clip_ids"] == ["c1", "c2"]


def test_estimate_f0_pitch_and_voicing():
    import numpy as np
    from jsschema_spark.audio import estimate_f0

    sr = 16000
    t = np.arange(sr) / sr
    for f in (110.0, 220.0, 330.0):
        pcm = (8000 * np.sin(2 * np.pi * f * t)).astype(np.int16)
        f0, p = estimate_f0(pcm, sr)
        assert abs(f0 - f) / f < 0.02 and p > 0.9
    noise = np.random.default_rng(1).normal(0, 3000, sr).astype(np.int16)
    _, p_noise = estimate_f0(noise, sr)
    assert p_noise < 0.2  # unvoiced
    assert estimate_f0(np.zeros(sr, dtype=np.int16), sr) == (0.0, 0.0)


def test_crest_check_flags_compression(spark):
    import numpy as np
    from jsschema_spark.audio import (
        _profile_rows,
        crest_check,
        wav_encode,
    )

    sr = 16000
    n = sr // 2
    t = np.arange(n) / sr
    rng = np.random.default_rng(3)
    rows = [
        # square wave: crest 0 dB -> the brickwall signature
        ("square", wav_encode((8000 * np.sign(np.sin(2 * np.pi * 440 * t))).astype("int16"), sr)),
        # gaussian noise: crest ~12 dB -> natural dynamics
        ("noise", wav_encode(np.clip(rng.normal(0, 3000, n), -32768, 32767).astype("int16"), sr)),
        ("silent", wav_encode(np.zeros(n, dtype=np.int16), sr)),
        ("broken", b"x"),
    ]
    prof = _profile_rows([r[0] for r in rows], [r[1] for r in rows])
    out = {r.clip_id: r for r in crest_check(spark.createDataFrame(prof)).collect()}
    assert out["square"].crest_status == "over_compressed"
    assert abs(out["square"].crest_db) < 0.1  # peak == rms
    assert out["noise"].crest_status == "ok" and out["noise"].crest_db > 8
    assert out["silent"].crest_status == "silent"
    assert out["broken"].crest_status == "undecodable"


def test_resample_sinc_quality():
    """Polyphase windowed-sinc resampler: >=53 dB SNR vs the analytically
    ideal tone on every ordered pair of the corpus rates (measured floor
    53.4 dB at 44.1k->8k), beating linear interp on the true-interpolation
    legs; exact output grid floor(n*L/M); int16 passthrough identity."""
    import numpy as np

    from jsschema_spark.audio import resample_linear, resample_sinc

    def tone(f, sr, n, amp=8000.0):
        return np.clip(
            np.rint(amp * np.sin(2 * np.pi * f * np.arange(n) / sr)),
            -32768, 32767,
        ).astype(np.int16)

    def snr_vs_ideal(y, f, sr_out):
        ref = 8000.0 * np.sin(2 * np.pi * f * np.arange(len(y)) / sr_out)
        sl = slice(200, len(y) - 200)
        e = y[sl].astype(np.float64) - ref[sl]
        return 10 * np.log10(
            float(np.dot(ref[sl], ref[sl])) / max(float(np.dot(e, e)), 1e-12)
        )

    import math

    rates = (8000, 16000, 44100)
    for sr_in in rates:
        for sr_out in rates:
            if sr_in == sr_out:
                x = tone(440, sr_in, 4000)
                assert np.array_equal(resample_sinc(x, sr_in, sr_out), x)
                continue
            x = tone(440, sr_in, sr_in)  # 1 second
            y = resample_sinc(x, sr_in, sr_out)
            g = math.gcd(sr_in, sr_out)
            assert len(y) == (len(x) * (sr_out // g)) // (sr_in // g)
            s = snr_vs_ideal(y, 440, sr_out)
            assert s >= 50.0, (sr_in, sr_out, s)
    # sinc must beat linear where linear actually interpolates (upsampling)
    x = tone(440, 8000, 8000)
    s_sinc = snr_vs_ideal(resample_sinc(x, 8000, 16000), 440, 16000)
    s_lin = snr_vs_ideal(resample_linear(x, 8000, 16000), 440, 16000)
    assert s_sinc > s_lin + 20.0
    # empty and sub-chunk inputs
    assert len(resample_sinc(np.zeros(0, dtype=np.int16), 8000, 16000)) == 0
    assert len(resample_sinc(tone(300, 8000, 7), 8000, 16000)) == 14


def test_normalize_scan_sinc_resampler(spark, tmp_path):
    """audio_normalize_scan(resampler='sinc') routes through the polyphase
    kernel: output grid floor(n*L/M), target rate and RMS hit; bad
    resampler name rejected."""
    import os

    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from jsschema_spark.audio import audio_normalize_scan, wav_decode, wav_encode

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr
    pcm = (6000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    src = str(tmp_path / "nsc")
    os.makedirs(src)
    pd.DataFrame(
        {"clip_id": ["c1"], "bytes": [bytearray(wav_encode(pcm, sr))]}
    ).to_parquet(os.path.join(src, "p0.parquet"))
    row = audio_normalize_scan(spark, src, resampler="sinc").collect()[0]
    assert row.decode_ok and row.sr_hz == 16000
    assert row.n_samples == len(pcm) * 2
    dsr, dec = wav_decode(bytes(row.bytes))
    rms = 20 * np.log10(np.sqrt(np.mean(dec.astype(np.float64) ** 2)) / 32768.0)
    assert abs(rms - (-20.0)) < 1.0
    with _pytest.raises(ValueError):
        audio_normalize_scan(spark, src, resampler="cubic")
