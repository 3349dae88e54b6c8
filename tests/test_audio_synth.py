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
    with pytest.raises(NotImplementedError):
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
