"""File-granular audio pipeline: payload bytes never cross JVM↔Python IPC
(the single-box scale path — see audio.py's bandwidth note)."""

from pyspark.sql import functions as F

from jsschema_spark.audio import audio_invariant_scan, audio_invariant_udf
from jsschema_spark.synth import clips_audio_to_parquet


def test_file_granular_matches_ipc_path(spark, tmp_path):
    out = str(tmp_path / "audio_fg")
    files = clips_audio_to_parquet(spark, 400, out, n_files=8)
    assert len(files) == 8

    fg = audio_invariant_scan(spark, out).cache()
    assert fg.count() == 400
    # every payload decodes; corrupted ones fail the SNR bar
    assert fg.where(~F.col("decode_ok")).count() == 0
    n_bad = fg.where(F.col("snr_db") < 30).count()
    assert 0 < n_bad < 40

    # agreement with the Arrow-IPC invariant on the same stored bytes
    ipc = (
        spark.read.parquet(out)
        .withColumn("inv", audio_invariant_udf(F.col("clip_id"), F.col("bytes")))
        .select("clip_id", F.col("inv.snr_db").alias("snr_db"))
    )
    joined = fg.alias("a").join(ipc.alias("b"), "clip_id").select(
        (F.abs(F.col("a.snr_db") - F.col("b.snr_db")) < 1e-6).alias("same")
    )
    assert joined.where(~F.col("same")).count() == 0
    fg.unpersist()


def test_file_granular_write_is_deterministic(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    clips_audio_to_parquet(spark, 200, a, n_files=4)
    clips_audio_to_parquet(spark, 200, b, n_files=4)
    da = spark.read.parquet(a).select("clip_id", F.md5(F.col("bytes")).alias("h"))
    db = spark.read.parquet(b).select("clip_id", F.md5(F.col("bytes")).alias("h"))
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0
