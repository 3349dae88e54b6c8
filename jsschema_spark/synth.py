"""Deterministic synthetic ``clips`` table (FIXTURES.md §1).

Generated **in Spark** from ``spark.range(n)`` — every attribute is a pure
function of the row id / clip_id (Catalyst expressions; the audio payload is
the one pandas-UDF stage), so generation scales linearly with executors and
is reproducible across cluster sizes — the property the scaling-efficiency
benchmark depends on.

Injected negatives (seeded, fixed rates per FIXTURES.md):

* duplicate clip_ids (~0.1%) + a small set of *hot* keys (skew for the
  salted-uniqueness path),
* invalid sr_hz / dur_ms (range violations), unknown codec (enum +
  referential violations), empty transcript (minLength violations),
* corrupted PCM (SNR invariant negatives) and mismatched transcripts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsschema_spark.audio import audio_payload_udf

def clips_audio_to_parquet(
    spark: SparkSession, n: int, out_dir: str, n_files: int = 64,
) -> list[str]:
    """Write the audio clips table as parquet directly FROM Python workers
    (pyarrow), bypassing the JVM↔Python Arrow IPC for the payload bytes —
    the write-side twin of ``audio.audio_invariant_scan``. Each task owns a
    contiguous id range and writes one file; returns the file list."""
    import os

    from pyspark.sql import functions as F  # noqa: F401  (local alias clarity)

    os.makedirs(out_dir, exist_ok=True)
    bounds = [
        (i, (n * i) // n_files, (n * (i + 1)) // n_files) for i in range(n_files)
    ]
    from jsschema_spark.localdf import local_df

    ranges = local_df(spark, bounds, "file_idx int, lo long, hi long").repartition(n_files)

    def gen(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pandas as pd

        from jsschema_spark.audio import _payload_batch

        for pdf in batches:
            for _, row in pdf.iterrows():
                ids = list(range(int(row.lo), int(row.hi)))
                cids = [f"clip-{i:012d}" for i in ids]
                import hashlib

                def pick(cid, tag, m):
                    return int.from_bytes(
                        hashlib.sha256(f"{cid}#{tag}".encode()).digest()[:4], "big"
                    ) % m

                srs = [(8000, 16000, 44100)[pick(c, "sr", 3)] for c in cids]
                durs = [200 + pick(c, "dur", 14800) for c in cids]
                corrupt = [pick(c, "corrupt", 200) == 0 for c in cids]
                mism = [pick(c, "mismatch", 211) == 0 for c in cids]
                payload = _payload_batch(
                    pd.Series(cids), pd.Series(srs), pd.Series(durs),
                    pd.Series(corrupt), pd.Series(mism),
                )
                table = pa.table(
                    {
                        "clip_id": pa.array(cids, pa.string()),
                        "bytes": pa.array(payload["bytes"].tolist(), pa.binary()),
                        "sr_hz": pa.array(srs, pa.int32()),
                        "dur_ms": pa.array(durs, pa.int32()),
                        "transcript": pa.array(payload["transcript"].tolist(), pa.string()),
                    }
                )
                path = os.path.join(out_dir, f"part-{int(row.file_idx):05d}.parquet")
                pq.write_table(table, path)
                yield pd.DataFrame({"path": [path], "n_rows": [len(cids)]})

    out = ranges.mapInPandas(gen, "path string, n_rows long").collect()
    return [r.path for r in out]


CLIPS_DRAFT04_SCHEMA = {
    "type": "object",
    "required": ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"],
    "properties": {
        "clip_id": {"type": "string", "pattern": "^clip-[0-9]{12}$"},
        "sr_hz": {"type": "integer", "minimum": 8000, "maximum": 48000},
        "dur_ms": {"type": "integer", "minimum": 1, "maximum": 60000},
        "codec": {"type": "string", "enum": ["pcm_s16le", "flac", "opus"]},
        "transcript": {"type": "string", "minLength": 1, "maxLength": 4096},
    },
}

VALID_CODECS = [("pcm_s16le", "wav"), ("flac", "flac"), ("opus", "ogg")]


def codecs_dim(spark: SparkSession) -> DataFrame:
    """The referential dimension table (broadcast side)."""
    return spark.createDataFrame(VALID_CODECS, "codec string, container string")


def clips_table(
    spark: SparkSession,
    n: int,
    with_audio: bool = True,
    partitions: int | None = None,
    dup_rate_mod: int = 1000,     # 1/1000 rows duplicate the previous id
    hot_key_mod: int = 997,       # 1/997 rows collapse onto 2 hot ids (skew)
    bad_sr_mod: int = 500,        # sr_hz out-of-range rate
    bad_dur_mod: int = 499,
    bad_codec_mod: int = 333,
    empty_txt_mod: int = 487,
    corrupt_pcm_mod: int = 200,   # 0.5% corrupted payloads
    mismatch_txt_mod: int = 211,
) -> DataFrame:
    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)

    rid = F.col("id")
    # duplicates + hot keys operate on the numeric id, then format
    eff_id = (
        F.when(F.pmod(rid, hot_key_mod) == 0, F.pmod(rid, 2))
        .when((F.pmod(rid, dup_rate_mod) == 999) & (rid > 0), rid - 1)
        .otherwise(rid)
    )
    clip_id = F.format_string("clip-%012d", eff_id)

    h = lambda tag: F.xxhash64(clip_id, F.lit(tag))  # noqa: E731
    pick = lambda tag, m: F.pmod(h(tag), F.lit(m))  # noqa: E731

    sr_hz = (
        F.when(pick("srbad", bad_sr_mod) == 0,
               F.when(pick("srbad2", 2) == 0, F.lit(0)).otherwise(F.lit(96001)))
        .otherwise(F.element_at(F.array(F.lit(8000), F.lit(16000), F.lit(44100)), (pick("sr", 3) + 1).cast("int")))
        .cast("int")
    )
    dur_ms = (
        F.when(pick("durbad", bad_dur_mod) == 0,
               F.when(pick("durbad2", 2) == 0, F.lit(0)).otherwise(F.lit(70000)))
        .otherwise((F.lit(200) + pick("dur", 14800)))
        .cast("int")
    )
    codec = (
        F.when(pick("cbad", bad_codec_mod) == 0, F.lit("unknown"))
        .otherwise(
            F.element_at(
                F.array(*[F.lit(c) for c, _ in VALID_CODECS]), (pick("codec", 3) + 1).cast("int")
            )
        )
    )
    corrupt = pick("corrupt", corrupt_pcm_mod) == 0
    mismatch = pick("mismatch", mismatch_txt_mod) == 0
    empty_txt = pick("etxt", empty_txt_mod) == 0

    df = base.select(
        clip_id.alias("clip_id"),
        sr_hz.alias("sr_hz"),
        dur_ms.alias("dur_ms"),
        codec.alias("codec"),
        corrupt.alias("__corrupt"),
        mismatch.alias("__mismatch"),
        empty_txt.alias("__empty_txt"),
    )

    if with_audio:
        payload = audio_payload_udf(
            F.col("clip_id"), F.col("sr_hz"), F.col("dur_ms"),
            F.col("__corrupt"), F.col("__mismatch"),
        )
        df = df.withColumn("__payload", payload).select(
            "clip_id",
            F.col("__payload.bytes").alias("bytes"),
            "sr_hz", "dur_ms", "codec",
            F.when(F.col("__empty_txt"), F.lit("")).otherwise(
                F.col("__payload.transcript")
            ).alias("transcript"),
        )
    else:
        # cheap transcript: deterministic hex words (keyword predicates only;
        # the audio invariant needs with_audio=True)
        txt = F.when(F.col("__empty_txt"), F.lit("")).otherwise(
            F.sha2(F.col("clip_id"), 256)
        )
        # placeholder payload (non-null so `required` semantics match the
        # audio path; 8 bytes, negligible I/O)
        df = df.select(
            "clip_id", F.to_binary(F.substring(F.sha2(F.col("clip_id"), 256), 1, 16), F.lit("hex")).alias("bytes"),
            "sr_hz", "dur_ms", "codec", txt.alias("transcript"),
        )
    return df
