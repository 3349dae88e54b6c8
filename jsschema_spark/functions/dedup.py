"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
and embedding-cosine near-dup.

Scale design (the whole point — 100 TB of documents):

* **Exact**: hash-groupBy on a 64-bit content fingerprint of normalized
  text. Map-side combine collapses duplicates per partition before the
  shuffle; shuffle width = #distinct fingerprints, not #rows.
* **MinHash + LSH**: shingle → one xxhash64 per shingle → K permutations
  from the arithmetic universal family (a·h+b mod 2^31−1) → per-doc minima
  via explode + codegen min-aggregates (map-side combine: one ~520B row per
  doc crosses the shuffle) → B bands of R hashes → explode bands →
  self-join on (band, band_hash). Candidate pairs only ever meet inside a
  band bucket; buckets above ``max_bucket_size`` switch to consecutive-pair
  chaining (O(n), connectivity preserved) so degenerate boilerplate buckets
  cannot go quadratic. Verification (true Jaccard) runs only on candidates,
  semi-joined before shingling.
* **SimHash**: bit-majority over token hashes via explode + codegen
  per-bit sum-aggregates. Near-dup candidates by the pigeonhole trick:
  split into C=4 16-bit chunks; hamming ≤ 3 ⇒ at least one chunk equal ⇒
  equi-join on (chunk_idx, chunk_value) with the same bucket-size cap,
  verify with bit_count(xor) ≤ 3. Again: equi-join, no cross product.
* **Embedding cosine**: random-hyperplane LSH (deterministic planes,
  seeded NumPy, shipped as literals) buckets vectors by sign pattern;
  exact cosine verifies within buckets (capped like the text buckets).
  Brute-force pairing is only for oracle tests.

Everything here is Python-free: Column/DataFrame compositions only
(whole-stage codegen + standard shuffles Catalyst can plan). Dot products
and the shingle builder intentionally stay as higher-order-function folds —
the measured alternative (dim-term unrolled expressions) was 3-4× slower
(see BENCH/BASELINE.md).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsschema_spark.functions.text import content_fingerprint, normalized_text, word_shingles


def portable_hash64(col: Column) -> Column:
    """Deterministic 60-bit hash reproducible in ANSI SQL engines
    (``('0x' || substring(md5(x),1,15))::BIGINT`` in DuckDB) — the oracle-
    parity alternative to xxhash64. Slower (md5 + string conv); use xxhash64
    on the 100 TB path."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# --------------------------------------------------------------------------
# exact dedup

def exact_duplicate_groups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    fingerprint_fn: Callable[[Column], Column] = content_fingerprint,
) -> DataFrame:
    """Groups of exact duplicates (normalized-text fingerprint collisions):
    ``fingerprint, n_docs, doc_ids`` (ids sorted; only groups with n>1).

    ``fingerprint_fn`` swaps the 64-bit xxhash64 default for e.g. an
    md5-based fingerprint when an external SQL oracle must reproduce it."""
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint_fn(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id doc per fingerprint (deterministic)."""
    from pyspark.sql import Window

    w = Window.partitionBy(content_fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


# --------------------------------------------------------------------------
# MinHash + LSH

_MAX_LONG = (1 << 63) - 1


_MERSENNE_31 = (1 << 31) - 1


def _hash_family(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal family
    ``(a·h + b) mod p``, p = 2^31−1 — same constants on every executor."""
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, _MERSENNE_31)), int(rng.integers(0, _MERSENNE_31)))
        for _ in range(num_hashes)
    ]


def minhash_signature(text: Column, num_hashes: int = 64, shingle_k: int = 3) -> Column:
    """Array of ``num_hashes`` minhash values (null for empty-shingle docs).

    ONE ``aggregate`` pass over the shingle array, folding a vector of
    ``num_hashes`` running minima — not ``num_hashes`` separate
    ``array_min(transform(...))`` scans, which would re-evaluate the shingle
    expression per hash (no CSE inside HOF lambdas).

    Each shingle string is hashed ONCE (xxhash64), then the ``num_hashes``
    permutations come from the arithmetic universal family
    ``(a_i·h + b_i) mod (2^31−1)`` — 64 multiply-adds instead of 64 separate
    string hashes per shingle (the string re-hash was most of the signature
    cost; products stay < 2^62 so ANSI long arithmetic never overflows)."""
    fam = _hash_family(num_hashes)
    sh = word_shingles(text, shingle_k)
    # hash each shingle ONCE in its own transform pass — were the xxhash64
    # inside the fold lambda below, every one of the 64 references would
    # re-hash the string (no CSE inside HOF lambdas); here `h` is a bound
    # lambda variable, so referencing it 64 times is free
    hashes = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_31)))
    init = F.array(*[F.lit(_MERSENNE_31 + 1).cast("long") for _ in range(num_hashes)])

    def perms(h: Column) -> Column:
        return F.array(
            *[F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE_31)) for a, b in fam]
        )

    sig = F.aggregate(
        hashes, init, lambda acc, h: F.zip_with(acc, perms(h), lambda a, b: F.least(a, b))
    )
    return F.when(F.element_at(sig, 1) == _MERSENNE_31 + 1, F.lit(None)).otherwise(sig)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """``(doc_id, sig)`` signatures via explode + ``num_hashes`` min
    aggregates — the whole-stage-codegen formulation of
    ``minhash_signature`` (same values).

    Catalyst does not codegen higher-order functions, so the Column-level
    fold evaluates ~num_hashes interpreted expressions per shingle (~1 ms
    per document measured). This shape keeps everything in codegen: one
    xxhash64 per shingle (CSE in the projection), 64 multiply-adds, then a
    hash aggregate whose map-side combine collapses each doc's shingles
    BEFORE the shuffle — shuffle volume is one ~520-byte row per document,
    independent of document length. ~10× faster at 5k docs; the gap widens
    with corpus size. Docs with no shingles produce no row (the Column
    version yields null)."""
    fam = _hash_family(num_hashes)
    sh = df.select(
        F.col(id_col).alias("doc_id"), word_shingles(F.col(text_col), shingle_k).alias("sh")
    )
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    h = F.pmod(F.xxhash64(F.col("s")), F.lit(_MERSENNE_31))
    proj = ex.select(
        "doc_id",
        *[
            F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE_31)).alias(f"h{i}")
            for i, (a, b) in enumerate(fam)
        ],
    )
    agg = proj.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Candidate near-dup pairs ``(id_a, id_b)`` (id_a < id_b) that share at
    least one LSH band. rows-per-band R = num_hashes/bands sets the
    sensitivity threshold ≈ (1/bands)^(1/R).

    Hot-bucket skew control: a degenerate band bucket (millions of
    boilerplate near-identical docs) would make the self-join quadratic
    *within that bucket* and melt one reducer. Buckets larger than
    ``max_bucket_size`` switch from all-pairs to **consecutive-pair
    chaining** (sorted by doc_id): O(size) pairs that preserve the
    connected-component structure dedup grouping needs — members of a
    degenerate bucket still end up transitively linked."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide into bands")
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    # multi-arg xxhash64 over the band's r signature longs — no string
    # concat materialization per band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col("sig")[b * r + j] for j in range(r)]).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_structs).alias("e")).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh")
    )
    return _bounded_self_pairs(banded, ["band", "bh"], max_bucket_size)


def _bounded_self_pairs(
    banded: DataFrame, key_cols: list[str], max_bucket_size: int,
    payload: Optional[str] = None,
) -> DataFrame:
    """Within-bucket pairing with a size cap: full all-pairs equi-join for
    buckets ≤ cap, consecutive-pair chaining (one window pass) above it.
    ``payload``: optional extra column carried onto both sides (``<p>_a`` /
    ``<p>_b``).

    Bucket sizes come from a COUNT window over the bucket key — not a
    groupBy + self-join, which would re-evaluate the (expensive) upstream
    signature computation per plan branch. The window shuffles once on the
    bucket key; every downstream branch (both join sides, the chain window)
    keeps that partitioning, so Catalyst reuses the single exchange."""
    import functools
    import operator

    from pyspark.sql import Window

    tagged = banded.withColumn(
        "__bn", F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
    )
    small = tagged.where(F.col("__bn") <= max_bucket_size).drop("__bn")
    big = tagged.where(F.col("__bn") > max_bucket_size).drop("__bn")

    pay_a = [F.col(f"a.{payload}").alias(f"{payload}_a")] if payload else []
    pay_b = [F.col(f"b.{payload}").alias(f"{payload}_b")] if payload else []
    a, b = small.alias("a"), small.alias("b")
    cond = functools.reduce(
        operator.and_, [F.col(f"a.{c}") == F.col(f"b.{c}") for c in key_cols]
    ) & (F.col("a.doc_id") < F.col("b.doc_id"))
    full = a.join(b, cond).select(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"), *pay_a, *pay_b
    )

    w = Window.partitionBy(*key_cols).orderBy("doc_id")
    prev_cols = ["doc_id"] + ([payload] if payload else [])
    chained = (
        big.withColumn("__prev", F.lag(F.struct(*prev_cols)).over(w))
        .where(F.col("__prev").isNotNull())
        .select(
            F.col("__prev.doc_id").alias("id_a"),
            F.col("doc_id").alias("id_b"),
            *([F.col(f"__prev.{payload}").alias(f"{payload}_a")] if payload else []),
            *([F.col(payload).alias(f"{payload}_b")] if payload else []),
        )
    )
    return full.unionByName(chained).distinct()


# --------------------------------------------------------------------------
# n-gram Jaccard (verification for candidates, or exact small-scale pairing)

def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,  # (id_a, id_b)
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """True n-gram Jaccard on candidate pairs: join shingle sets back to both
    sides (shuffle on doc id), compute |∩|/|∪|, filter ≥ threshold.

    The corpus is semi-joined to the candidate ids BEFORE the shingle
    projection — shingling runs on |candidates| docs, not the whole corpus
    (the candidate set is orders of magnitude smaller after LSH)."""
    cand_ids = (
        candidates.select(F.col("id_a").alias("doc_id"))
        .unionByName(candidates.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t")).join(
        cand_ids, "doc_id", "left_semi"
    )
    sh = pruned.select("doc_id", word_shingles(F.col("__t"), shingle_k).alias("sh"))
    out = (
        candidates.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.when(F.col("uni") > 0, F.col("inter") / F.col("uni")).otherwise(F.lit(0.0)),
        )
    )
    return out.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def near_duplicates_minhash(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 64, bands: int = 16, shingle_k: int = 3, threshold: float = 0.8,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → Jaccard verification."""
    cand = minhash_lsh_pairs(df, id_col, text_col, num_hashes, bands, shingle_k, max_bucket_size)
    return jaccard_pairs(df, cand, id_col, text_col, shingle_k, threshold)


# --------------------------------------------------------------------------
# SimHash

def simhash(
    text: Column,
    shingle_k: int = 1,
    n_bits: int = 64,
    hash_fn: Optional[Callable[[Column], Column]] = None,
) -> Column:
    """SimHash of the token stream (k=1: unigrams), pure Catalyst:
    per-token hash → ±1 contribution per bit → sign of the per-bit sums.

    Tokens are hashed ONCE in a ``transform`` pass, then the bit-majority
    fold runs over the hash array (Catalyst does no CSE inside HOF lambdas —
    hashing inside the fold would re-evaluate the hash per bit reference).

    ``hash_fn``/``n_bits`` default to xxhash64/64 (the scale path); pass
    ``portable_hash64``/60 when an external SQL engine must reproduce the
    values (oracle parity)."""
    units = word_shingles(text, shingle_k) if shingle_k > 1 else F.split(normalized_text(text), " ")
    hf = hash_fn or (lambda c: F.xxhash64(c))
    hashes = F.transform(units, lambda u: hf(u))

    def bit_contribs(h: Column) -> Column:
        return F.array(
            *[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
                for i in range(n_bits)
            ]
        )

    counts = F.aggregate(
        hashes,
        F.array(*[F.lit(0) for _ in range(n_bits)]),
        lambda acc, h: F.zip_with(acc, bit_contribs(h), lambda a, b: a + b),
    )
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        out = out.bitwiseOR(
            F.when(
                F.element_at(counts, i + 1) > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    return out


def simhash_values(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 1,
    n_bits: int = 64,
    hash_fn: Optional[Callable[[Column], Column]] = None,
) -> DataFrame:
    """``(doc_id, sh)`` SimHash values via explode + per-bit sum aggregates —
    the whole-stage-codegen formulation of the ``simhash`` Column (same
    values; Catalyst interprets HOF folds, see ``minhash_signatures``).
    One hash per token (CSE'd in the projection), ``n_bits`` ±1 sums with
    map-side combine, sign-pack on the aggregated row. Docs whose token
    array is null (null text) produce no row."""
    units = (
        word_shingles(F.col(text_col), shingle_k)
        if shingle_k > 1
        else F.split(normalized_text(F.col(text_col)), " ")
    )
    ex = df.select(F.col(id_col).alias("doc_id"), F.explode(units).alias("u"))
    h = (hash_fn or (lambda c: F.xxhash64(c)))(F.col("u"))
    proj = ex.select(
        "doc_id",
        *[
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias(f"b{i}")
            for i in range(n_bits)
        ],
    )
    agg = proj.groupBy("doc_id").agg(*[F.sum(f"b{i}").alias(f"b{i}") for i in range(n_bits)])
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        out = out.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select("doc_id", out.alias("sh"))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming, using the
    pigeonhole chunk join (C = max_hamming + 1 chunks ⇒ one chunk must match
    exactly). Output: id_a, id_b, hamming.

    Chunk buckets above ``max_bucket_size`` (boilerplate-heavy corpora)
    switch to consecutive-pair chaining — see ``_bounded_self_pairs``."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    sh = simhash_values(df, id_col, text_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col("sh"), c * width).bitwiseAND(F.lit((1 << width) - 1)).alias("cv"),
            )
            for c in range(n_chunks)
        ]
    )
    chunked = sh.select("doc_id", "sh", F.explode(chunks).alias("e")).select(
        "doc_id", "sh", F.col("e.chunk").alias("chunk"), F.col("e.cv").alias("cv")
    )
    pairs = _bounded_self_pairs(chunked, ["chunk", "cv"], max_bucket_size, payload="sh")
    return (
        pairs.select(
            "id_a", "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    den = _norm(a) * _norm(b)
    return F.when(den > 0, _dot(a, b) / den).otherwise(F.lit(0.0))


def hyperplane_bucket(vec: Column, dim: int, n_planes: int = 12, seed: int = 42) -> Column:
    """Sign-pattern bucket id from deterministic random hyperplanes (same
    planes on every executor — literals, no RNG state shipped)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        bit = F.when(_dot(vec, plane) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return bucket


def embedding_near_dups(
    df: DataFrame, id_col: str, vec_col: str, dim: int,
    threshold: float = 0.95, n_planes: int = 12, seed: int = 42,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold. LSH-bucketed: only vectors with
    an identical sign pattern are compared (recall grows with fewer planes;
    at 100 TB run multiple seeds and union). Buckets above
    ``max_bucket_size`` (mass-duplicated embeddings) fall back to
    consecutive-pair chaining. Output: id_a, id_b, cos."""
    emb = df.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    pairs = _bounded_self_pairs(emb, ["bucket"], max_bucket_size, payload="v")
    return (
        pairs.select("id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def embedding_brute_force_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95,
) -> DataFrame:
    """O(n²) exact pairing — oracle/testing only (the LSH path is the scale
    path; this one is a cross join)."""
    emb = df.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v"))
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
