"""Deduplication operators over the documents table.

Exact (hash groupBy), MinHash+LSH, SimHash, and n-gram Jaccard — the
training-data-pipeline staples. All signature computation is Arrow-batched
(pandas UDFs over NumPy); candidate generation is a band-bucket equi-join
(shuffle on short band keys only, never on document text); verification
re-joins text by doc id.

Scale notes: at 10^12 docs the LSH band join is the standard shape —
signatures are ~K*8 bytes/doc, bands hash-partition evenly (band-id salt
included in the key), and the verify join touches only candidate pairs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash_u64(a: np.ndarray) -> np.ndarray:
    z = a.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _h64(s: str) -> int:
    """Stable 64-bit string hash at C speed (blake2b; PYTHONHASHSEED-proof)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingles -> unique uint64 hashes."""
    words = text.split()
    if len(words) < n:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.unique(np.fromiter((_h64(g) for g in grams), dtype=np.uint64, count=len(grams)))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash: keeper = min id per hash group."""
    h = F.md5(F.col(text_col))
    return (
        docs.groupBy(h.alias("content_hash"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(
    docs: DataFrame, k: int = 64, shingle_n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(id, sig: array<long>) — k-permutation MinHash via the standard
    (a*x+b) mod p universal-hash family, vectorized over shingles."""
    rng = np.random.Generator(np.random.PCG64(1234))
    P = np.uint64((1 << 61) - 1)
    A = rng.integers(1, 1 << 60, size=k, dtype=np.uint64) | np.uint64(1)
    B = rng.integers(0, 1 << 60, size=k, dtype=np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _shingle_hashes(t or "", shingle_n)
            vals = (A[None, :] * (sh[:, None] % P) + B[None, :]) % P
            out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("id"), sig_udf(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4, min_jaccard_est: float = 0.0
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded LSH + estimated
    Jaccard = fraction of matching signature positions."""
    k = bands * rows_per_band
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.col("sig")[b * rows_per_band + r].cast("string")
                                       for r in range(rows_per_band)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bucket"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bucket"
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(k)
    ).alias("jaccard_est")
    return pairs.select("id_a", "id_b", est).filter(F.col("jaccard_est") >= min_jaccard_est)


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over word-unigram hashes."""

    @F.pandas_udf(T.LongType())
    def sim_udf(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        bitpos = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            words = (t or "").split()
            if not words:
                out[i] = 0
                continue
            hs = np.fromiter((_h64(w) for w in words), dtype=np.uint64, count=len(words))
            bits = (hs[:, None] >> bitpos[None, :]) & np.uint64(1)
            votes = bits.sum(axis=0) * 2 - len(words)
            sh = np.uint64(0)
            for bp in np.nonzero(votes > 0)[0]:
                sh |= np.uint64(1) << np.uint64(bp)
            out[i] = np.int64(sh)
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("id"), sim_udf(F.col(text_col)).alias("simhash"))


def simhash_neardup_pairs(hashes: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash: 4-block band join (pigeonhole: hamming<=8
    with 4 16-bit blocks guarantees >=1 identical block iff hamming<=... we
    use blocks as recall-oriented candidates, then exact popcount filter)."""
    blocks = [
        (F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))).alias(f"b{i}")
        for i in range(4)
    ]
    h = hashes.select("id", "simhash", *blocks)
    cand = None
    for i in range(4):
        a = h.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), F.col(f"b{i}").alias("blk"))
        b = h.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), F.col(f"b{i}").alias("blk"))
        p = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b", "sh_a", "sh_b")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    return cand.select("id_a", "id_b", ham).filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    docs: DataFrame, candidates: DataFrame, shingle_n: int = 3, min_jaccard: float = 0.7,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate (id_a, id_b) pairs:
    re-join text by id, compute true shingle-set Jaccard in a vectorized
    kernel. The verify step of the MinHash pipeline."""
    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    joined = (
        candidates.join(d.withColumnRenamed("id", "id_a").withColumnRenamed("txt", "txt_a"), "id_a")
        .join(d.withColumnRenamed("id", "id_b").withColumnRenamed("txt", "txt_b"), "id_b")
    )

    @F.pandas_udf(T.DoubleType())
    def jac_udf(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i in range(len(ta)):
            sa = _shingle_hashes(ta.iloc[i] or "", shingle_n)
            sb = _shingle_hashes(tb.iloc[i] or "", shingle_n)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            out[i] = inter / union if union else 1.0
        return pd.Series(out)

    return (
        joined.withColumn("jaccard", jac_udf("txt_a", "txt_b"))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding",
    bucket_expr=None,
) -> DataFrame:
    """Near-dup pairs by embedding cosine similarity. ``bucket_expr``
    restricts the pair space (e.g. an LSH bucket or a label); default
    all-pairs (small inputs only — callers at scale pass a bucket)."""
    e = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        (bucket_expr if bucket_expr is not None else F.lit(0)).alias("bkt"),
    )
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "bkt")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "bkt")
    dot = F.aggregate(F.zip_with("v_a", "v_b", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform("v_a", lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform("v_b", lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return (
        a.join(b, "bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (na * nb))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
