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
    Jaccard = fraction of matching signature positions.

    Shuffle shape: the band exchange carries ONLY (id, band, bucket) — the
    full k-long signatures never ride the 2*bands-way explode (at 10^12
    docs that would be ~16 KB of avoidable shuffle per doc). Signatures are
    re-joined once per side by id AFTER the candidate pairs are deduped,
    so each signature crosses the wire once per surviving pair side.

    NOTE: ``sigs`` appears in THREE subtrees of the plan (band explode +
    both re-joins); persist/checkpoint it before calling, or the signature
    UDF recomputes per subtree."""
    k = bands * rows_per_band
    banded = sigs.select(
        "id",
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
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    pairs = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(k)
    ).alias("jaccard_est")
    return pairs.select("id_a", "id_b", est).filter(F.col("jaccard_est") >= min_jaccard_est)


def simhash64_np(texts) -> np.ndarray:
    """64-bit SimHash over word-unigram hashes (pure NumPy kernel) — shared
    by the pandas UDF and by oracle builders that need the same values
    without a SparkSession."""
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
    return out


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over word-unigram hashes."""

    @F.pandas_udf(T.LongType())
    def sim_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash64_np(texts.tolist()))

    return docs.select(F.col(id_col).alias("id"), sim_udf(F.col(text_col)).alias("simhash"))


def hamming_block_pairs(
    hashes: DataFrame,
    hash_col: str,
    max_hamming: int,
    id_col: str = "id",
    n_blocks: int | None = None,
    key_blocks: int = 1,
) -> DataFrame:
    """EXACT near-dup pairs (id_a < id_b, hamming <= max_hamming) over a
    64-bit hash column, via the Manku/Jain/Sarma WWW'07 block-permutation
    scheme expressed as one Spark equi-join.

    Recall guarantee (pigeonhole): the 64 bits are split into ``n_blocks``
    contiguous blocks and every combination of ``key_blocks`` of them is
    emitted as a join key. A pair differing in <= max_hamming bits has its
    differing bits inside <= max_hamming blocks, so >= n_blocks -
    max_hamming blocks agree entirely; whenever
    ``key_blocks <= n_blocks - max_hamming`` (asserted) at least one
    emitted combination is drawn fully from agreeing blocks and the pair
    meets in the join. The popcount filter removes false candidates, so
    the output is the exact Hamming-ball pair set — no silent misses.

    Scale tuning: defaults (n_blocks = max_hamming + 1, key_blocks = 1)
    give 64/(h+1)-bit buckets — fine up to ~1e8 rows. At 10^12 rows raise
    both (e.g. n_blocks=12, key_blocks=4 -> C(12,4)=495 keys of ~21 bits)
    to trade explode factor for exponentially finer buckets; the guarantee
    holds for any key_blocks <= n_blocks - max_hamming.

    Shuffle shape: one explode -> single equi-join on (combo_id, key_hash);
    each side carries only (id, 8-byte hash, 12-byte key).
    """
    n_blocks = n_blocks or (max_hamming + key_blocks)
    if key_blocks > n_blocks - max_hamming:
        raise ValueError(
            f"no recall guarantee: key_blocks={key_blocks} > "
            f"n_blocks({n_blocks}) - max_hamming({max_hamming})"
        )
    if n_blocks > 64:
        raise ValueError("n_blocks must be <= 64 for a 64-bit hash")
    from itertools import combinations

    bounds = np.linspace(0, 64, n_blocks + 1).astype(int)
    block_vals = [
        F.shiftrightunsigned(F.col("hsh"), int(bounds[i])).bitwiseAND(
            F.lit(int((1 << int(bounds[i + 1] - bounds[i])) - 1))
        )
        for i in range(n_blocks)
    ]
    combos = list(combinations(range(n_blocks), key_blocks))
    # xxhash64 over the combo's block values: collisions only ADD candidates
    # (removed by the popcount filter), never lose true pairs
    keys = F.array(
        *[
            F.struct(
                F.lit(ci).alias("combo"),
                F.xxhash64(*[block_vals[j] for j in combo]).alias("kv"),
            )
            for ci, combo in enumerate(combos)
        ]
    )
    h = (
        hashes.select(F.col(id_col).alias("id"), F.col(hash_col).alias("hsh"))
        .select("id", "hsh", F.explode(keys).alias("bb"))
        .select("id", "hsh", F.col("bb.combo").alias("combo"), F.col("bb.kv").alias("kv"))
    )
    a = h.select(F.col("id").alias("id_a"), F.col("hsh").alias("h_a"), "combo", "kv")
    b = h.select(F.col("id").alias("id_b"), F.col("hsh").alias("h_b"), "combo", "kv")
    cand = (
        a.join(b, ["combo", "kv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming")
    return cand.select("id_a", "id_b", ham).filter(F.col("hamming") <= max_hamming)


def simhash_neardup_pairs(hashes: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — exact pair set with a
    guaranteed-recall block join (see hamming_block_pairs): max_hamming=8
    uses 9 blocks, so any pair within the radius shares a whole block."""
    return hamming_block_pairs(hashes, "simhash", max_hamming)


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


def embedding_neardup_lsh(
    emb: DataFrame,
    threshold: float = 0.99,
    n_bits: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed — the 10^12-row scale path
    that replaces embedding_neardup_pairs' all-pairs default: candidates
    are pairs sharing >=1 hyperplane-LSH band (equi-join on (band, value),
    ~n/2^band_bits per bucket), verified by exact cosine >= threshold.

    Recall: structural for EXACT duplicates (identical vectors -> identical
    sketch -> share every band) — the dominant dedup case (re-encoded /
    re-crawled items); for merely-similar vectors recall is the standard
    1-(1-p^r)^b LSH curve (measured against brute force in pytest).

    Shuffle shape mirrors minhash_lsh_pairs: the band exchange carries
    only (id, band, value); vectors re-join by id after pair dedup.
    """
    from .similarity import hyperplane_sketch

    n_bands = n_bits // band_bits
    mask = (1 << band_bits) - 1
    sk = hyperplane_sketch(emb, n_bits, id_col=id_col, vec_col=vec_col)
    banded = sk.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("sketch"), i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    a = banded.select(F.col("id").alias("id_a"), "band", "bval")
    b = banded.select(F.col("id").alias("id_b"), "band", "bval")
    pairs = (
        a.join(b, ["band", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    v = emb.select(
        F.col(id_col).alias("id"), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    pairs = pairs.join(v.select(F.col("id").alias("id_a"), F.col("v").alias("v_a")), "id_a").join(
        v.select(F.col("id").alias("id_b"), F.col("v").alias("v_b")), "id_b"
    )
    dot = F.aggregate(F.zip_with("v_a", "v_b", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("v_a", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("v_b", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return (
        pairs.withColumn("cosine", dot / (na * nb))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding",
    bucket_expr=None, allow_all_pairs: bool = False,
) -> DataFrame:
    """Near-dup pairs by embedding cosine similarity. ``bucket_expr``
    restricts the pair space (e.g. an LSH bucket or a label) and is
    REQUIRED: the all-pairs regime is O(n^2) shuffle and only sane as an
    exactness baseline on bounded inputs, so it must be opted into
    explicitly with ``allow_all_pairs=True`` (the scale path is
    embedding_neardup_lsh). The contract is mechanical, not a docstring."""
    if bucket_expr is None and not allow_all_pairs:
        raise ValueError(
            "embedding_neardup_pairs without bucket_expr is an O(n^2) cross "
            "join; pass bucket_expr=... (or allow_all_pairs=True for a "
            "bounded exact baseline, or use embedding_neardup_lsh at scale)"
        )
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
