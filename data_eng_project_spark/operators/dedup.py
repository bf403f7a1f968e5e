"""Deduplication family for large-scale document corpora.

Five strategies, each a pure DataFrame composition designed to scale:

- exact_dedup          : content-hash groupBy (one shuffle on the hash)
- ngram_jaccard_pairs  : exact n-gram Jaccard via token-inverted-index
                         self-join (no cross join — candidates only come
                         from shared shingles)
- minhash_lsh_pairs    : MinHash signatures + LSH banding; candidate pairs
                         from band-bucket equi-join, verified with exact
                         Jaccard. The scale path: cost ~ O(docs × k) +
                         bucket-local pairs instead of O(docs²).
- simhash_pairs        : 64-bit SimHash + band-join on 16-bit quarters
                         (any pair with Hamming distance ≤ 3 shares at
                         least one exact quarter — pigeonhole), verified
                         by exact Hamming distance.
- embedding_dup_pairs  : see operators/similarity.py (cosine threshold).

Everything is built-in expressions (xxhash64, transform, aggregate,
explode) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_eng_project_spark.functions.text import tokens, word_shingles


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups by md5(text); keeps the smallest id as the
    canonical representative (deterministic first-wins)."""
    h = F.md5(F.col(text_col))
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _distinct_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle) distinct pairs — the inverted-index building block."""
    return (
        df.select(F.col(id_col).alias("_id"), word_shingles(text_col, n).alias("_sh"))
        .select("_id", F.explode("_sh").alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard similarity for all pairs sharing ≥1
    shingle. Inverted-index formulation: explode to (id, shingle), self
    equi-join on shingle (id1 < id2), count intersections, then
    |A∪B| = |A|+|B|-|A∩B|. The equi-join on shingle is the candidate
    pruner — disjoint documents never meet.

    Returns (id_a, id_b, jaccard) with jaccard rounded to 6 dp.
    """
    sh = _distinct_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col("_id").alias("id_a"), "shingle")
    b = sh.select(F.col("_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"_id": "id_a", "_n": "_na"}), on="id_a")
        .join(sizes.withColumnsRenamed({"_id": "id_b", "_n": "_nb"}), on="id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 64, shingle_n: int = 3
) -> DataFrame:
    """(id, array<long> signature): sig[i] = min over shingles of
    xxhash64(i, shingle). One shuffle (groupBy id); signature computation
    is a JVM-side min-aggregate per seed."""
    sh = _distinct_shingles(df, text_col, id_col, shingle_n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    wide = sh.groupBy("_id").agg(*aggs)
    return wide.select(
        F.col("_id").alias("id"),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified with exact Jaccard.

    Pipeline: signatures → slice into ``bands`` bands of r = k/bands rows
    → band-hash → equi-join on (band, hash) for candidates → exact
    n-gram Jaccard on the candidates only. At 100 TB the band-bucket join
    replaces the all-pairs comparison; bucket skew (boilerplate shingles)
    is handled by AQE skew-join.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_rows = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("signature", b * r + j + 1) for j in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    cand = (
        band_rows.alias("x")
        .join(band_rows.alias("y"), on=["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # Exact verification pass on candidates only.
    sh = _distinct_shingles(df, text_col, id_col, shingle_n)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col("_id").alias("id_a"), "shingle")
    b = sh.select(F.col("_id").alias("id_b"), "shingle")
    inter = (
        cand.join(a, on="id_a")
        .join(b, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"_id": "id_a", "_n": "_na"}), on="id_a")
        .join(sizes.withColumnsRenamed({"_id": "id_b", "_n": "_nb"}), on="id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """(id, simhash long): sign-aggregated token-hash bits.

    Implementation: explode tokens, one xxhash64 per token, then ``bits``
    conditional-sum aggregates (+1/-1 per bit) and bit reassembly. The
    wide agg stays in one shuffle; 64 sums per group is cheap for codegen.
    """
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
    )
    sums = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"_b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return sums.select("id", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit fingerprint into 4 16-bit
    quarters; any pair within Hamming distance 3 agrees exactly on ≥1
    quarter (pigeonhole), so an equi-join per quarter finds all of them.
    Verification: exact popcount via bit_count.
    """
    fp = simhash(df, text_col, id_col)
    quarters = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright(F.col("simhash"), q * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("qv"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("s"),
    ).select("id", "simhash", "s.q", "s.qv")
    cand = (
        quarters.alias("x")
        .join(quarters.alias("y"), on=["q", "qv"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("x.simhash").alias("sim_a"),
            F.col("y.id").alias("id_b"),
            F.col("y.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
