"""Text analysis operators over the documents table — language ID,
quality scoring, token counting, fingerprinting. All pure built-in
expressions so the whole computation is one codegen'd scan; each has an
exact ANSI-SQL oracle twin in plans/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_eng_project_spark.functions.text import (
    EN_STOPWORDS,
    lang_scores,
    letter_tokens,
    padded_for_counting,
    substr_count,
    tokens,
)


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language ID: per-language marker-hit counts, argmax
    with deterministic alphabetical tie-break (equal scores → 'de' before
    'en' before … 'zh') via the greatest-struct trick: structs compare
    field by field, so (score, priority) ranks by score first and breaks
    ties on an explicit priority that DESCENDS alphabetically — greatest()
    then lands on the alphabetically-first language, matching the oracle's
    CASE scan in ascending language order."""
    scores = lang_scores(text_col)
    langs = sorted(scores)
    structs = [
        F.struct(
            scores[lang].alias("score"),
            F.lit(len(langs) - i).alias("pri"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.greatest(*structs) if len(structs) > 1 else structs[0]
    return df.select(
        F.col(id_col),
        best["lang"].alias("lang_pred"),
        F.round(best["score"], 6).alias("lang_score"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality signals: length, word count, mean word length,
    stopword ratio. Mirrors the quality-filter stage of a pretraining
    pipeline; thresholds are the caller's policy."""
    t = F.col(text_col)
    padded = padded_for_counting(t)
    # Count NON-EMPTY tokens: split('', '\\s+') yields [''], so an
    # empty/whitespace-only doc otherwise reports n_words=1 and a
    # fabricated mean_word_len — and would survive a "min 1 word"
    # filter (r5 review). Such docs report 0 words and NULL ratios.
    # Expressed WITHOUT a higher-order filter: both the guard and the
    # split run over a REGEX-trimmed column (trim() strips only ASCII
    # spaces, so 'hello\n' / '\t' would otherwise keep edge empty
    # tokens and diverge from the oracle's filtered count — r5 ADVICE).
    # After regex-trimming, \s+ tokens can only contain an empty string
    # when the whole text is empty (edge whitespace of every class is
    # gone, interior \s+ runs collapse), so the length guard is exactly
    # equivalent to the filtered count and stays in whole-stage codegen
    # (ArrayFilter is a CodegenFallback node).
    stop_hits = None
    for w in EN_STOPWORDS:
        cnt = substr_count(padded, f" {w} ")
        stop_hits = cnt if stop_hits is None else stop_hits + cnt
    # THREE-step projection, deliberately: expressions referenced from a
    # `when` branch are excluded from codegen subexpression elimination
    # (conditional evaluation), so any non-cheap expression multiply
    # referenced through `when` re-runs per reference per row — measured
    # 0.82 s vs 0.29 s at sf0.1 for this query (r5), and the r6 ADVICE
    # regex-trim reintroduced the same class (the trimmed column feeds
    # both the guard and the split: 2× regexp_replace per row, ~2× wall
    # in-bench). Each stage pins ONE evaluation; CollapseProject cannot
    # merge a stage back because its pinned column is non-cheap and
    # multi-referenced (Spark 3.3+ rule).
    pre = df.select(
        F.col(id_col),
        F.length(t).alias("n_chars_measured"),
        F.regexp_replace(t, r"(^\s+)|(\s+$)", "").alias("_rt"),
        stop_hits.alias("_stop_hits"),
    )
    rtc = F.col("_rt")
    n_words = F.when(F.length(rtc) == 0, F.lit(0)).otherwise(
        F.size(F.split(rtc, r"\s+"))
    )
    staged = pre.select(
        F.col(id_col),
        "n_chars_measured",
        n_words.alias("n_words"),
        "_stop_hits",
    )
    nw = F.col("n_words")
    return staged.select(
        F.col(id_col),
        "n_chars_measured",
        "n_words",
        F.when(nw > 0, F.round(F.col("n_chars_measured") / nw, 6)).alias(
            "mean_word_len"
        ),
        F.when(nw > 0, F.round(F.col("_stop_hits") / nw, 6)).alias(
            "stopword_ratio"
        ),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text — the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every character k-gram of the normalized text, then keep the minimum
    hash of each w-sized sliding window — a position-robust fingerprint
    set whose overlap detects partial copies, not just whole-document
    dups.

    The k-gram hash is a 16-hex-char md5 prefix compared
    *lexicographically*, so the selection is engine-independent (the
    DuckDB oracle reproduces it exactly); a rolling Rabin-Karp hash is
    the row-at-a-time formulation of the same k-gram hashing — in a
    columnar engine the grams are hashed directly, one codegen'd
    expression, no UDF. Output: (id, fps) — the sorted, deduplicated
    fingerprint array."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    grams = F.expr(
        f"transform(sequence(1, greatest(length(_t) - {k - 1}, 1)), "
        f"i -> substring(md5(substring(_t, i, {k})), 1, 16))"
    )
    wins = F.expr(
        f"transform(sequence(1, greatest(size(_hs) - {w - 1}, 1)), "
        f"i -> array_min(slice(_hs, i, {w})))"
    )
    return (
        # Spread FIRST, by hash of the id: ~1 md5 per character of text
        # is heavy per-row work, and with the exchange above any of it a
        # single-split input file pins that work to one task (no-op at
        # lake scale, decisive on local small files). Hashing the id
        # skips the whole-input local sort a keyless round-robin
        # repartition pays (sortBeforeRepartition), and placing the
        # regexp normalization AFTER the exchange parallelizes it too
        # (r12: both previously ran in the scan task).
        df.select(F.col(id_col), F.col(text_col))
        .repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))
        .select(F.col(id_col), norm.alias("_t"))
        .select(F.col(id_col), grams.alias("_hs"))
        .select(F.col(id_col), F.array_sort(F.array_distinct(wins)).alias("fps"))
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF.

    Distributed shape (the classic two-aggregation corpus statistic):
    tokenize → explode → (doc, term) counts [shuffle 1] → term document
    frequencies from the tf relation [shuffle 2, vocabulary-sized] →
    idf joined back (vocabulary is orders smaller than the corpus, so
    AQE broadcasts it) → per-doc top-k window. Corpus size N rides in
    as a broadcast one-row aggregate, never a driver-side collect.

    Determinism for cross-engine parity: tf and df are integers, idf is
    ln((N+1)/(df+1)) computed in double from those integers — identical
    on any IEEE-754 engine — and the top-k window breaks tfidf ties on
    the term string.
    """
    toks = df.select(
        F.col(id_col), F.explode(letter_tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("_tfidf").desc(), F.col("term"))
    return (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "_tfidf",
            F.col("tf")
            * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col(id_col),
            "term",
            F.round("_tfidf", 6).alias("tfidf"),
        )
    )


def kmv_distinct_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 3,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count sketch per source: estimate the
    number of distinct n-gram shingles from only the k smallest md5
    values (Beyer et al. 2007, "On Synopses for Distinct-Value Estimation
    Under Multiset Operations": D̂ = (k−1)/U_(k) with U_(k) the k-th
    smallest hash normalized to [0,1]).

    Unlike the HLL/MinHash family (rows-only in the driver check — seeded
    xxhash64 has no cross-engine twin), this sketch is BIT-REPRODUCIBLE:
    md5 is identical in every engine and the estimator is closed-form
    arithmetic on the k-th hash, so the estimate itself carries a DuckDB
    oracle. Exact distinct count and relative error ride along for
    honesty.

    Scale: distinct (source, shingle) is one word-count-shaped shuffle.
    The k-th-minimum extraction is written as ``rank ≤ k`` THEN pick
    rank = k, not ``max(when(rank == k))`` over the full ranked stream:
    the ≤-form compiles to partial + final WindowGroupLimitExec (each
    input partition forwards only its own k smallest hashes per
    source), so the per-source sort never sees more than k·partitions
    rows — a rank-equality predicate alone defeats that rewrite and
    funnels every source's full distinct-shingle set through one task
    (r6 self-review; plan-gated). The exact distinct count moves to a
    plain partial-aggregable groupBy joined back on the source
    dimension.
    """
    from pyspark.sql import Window

    from data_eng_project_spark.functions.text import shingles_from_tokens

    toks = docs.select(
        F.col(source_col).alias("source"), tokens(text_col).alias("_toks")
    )
    sh = (
        toks.select(
            "source", F.explode(shingles_from_tokens("_toks", n)).alias("shingle")
        )
        .distinct()
        .select("source", F.md5("shingle").alias("h"))
        # Two consumers (exact count + k-th minimum) share the
        # distinct's shuffle output via AQE ReusedExchange (verified in
        # the executed plan) — the tokenize/distinct lineage runs once
        # with no checkpoint materialization.
    )
    counts = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact_distinct")
    )
    w = Window.partitionBy("source").orderBy("h")
    kth = (
        sh.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .groupBy("source")
        .agg(F.max(F.when(F.col("rk") == k, F.col("h"))).alias("_kth"))
    )
    per_source = counts.join(kth, "source")
    # greatest(u, 1): a k-th hash whose first 8 hex digits are all zero
    # would make U_(k) = 0 and the estimate divide to NULL; clamping to
    # the smallest representable prefix caps the estimate at (k-1)·2^32
    # instead (r5 review). Probability ~k/2^32 per source, but a NULL
    # estimate is a contract violation when it fires.
    u = F.greatest(
        F.conv(F.substring("_kth", 1, 8), 16, 10).cast("bigint"), F.lit(1)
    )
    est = F.when(
        F.col("_kth").isNull(), F.col("n_exact_distinct").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (u.cast("double") / F.lit(float(1 << 32)))
    )
    return per_source.select(
        "source",
        "n_exact_distinct",
        F.round(est, 6).alias("kmv_estimate"),
        F.round(
            (est - F.col("n_exact_distinct")) / F.col("n_exact_distinct"), 6
        ).alias("rel_error"),
    )


def kmv_source_similarity(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 3,
    k: int = 64,
) -> DataFrame:
    """Cross-source shingle-set Jaccard, twice: exact, and estimated from
    per-source KMV sketches (the k smallest md5 values). The estimator is
    the classic one — of the k minima of A∪B, the fraction present in
    both A's and B's sketches (Beyer et al. 2007 §5; also the theta-
    sketch set-operation rule).

    Why it matters at 100 TB: the SKETCHES ARE MERGEABLE STATE. Each
    ingest partition contributes its k minima; union-merging sketches
    commutes with corpus union (same algebra as the rollup state in
    operators/temporal.py), so cross-source similarity runs on k·sources
    rows without ever joining the full shingle sets — the exact twin here
    exists to measure the estimator, not to run at scale.

    Everything is md5-ordered, so both the sketch and the estimate are
    bit-reproducible cross-engine (oracle-backed), unlike seeded-hash
    MinHash.
    """
    from pyspark.sql import Window

    from data_eng_project_spark.functions.text import shingles_from_tokens

    toks = docs.select(
        F.col(source_col).alias("source"), tokens(text_col).alias("_toks")
    )
    sh = (
        toks.select(
            "source", F.explode(shingles_from_tokens("_toks", n)).alias("shingle")
        )
        .distinct()
        .select("source", F.md5("shingle").alias("h"))
    )
    w = Window.partitionBy("source").orderBy("h")
    sketch = sh.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)

    # Exact pairwise Jaccard from the full distinct sets (the measuring
    # stick — inverted-index equi-join, never all-pairs of shingles).
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("_n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), on="h")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    exact = (
        inter.join(sizes.select(F.col("source").alias("source_a"), F.col("_n").alias("_na")), "source_a")
        .join(sizes.select(F.col("source").alias("source_b"), F.col("_n").alias("_nb")), "source_b")
        .select(
            "source_a",
            "source_b",
            F.round(F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")), 6).alias(
                "exact_jaccard"
            ),
        )
    )

    # Estimate from sketches only: k minima of the pair's hash union,
    # counted for membership in both sketches.
    sa = sketch.select(F.col("source").alias("source_a"), "h")
    sb = sketch.select(F.col("source").alias("source_b"), "h")
    pair_hashes = (
        sa.join(sb.select("source_b").distinct())
        .filter(F.col("source_a") < F.col("source_b"))
        .select("source_a", "source_b", "h")
        .unionByName(
            sb.join(sa.select("source_a").distinct())
            .filter(F.col("source_a") < F.col("source_b"))
            .select("source_a", "source_b", "h")
        )
        .distinct()
    )
    wp = Window.partitionBy("source_a", "source_b").orderBy("h")
    union_k = pair_hashes.withColumn("urk", F.row_number().over(wp)).filter(
        F.col("urk") <= k
    )
    # Estimator denominator is min(k, |K(A)∪K(B)|) — the number of union
    # minima the sketches actually hold (Beyer et al. §5), NOT the fixed
    # k: dividing by k underestimates whenever the pair's union has
    # fewer than k hashes (two identical 10-shingle sources came out at
    # 10/64 instead of 1.0 — r5 review). LEFT membership joins keep the
    # union count and the in-both count in one aggregate.
    marked = (
        union_k.join(
            sa.withColumn("_ina", F.lit(1)), on=["source_a", "h"], how="left"
        )
        .join(sb.withColumn("_inb", F.lit(1)), on=["source_b", "h"], how="left")
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("_uk"),
            F.sum(
                F.when(
                    F.col("_ina").isNotNull() & F.col("_inb").isNotNull(), 1
                ).otherwise(0)
            ).alias("_both"),
        )
    )
    est = marked.select(
        "source_a",
        "source_b",
        F.round(
            F.col("_both").cast("double")
            / F.least(F.lit(k), F.col("_uk")).cast("double"),
            6,
        ).alias("kmv_jaccard"),
    )
    return (
        exact.join(est, on=["source_a", "source_b"], how="left")
        .select(
            "source_a",
            "source_b",
            "exact_jaccard",
            F.coalesce("kmv_jaccard", F.lit(0.0)).alias("kmv_jaccard"),
            F.round(
                F.coalesce(F.col("kmv_jaccard"), F.lit(0.0)) - F.col("exact_jaccard"),
                6,
            ).alias("est_error"),
        )
    )


def cms_term_count_estimates(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 512,
    top_k: int = 20,
) -> DataFrame:
    """Count-min sketch over corpus term frequencies (Cormode &
    Muthukrishnan 2005), evaluated against exact counts for the top-k
    terms: estimate(t) = min over d hash rows of the (row, bucket) cell,
    which can only OVER-estimate (collisions add, never subtract) — the
    reported error is always ≥ 0 and bounded by ~2N/width w.h.p.

    Third member of the reproducible-sketch family (with KMV distinct
    and KMV Jaccard): bucket hashes are md5(row_salt || term) — identical
    in every engine — so the sketch CELLS and the estimates are
    bit-reproducible and oracle-checkable, unlike seeded-xxhash sketches.

    Scale: ONE corpus scan total — terms reduce to vocabulary-sized
    (term, count) rows first, and both the sketch cells (bucket sums of
    term counts) and the exact top-k derive from that aggregate; the
    earlier form re-tokenized the corpus once per hash row (depth+1
    scans — r5 review). The sketch itself is depth·width cells
    (mergeable across partitions/batches by cell-wise addition, same
    algebra as the rollup state).
    """
    terms = docs.select(F.explode(letter_tokens(text_col)).alias("term"))

    def bucket(row: int, term_col) -> "F.Column":
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"r{row}:"), term_col)), 1, 8), 16, 10
        ).cast("bigint")
        return (h % width).cast("int")

    term_counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    pairs = term_counts.select(
        "n_exact",
        F.posexplode(
            F.array(*[bucket(j, F.col("term")) for j in range(depth)])
        ).alias("row", "bucket"),
    )
    cms = pairs.groupBy("row", "bucket").agg(F.sum("n_exact").alias("cell"))

    exact = term_counts.orderBy(
        F.col("n_exact").desc(), F.col("term").asc()
    ).limit(top_k)
    probes = exact
    for j in range(depth):
        probes = probes.withColumn(f"_b{j}", bucket(j, F.col("term")))
    est = probes
    for j in range(depth):
        est = est.join(
            F.broadcast(
                cms.filter(F.col("row") == j).select(
                    F.col("bucket").alias(f"_b{j}"), F.col("cell").alias(f"_c{j}")
                )
            ),
            on=f"_b{j}",
        )
    estimate = F.least(*[F.col(f"_c{j}") for j in range(depth)])
    return est.select(
        "term",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        estimate.cast("bigint").alias("cms_estimate"),
        (estimate - F.col("n_exact")).cast("bigint").alias("overcount"),
    )


def feature_hash_doc_vectors(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Hashing-trick document vectors (Weinberger et al. 2009, "Feature
    Hashing for Large Scale Multitask Learning"): each term maps to a
    bucket h(t) mod dim with sign from a second hash bit, and the doc
    vector is the signed term-count sum per bucket — the vocabulary-free
    featurizer that needs no fitted dictionary, so it parallelizes
    embarrassingly and never ships a vocab to executors.

    Cross-engine reproducible (md5 bucket + md5-derived sign ⇒ exact
    integer weights), emitted as exploded (doc, dim_idx, weight) rows —
    the sparse form downstream linear models consume. One word-count-
    shaped aggregate; zero-weight buckets are omitted (sparse contract).
    """
    terms = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(letter_tokens(text_col)).alias("term"),
    )
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("bigint")
    bucket = (h % dim).cast("int")
    # Sign from an independent hash region: 9th hex digit's low bit.
    sign_bit = F.conv(F.substring(F.md5(F.col("term")), 9, 1), 16, 10).cast("int") % 2
    weight = F.when(sign_bit == 1, F.lit(1)).otherwise(F.lit(-1))
    return (
        terms.select("_id", bucket.alias("dim_idx"), weight.alias("_w"))
        .groupBy("_id", "dim_idx")
        .agg(F.sum("_w").cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
        .select(F.col("_id").alias(id_col), "dim_idx", "weight")
    )


def phrase_occurrences(
    docs: DataFrame,
    phrase: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search via a positional inverted index — the
    scalable form of ``text LIKE '%w0 w1%'``: explode (doc, position,
    token) once, keep only postings for the phrase's tokens (a selective
    filter that at 100 TB would be an index lookup, not a scan), then
    self-join adjacent positions. Cost is driven by the phrase tokens'
    posting lists, never the corpus; overlapping occurrences (e.g. 'w w
    w' for phrase 'w w') are counted correctly, which substring-replace
    counting gets wrong. Matching is case-insensitive (document tokens
    are lowercased, and the phrase is lowercased to match — a raw
    uppercase phrase word would otherwise silently match nothing).
    Returns (doc_id, n_occurrences ≥ 1)."""
    if not phrase:
        raise ValueError("phrase must contain at least one token")
    phrase = tuple(w.lower() for w in phrase)
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    first = phrase[0]
    out = toks.filter(F.col("tok") == first).select("_id", F.col("pos").alias("p0"))
    for k, w in enumerate(phrase[1:], start=1):
        nxt = toks.filter(F.col("tok") == w).select(
            F.col("_id").alias("_idr"), (F.col("pos") - k).alias("p0r")
        )
        out = out.join(
            nxt,
            (out["_id"] == nxt["_idr"]) & (out["p0"] == nxt["p0r"]),
        ).select("_id", "p0")
    return (
        out.groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .select(F.col("_id").alias(id_col), "n_occurrences")
    )


def compression_ratio_signal(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Entropy-proxy quality signal: per-document zlib compression
    ratio (compressed/raw bytes). Highly repetitive machine-generated
    text compresses far below natural prose, and high-entropy noise
    barely compresses at all — so both tails of the ratio are removal
    candidates (the signal behind Gopher-style 'compressible ≠
    natural' screens). Deterministic (fixed zlib level 6), Arrow-
    batched mapInPandas — the one stage where Python is honest, since
    no SQL engine exposes a codec. Flags: too_repetitive (< 0.25),
    too_random (> 0.85)."""
    import pandas as pd
    import zlib

    def batches(it):
        for pdf in it:
            ids, raws, comps = [], [], []
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                b = (txt or "").encode("utf-8")
                ids.append(doc_id)
                raws.append(len(b))
                comps.append(len(zlib.compress(b, 6)))
            out = pd.DataFrame(
                {id_col: ids, "raw_bytes": raws, "compressed_bytes": comps}
            )
            yield out

    # The id column round-trips with the CALLER's name and type (the
    # linalg.project rule — a hardcoded 'doc_id long' broke string ids).
    id_type = docs.schema[id_col].dataType.simpleString()
    stats = docs.select(id_col, text_col).mapInPandas(
        batches,
        schema=f"{id_col} {id_type}, raw_bytes long, compressed_bytes long",
    )
    ratio = F.when(
        F.col("raw_bytes") > 0,
        F.round(F.col("compressed_bytes") / F.col("raw_bytes"), 6),
    ).otherwise(F.lit(None))
    return stats.select(
        id_col,
        "raw_bytes",
        "compressed_bytes",
        ratio.alias("compression_ratio"),
        (ratio < 0.25).alias("too_repetitive"),
        (ratio > 0.85).alias("too_random"),
    )


def compression_roundtrip_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Driver-gradeable integrity contract for the zlib quality signal
    (the bpe_roundtrip_report pattern): one row —

    - ``n_docs`` / ``total_raw_bytes``: recomputed independently by the
      SQL oracle (count and summed UTF-8 byte length of the corpus).
    - ``all_roundtrip``: ``zlib.decompress(zlib.compress(b)) == b`` for
      every document's UTF-8 bytes — losslessness is an invariant of
      the codec, so FALSE means a real defect in the signal path
      (encoding drift, truncation, level mismatch), not noise.
    - ``corpus_compresses``: the corpus-total compressed size is below
      the raw size — natural-language corpora compress; a FALSE says
      the signal the ratio screen ranks on has stopped carrying
      information (e.g. bytes already compressed or encrypted).

    Compressed sizes stay data-dependent (why compression_quality_signal
    is rows-only); this report grades the CODEC PATH against
    data-independent invariants plus SQL-recomputed corpus totals.
    Scale shape: one mapInPandas pass emitting 4 counters per Arrow
    batch, then a 1-row sum — map-side combinable, nothing corpus-sized
    moves."""
    import zlib

    import pandas as pd

    def batches(it):
        for pdf in it:
            n_docs = raw = comp = n_bad = 0
            for txt in pdf[text_col]:
                b = (txt or "").encode("utf-8")
                z = zlib.compress(b, level)
                n_docs += 1
                raw += len(b)
                comp += len(z)
                if zlib.decompress(z) != b:
                    n_bad += 1
            yield pd.DataFrame(
                {
                    "n_docs": [n_docs],
                    "raw": [raw],
                    "comp": [comp],
                    "n_bad": [n_bad],
                }
            )

    partials = docs.select(id_col, text_col).mapInPandas(
        batches, schema="n_docs long, raw long, comp long, n_bad long"
    )
    # Coalesce: an EMPTY corpus yields zero partial rows — report 0/0
    # and vacuously-true contracts instead of a NULL row (an empty
    # corpus trivially "compresses": 0 < 0 is false, so the boolean
    # ORs in the emptiness case explicitly).
    return partials.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("raw"), F.lit(0)).cast("bigint").alias("total_raw_bytes"),
        (F.coalesce(F.sum("n_bad"), F.lit(0)) == 0).alias("all_roundtrip"),
        (
            (F.coalesce(F.sum("comp"), F.lit(0)) < F.coalesce(F.sum("raw"), F.lit(0)))
            | (F.coalesce(F.sum("n_docs"), F.lit(0)) == 0)
        ).alias("corpus_compresses"),
    )
