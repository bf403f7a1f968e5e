"""BPE tokenizer: driver-side fit on the distributed word-frequency
statistic, distributed encode, exact pure-Python-twin parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_eng_project_spark.operators.tokenizer import (
    EOW,
    adjacent_pair_counts,
    bpe_encode_stats,
    bpe_fit,
    bpe_fit_distributed,
    encode_word,
    word_frequencies,
)
from data_eng_project_spark.tables import load_table

TOY = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_fit_classic_toy_corpus():
    """Sennrich et al.'s canonical example: with EOW, 'est</w>' forms
    early because 'newest'+'widest' dominate."""
    merges = bpe_fit(TOY, n_merges=4, eow=True)
    assert merges[0] == ("e", "s")  # 9 occurrences of 'es'
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    # deterministic: same input -> same merges
    assert merges == bpe_fit(TOY, n_merges=4, eow=True)


def test_encode_word_applies_merges_in_rank_order():
    merges = bpe_fit(TOY, n_merges=6, eow=True)
    ranks = {p: i for i, p in enumerate(merges)}
    pieces = encode_word("newest", ranks, eow=True)
    assert "".join(pieces) == "newest" + EOW
    assert any("est" in p for p in pieces)
    # unseen characters survive as singletons
    assert encode_word("zq", {}, eow=False) == ["z", "q"]


def test_first_merge_matches_distributed_pair_counts(spark, sf_dir):
    """The fit's first merge must be the argmax of the distributed
    pair-count statistic — for BOTH eow variants, ties broken
    identically. (eow=True is the default pair the real fit consumes:
    it includes (char, '</w>') pairs and 1-letter words.)"""
    docs = load_table(spark, sf_dir, "documents")
    wf = [
        (r["word"], r["freq"])
        for r in word_frequencies(docs).collect()
    ]
    for eow in (True, False):
        top = (
            adjacent_pair_counts(docs, eow=eow)
            .orderBy(F.col("pair_count").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .collect()[0]
        )
        merges = bpe_fit(wf, n_merges=1, eow=eow)
        assert merges[0] == (top["lhs"], top["rhs"]), f"eow={eow}"


def test_pair_counts_eow_includes_end_of_word_pairs(spark):
    """A 1-letter word contributes its (char, EOW) pair; raw-char pairs
    are unchanged between the two variants."""
    docs = spark.createDataFrame(
        [(1, "a ab"), (2, "ab")], ["doc_id", "text"]
    )
    with_eow = {
        (r["lhs"], r["rhs"]): r["pair_count"]
        for r in adjacent_pair_counts(docs, eow=True).collect()
    }
    # words: 'a'×1, 'ab'×2 → pairs: ('a','b')×2, ('b',EOW)×2, ('a',EOW)×1
    assert with_eow == {("a", "b"): 2, ("b", EOW): 2, ("a", EOW): 1}
    without = {
        (r["lhs"], r["rhs"]): r["pair_count"]
        for r in adjacent_pair_counts(docs, eow=False).collect()
    }
    assert without == {("a", "b"): 2}


def test_distributed_encode_matches_pure_python_twin(spark, sf_dir):
    """Spark mapInPandas encode == pure-Python encode, every doc."""
    import re

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_fit_distributed(docs, n_merges=50, max_words=5000)
    ranks = {p: i for i, p in enumerate(merges)}

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_uncompressed_words"])
        for r in bpe_encode_stats(docs, merges).collect()
    }
    word_re = re.compile(r"[a-z]+")
    for row in docs.select("doc_id", "text").collect():
        words = word_re.findall((row["text"] or "").lower())
        n_tok = sum(len(encode_word(w, ranks)) for w in words)
        n_sing = sum(
            1
            for w in words
            if len(w) > 1 and len(encode_word(w, ranks)) == len(w) + 1
        )
        assert got[row["doc_id"]] == (len(words), n_tok, n_sing)


def test_encode_compresses_corpus(spark, sf_dir):
    """A 200-merge vocab must compress: mean tokens-per-word strictly
    below chars-per-word+EOW (i.e. merges actually fire corpus-wide)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_fit_distributed(docs, n_merges=200, max_words=20000)
    stats = bpe_encode_stats(docs, merges)
    agg = stats.agg(
        F.sum("n_bpe_tokens").alias("tok"),
        F.sum("n_words").alias("w"),
        F.sum("n_uncompressed_words").alias("sing"),
    ).collect()[0]
    assert agg["tok"] < 4.0 * agg["w"]  # far below raw chars+EOW
    assert agg["sing"] < 0.2 * agg["w"]  # vocab covers the corpus


def test_bpe_encode_reconstruction_property():
    """Property (r5 review): for ANY fitted merge table, encoding is a
    segmentation — the pieces of every word concatenate back to exactly
    word+EOW (no characters lost, duplicated, or reordered), and piece
    count is in [1, len(word)+1]."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcd", min_size=1, max_size=10)

    @given(st.lists(st.tuples(word, st.integers(1, 50)), min_size=1, max_size=30))
    @settings(max_examples=50, deadline=None)
    def check(freqs):
        from data_eng_project_spark.operators.tokenizer import (
            EOW,
            bpe_fit,
            encode_word,
        )

        merges = bpe_fit(freqs, n_merges=20)
        ranks = {p: i for i, p in enumerate(merges)}
        for w, _ in freqs:
            pieces = encode_word(w, ranks)
            assert "".join(pieces) == w + EOW
            assert 1 <= len(pieces) <= len(w) + 1

    check()
