"""Subword tokenization for training-data pipelines: BPE merge-table
fitting and distributed encoding.

The reference has no tokenizer (its ETL is row-level pandas —
``dags/global_dag.py`` never tokenizes); this family exists for the
training-data-pipeline mandate: token budgets, mixture weights, and
sequence packing all consume subword counts, and the regex proxy in
``plans/textdata.token_counts`` only approximates them.

Scale split (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — the classic BPE algorithm):

- **Fitting** needs only the word-frequency table, never the corpus:
  ``word_frequencies`` is one distributed groupBy whose output is
  vocabulary-sized (Heaps' law — ~10^6 rows at 100 TB, not 10^12), so a
  top-``max_words`` slice collects to the driver and the greedy
  merge loop runs in pure Python there. This mirrors the IVF pattern
  (operators/similarity.py: fit on a bounded sample/statistic, apply
  distributed) — the merge loop is inherently sequential (merge i+1
  depends on i), so distributing it buys nothing, while the statistic
  it consumes is exactly aggregable.
- **Encoding** is embarrassingly parallel: the merge table broadcasts
  (a few thousand string pairs) and each executor encodes its Arrow
  batch in numpy/python with a per-batch word→pieces memo — by Zipf's
  law the memo hits >95% of word occurrences, so the amortized cost per
  token is a dict lookup, not a merge scan.

The one distributed step *inside* training — counting adjacent-pair
frequencies over the weighted vocabulary — is also exposed as a
DataFrame program (``adjacent_pair_counts``, including the EOW symbol
when ``eow=True`` so it is the very statistic ``bpe_fit``'s first merge
round maximizes over) with an exact SQL twin, so the driver's DuckDB
oracle certifies the statistic the Python loop consumes
(plans/tokenize.py::bpe_pair_counts).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, freq) over lowercased letter-runs — the sufficient
    statistic for BPE fitting. One explode + one groupBy shuffle; output
    is vocabulary-sized."""
    return (
        docs.select(
            F.explode(
                F.expr(f"filter(split(lower({text_col}), '[^a-z]+'), x -> x <> '')")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def adjacent_pair_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    eow: bool = True,
) -> DataFrame:
    """Corpus-wide adjacent symbol-pair counts weighted by word
    frequency — one full iteration of the BPE training statistic, as a
    DataFrame program (explode positions, no Python).

    ``eow`` must match the ``bpe_fit`` call this statistic certifies
    (both default True): with EOW each word's symbols are its chars plus
    '</w>', so a word of length L contributes L pairs per occurrence —
    including (last_char, '</w>') and the single (char, '</w>') pair of
    a 1-letter word — exactly the first-iteration counts the greedy fit
    maximizes over. (With eow=False, L−1 raw character pairs and
    1-letter words contribute nothing.) A word like 'aaa' contributes
    ('a','a') twice per occurrence either way.
    """
    wf = word_frequencies(docs, text_col, id_col)
    if eow:
        pos = wf.select(
            "word", "freq",
            F.explode(F.expr("sequence(1, length(word))")).alias("i"),
        )
        rhs = F.when(
            F.col("i") < F.length("word"), F.expr("substring(word, i + 1, 1)")
        ).otherwise(F.lit(EOW))
    else:
        # length-1 words carry no pairs; filter BEFORE the position
        # explode (Spark's sequence(1, 0) would yield a DESCENDING
        # [1, 0], not an empty array)
        pos = wf.filter(F.length("word") >= 2).select(
            "word", "freq",
            F.explode(F.expr("sequence(1, length(word) - 1)")).alias("i"),
        )
        rhs = F.expr("substring(word, i + 1, 1)")
    return (
        pos.select(
            F.expr("substring(word, i, 1)").alias("lhs"),
            rhs.alias("rhs"),
            "freq",
        )
        .groupBy("lhs", "rhs")
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_fit(
    word_freqs: list[tuple[str, int]], n_merges: int, eow: bool = True
) -> list[tuple[str, str]]:
    """Classic greedy BPE on a (word, freq) table — pure driver-side
    Python, deterministic: best pair by (count desc, pair lexicographic
    asc). Returns the ordered merge list; rank = list position."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in word_freqs:
        syms = tuple(word) + ((EOW,) if eow else ())
        if len(syms) >= 2:
            vocab[syms] = vocab.get(syms, 0) + freq

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            if len(t) >= 2:
                nxt[t] = nxt.get(t, 0) + freq
        vocab = nxt
        if not vocab:
            break
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int], eow: bool = True) -> list[str]:
    """Apply merges in rank order to one word (reference encoder; the
    distributed path calls this behind a memo)."""
    syms = list(word) + ([EOW] if eow else [])
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_fit_distributed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 200,
    max_words: int = 20000,
    eow: bool = True,
) -> list[tuple[str, str]]:
    """Distributed word-frequency aggregation → bounded driver collect
    (top-``max_words`` by freq desc, word asc — deterministic) → pure
    Python merge loop. The collect is vocabulary-capped, never
    corpus-sized."""
    top = (
        word_frequencies(docs, text_col, id_col)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    return bpe_fit([(r["word"], r["freq"]) for r in top], n_merges, eow=eow)


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    eow: bool = True,
) -> DataFrame:
    """Per-document subword statistics from a fitted merge table:
    (doc_id, n_words, n_bpe_tokens, tokens_per_word, n_singleton_words).

    The merge table rides the closure (Spark broadcasts task binaries;
    a few thousand pairs is nothing) and each Arrow batch shares a
    word→len(pieces) memo, so the per-token cost after warm-up is a
    dict hit. ``n_singleton_words`` counts words the vocab failed to
    compress below characters — the OOV-pressure signal tokenizer
    audits look at."""
    import re

    ranks = {pair: i for i, pair in enumerate(merges)}
    word_re = re.compile(r"[a-z]+")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in it:
            ids, n_words_l, n_tok_l, tpw_l, singl_l = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = word_re.findall((text or "").lower())
                n_tok = 0
                n_singleton = 0
                for w in words:
                    n = memo.get(w)
                    if n is None:
                        n = len(encode_word(w, ranks, eow=eow))
                        memo[w] = n
                    n_tok += n
                    # all-chars (+EOW) means zero merges applied
                    if n == len(w) + (1 if eow else 0) and len(w) > 1:
                        n_singleton += 1
                ids.append(doc_id)
                n_words_l.append(len(words))
                n_tok_l.append(n_tok)
                tpw_l.append(round(n_tok / len(words), 6) if words else None)
                singl_l.append(n_singleton)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": n_words_l,
                    "n_bpe_tokens": n_tok_l,
                    "tokens_per_word": pd.array(tpw_l, dtype="float64"),
                    "n_uncompressed_words": singl_l,
                }
            )

    # Derive the id column's name AND type from the input (same
    # regression class as linalg.project / ewma_per_key: a string or int
    # id must round-trip, not be forced into a hardcoded 'doc_id long').
    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        batches,
        schema=(
            f"{id_col} {id_type}, n_words long, n_bpe_tokens long, "
            "tokens_per_word double, n_uncompressed_words long"
        ),
    )


def bpe_roundtrip_report(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    eow: bool = True,
) -> DataFrame:
    """Driver-gradeable losslessness contract for the BPE encoder (the
    ann_recall_report pattern): one row —

    - ``n_docs`` / ``n_words``: recomputed independently by the SQL
      oracle (the corpus word count is the same [a-z]+ tokenization the
      certified bpe_word_frequencies oracle replays).
    - ``all_roundtrip``: concatenating every word's encoded pieces
      (minus the EOW marker) reconstructs the word exactly, for every
      word of every document — BPE merges only ever concatenate
      adjacent symbols, so a FALSE here means a real encoder defect
      (dropped symbol, marker leakage, memo corruption), not noise.
    - ``no_empty_pieces``: no encoding emits an empty piece.

    The merge table itself stays data-dependent (why the stats query is
    rows-only); this report grades the ENCODER against data-independent
    invariants plus SQL-recomputed corpus totals. Scale shape: one
    mapInPandas pass emitting 4 counters per Arrow batch, then a 1-row
    sum — map-side combinable, nothing corpus-sized moves."""
    import re

    ranks = {pair: i for i, pair in enumerate(merges)}
    word_re = re.compile(r"[a-z]+")
    marker = EOW if eow else ""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, tuple[bool, bool]] = {}  # word -> (roundtrips, has_empty)
        for pdf in it:
            n_docs = n_words = n_bad = n_empty = 0
            for text in pdf[text_col]:
                n_docs += 1
                for w in word_re.findall((text or "").lower()):
                    n_words += 1
                    got = memo.get(w)
                    if got is None:
                        pieces = encode_word(w, ranks, eow=eow)
                        joined = "".join(pieces)
                        ok = joined == w + marker
                        empty = any(p == "" for p in pieces)
                        got = (ok, empty)
                        memo[w] = got
                    if not got[0]:
                        n_bad += 1
                    if got[1]:
                        n_empty += 1
            yield pd.DataFrame(
                {
                    "n_docs": [n_docs],
                    "n_words": [n_words],
                    "n_bad": [n_bad],
                    "n_empty": [n_empty],
                }
            )

    partials = docs.select(id_col, text_col).mapInPandas(
        batches, schema="n_docs long, n_words long, n_bad long, n_empty long"
    )
    # Coalesce: an EMPTY corpus yields zero partial rows, so the sums
    # are NULL — report 0 docs / 0 words / vacuously-true contracts
    # instead of a NULL row.
    return partials.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("n_words"), F.lit(0)).cast("bigint").alias("n_words"),
        (F.coalesce(F.sum("n_bad"), F.lit(0)) == 0).alias("all_roundtrip"),
        (F.coalesce(F.sum("n_empty"), F.lit(0)) == 0).alias("no_empty_pieces"),
    )
