"""End-to-end training-corpus cleaning pipeline — the composite flow a
pretraining data pipeline runs over raw documents:

    language filter  →  quality filter  →  exact-dedup (keep canonical)
    →  corpus stats per source

Each stage is an existing verified operator (operators/textops.py,
operators/dedup.py); this module is the composition, and the registered
query's DuckDB oracle recomputes the whole flow in SQL — so the
*pipeline*, not just its pieces, is correctness-gated.

Scale notes: the three filters are one codegen'd scan each and join on
doc_id (AQE picks broadcast/shuffled-hash as sizes dictate); the dedup
canonical set is one groupBy on the content hash. Nothing here is
driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_eng_project_spark.operators.dedup import exact_dedup
from data_eng_project_spark.operators.textops import language_id, quality_score


def clean_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_words: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents that are (a) predicted ``lang``, (b) at least
    ``min_words`` words, (c) the canonical (minimum-id) copy of their
    exact-content duplicate group."""
    langs = language_id(docs, text_col, id_col).filter(F.col("lang_pred") == lang)
    quals = quality_score(docs, text_col, id_col).filter(F.col("n_words") >= min_words)
    canon = exact_dedup(docs, text_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return (
        docs.join(langs.select(id_col), on=id_col)
        .join(quals.select(id_col), on=id_col)
        .join(canon, on=id_col)
    )


def corpus_stats(clean: DataFrame) -> DataFrame:
    """Per-source stats of the cleaned corpus."""
    return clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
