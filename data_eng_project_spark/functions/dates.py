"""Multi-format, never-throwing date parsing (reference F1 semantics).

The reference parses dates by trying ``%Y%m%d`` then ``%Y-%m-%d`` and
returning ``None`` when both fail (reference ``dags/global_dag.py:111-118``,
used at ``:137-138,201,209``). The Spark-native equivalent is a
``coalesce`` of per-format ``to_date`` attempts; with
``spark.sql.ansi.enabled=false`` + LEGACY time-parser policy (set in
``session.prepare``) an unparseable string yields NULL instead of raising,
which reproduces the try/except-to-None semantics exactly and — unlike the
reference's row-at-a-time Python — runs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_FORMATS = ("yyyyMMdd", "yyyy-MM-dd")


def parse_date_multi(col: Column | str, formats: tuple[str, ...] = DEFAULT_FORMATS) -> Column:
    """Try each format in order; NULL if none parses (never errors).

    Guards with a regex pre-filter per format so that even under ANSI mode
    (if a caller's session refuses non-ANSI) junk input cannot raise.
    """
    c = F.col(col) if isinstance(col, str) else col
    attempts = []
    for fmt in formats:
        if fmt == "yyyyMMdd":
            guarded = F.when(c.rlike(r"^\d{8}$"), F.to_date(c, fmt))
        elif fmt == "yyyy-MM-dd":
            guarded = F.when(c.rlike(r"^\d{4}-\d{2}-\d{2}$"), F.to_date(c, fmt))
        else:
            guarded = F.to_date(c, fmt)
        attempts.append(guarded)
    return F.coalesce(*attempts)
