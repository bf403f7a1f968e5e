"""Temporal join operators: as-of join and bounded range (interval)
self-join.

The reference is batch-only with no temporal joins (SURVEY.md §2.3 —
"no sort-merge, nested-loop, as-of, or interval joins"); these are the
extension operators a time-series / training-data pipeline needs, built
as compositions of existing DataFrame ops so Catalyst plans them as
ordinary shuffles:

- ``asof_join``  : the classic union-merge formulation — one shuffle on
  the key, a single ordered window pass, no join node at all. This is
  the scale path: cost is sort+scan of |left|+|right| per key, versus
  the naive "join all earlier rows then argmax" which explodes to
  |left| × |matching right| intermediates.
- ``range_pairs``: pairs of rows within a time gap, via gap-sized time
  bucketing that turns the pure inequality predicate into an equi-join
  (same trick as the spatial grid join in operators/spatial.py): each
  right row lands in its own bucket and its predecessor, so every
  qualifying pair shares exactly one bucket — a superset candidate set
  with no duplicates, then the exact filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: "T.DataType") -> bool:
    """Whether a type can appear in a window ORDER BY (maps cannot;
    arrays/structs are orderable iff their element/field types are)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def _tie_break_cols(
    right: DataFrame, payload_cols: list[str], tie_break: list[str] | None
):
    """Sort keys appended after (_ts, _tag) for deterministic as-of
    tie-breaks. Explicit ``tie_break`` columns win; otherwise the whole
    _payload struct is used when orderable, else nothing (documented:
    ties on (key, ts) with a non-orderable payload — e.g. a map column —
    are nondeterministic unless the right side is pre-aggregated unique
    or tie_break is passed). This keeps map-typed payloads executable
    (ADVICE r4) instead of failing analysis on the struct ORDER BY."""
    if tie_break is not None:
        missing = [c for c in tie_break if c not in payload_cols]
        if missing:
            raise ValueError(f"tie_break columns not in payload_cols: {missing}")
        return [F.col(f"_payload.{c}") for c in tie_break]
    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    return [F.col("_payload")] if _orderable(payload_type) else []


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "left",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_ts <= left_ts`` for the same key (inclusive, backward as-of).

    Right rows must be unique per (key, ts) — pre-aggregate the right
    side first for deterministic results (the oracle does the same).

    Implementation: tag right rows 0 and left rows 1, union them on a
    common schema, and take ``last(payload, ignorenulls)`` over a window
    ordered by (ts, tag) — the tag makes a right row at exactly left_ts
    sort *before* the left row, giving inclusive semantics. One shuffle
    on the key; no row explosion regardless of how many right rows
    precede a left row.

    NULL semantics follow SQL ASOF joins: a NULL key or NULL timestamp
    never matches (right rows with either are dropped from the index;
    left rows with either keep their place but carry a NULL payload —
    and are dropped under ``how='inner'``). Without this, the window's
    partitionBy would happily group NULL keys together and nulls-first
    ordering would make a NULL-ts right row the backward match of every
    left row (r5 review, verified live).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    payload = F.struct(*[F.col(c) for c in payload_cols])
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *left.columns,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag", *_tie_break_cols(right, payload_cols, tie_break))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "_asof",
        # NULL left key/ts ⇒ no match by definition (the key mask also
        # covers the all-left NULL partition; the ts mask is belt-and-
        # braces here since a NULL _ts sorts first and sees no right row).
        F.when(
            F.col("_k").isNotNull() & F.col("_ts").isNotNull(),
            F.last("_payload", ignorenulls=True).over(w),
        ),
    )
    # Inner mode tests the _asof STRUCT (null ⟺ no matching right row),
    # not its first field — a matched right row whose first payload
    # column is legitimately NULL is still a match. Ties on (key, ts)
    # break deterministically via _tie_break_cols (explicit tie_break
    # list, else the whole payload struct when orderable; map payloads
    # run without a payload sort key — see _tie_break_cols).
    matched = merged.filter(F.col("_tag") == 1)
    if how == "inner":
        matched = matched.filter(F.col("_asof").isNotNull())
    return matched.select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in payload_cols],
    )


def range_pairs(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    max_gap_seconds: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """All ordered pairs (a, b) with ``a.ts < b.ts <= a.ts + gap`` (and
    equal ``partition_cols``, if given) — an interval self-join.

    Scalable form: bucket timestamps into gap-sized cells; a qualifying
    pair's b-row lies in a's bucket or the next one, so exploding the
    b side into (its bucket, its bucket − 1) and equi-joining on the
    bucket covers every pair exactly once. The inequality predicate is
    then applied to the candidate superset. Shuffle is linear in input
    (2× one side), never quadratic.
    """
    parts = partition_cols or []
    bucket = (F.unix_timestamp(F.col(ts_col)) / max_gap_seconds).cast("long")
    a = df.select(
        *parts,
        F.col(id_col).alias("id_a"),
        F.col(ts_col).alias("ts_a"),
        bucket.alias("_cell"),
    )
    b = df.select(
        *parts,
        F.col(id_col).alias("id_b"),
        F.col(ts_col).alias("ts_b"),
        F.explode(F.array(bucket, bucket - 1)).alias("_cell"),
    )
    # Exact boundary semantics: compare integer microseconds, not doubles
    # (an epoch-seconds double can't represent micros exactly).
    gap_us = F.unix_micros("ts_b") - F.unix_micros("ts_a")
    return (
        a.join(b, on=parts + ["_cell"])
        .filter((gap_us > 0) & (gap_us <= max_gap_seconds * 1_000_000))
        .select(*parts, "id_a", "id_b", gap_us.alias("gap_us"))
    )


def ewma_per_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Exponentially weighted moving average per key — the sequential
    recurrence (y_t = α·x_t + (1-α)·y_{t-1}) that no fixed-frame window
    function can express, implemented the Spark-idiomatic way for
    order-dependent per-key state in BATCH: groupBy(key).applyInPandas,
    sort inside the group, one vectorized pandas ewm pass per Arrow
    batch. State never crosses keys, so the operator scales out on the
    key hash like any aggregation; a single pathological key is a skew
    problem exactly like any groupBy (salt or split upstream).

    The streaming twin of this pattern is
    streaming/stateful.running_user_profile_stream
    (applyInPandasWithState).

    NULL values are excluded from the series (dropped, not emitted):
    pandas ewm would silently RENORMALIZE the decay weights across a
    NaN gap while the SQL recurrence oracle would cascade NULL forever —
    two different semantics, neither declared. Dropping the row is the
    one behavior both engines state identically (r5 review).
    """
    import pandas as pd

    df = df.filter(F.col(value_col).isNotNull())

    def ewma(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        out = pdf[[id_col, key_col, value_col]].copy()
        out["ewma"] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean().round(6)
        )
        return out

    # Derive the output schema from the input — a string key or a float
    # value column must round-trip with its real type, not a hardcoded
    # long/double guess.
    in_fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = (
        f"{id_col} {in_fields[id_col]}, {key_col} {in_fields[key_col]}, "
        f"{value_col} {in_fields[value_col]}, ewma double"
    )
    return df.select(id_col, key_col, ts_col, value_col).groupBy(key_col).applyInPandas(
        ewma, schema=schema
    )


def hourly_rollup_state(
    events: DataFrame, value_col: str = "value", ts_col: str = "ts"
) -> DataFrame:
    """Partial-aggregate state for the hourly event rollup: per
    (hour, event_type), the running count and an EXACT decimal value sum.
    This is the mergeable form — counts and decimal sums are associative
    and commutative, so states built from disjoint batches combine into
    exactly the state a full recompute would build (the
    continuous-aggregate / hypertable-rollup maintenance pattern)."""
    return events.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("_sum_dec"),
    )


def merge_rollup_states(*states: DataFrame) -> DataFrame:
    """Merge rollup states (prior state ∪ new-batch state → one state).

    Scale design: cost is O(state + delta) — the history EVENTS are never
    rescanned, only the rollup-sized state (hours × types) reshuffles,
    and the shuffle key is the rollup key so AQE coalesces it small. This
    is what a nightly/streaming maintenance job runs instead of the full
    groupBy; `foreachBatch` + idempotent keyed sink (operators/sink.py)
    is the streaming skin over the same merge."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("window_start", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("_sum_dec").alias("_sum_dec"),
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Serving projection of a rollup state: decimal accumulator lands in
    a rounded double (exact, order-free up to this single final cast)."""
    return state.select(
        "window_start",
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("_sum_dec").cast("double"), 6).alias("total_value"),
    )


def cusum_hourly_changepoints(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    h_sigmas: float = 4.0,
) -> DataFrame:
    """One-sided CUSUM changepoint detection over hourly event counts,
    per event type: S_i = max(0, S_{i-1} + (x_i − μ)), alarm when S
    exceeds ``h_sigmas``·σ·(series length scaling).

    The max(0, ·) recursion looks sequential, but the classic identity
    S_i = R_i − min_{0≤j≤i} R_j (R = prefix sum of deviations, with the
    empty prefix R_0 = 0 included — without it a series whose early
    hours run ABOVE the mean has its CUSUM clamped to 0 and start-of-
    series changepoints are missed) turns it into two window functions —
    a running sum and a zero-clamped running min — so the whole detector
    is shuffle-once-per-type, no UDF, no iteration.

    Exactness discipline: deviations are scaled by the series length n
    (D_i = n·x_i − total, an exact BIGINT), so prefix sums, running
    minima, and the reported ``cusum_scaled`` are all integer-exact and
    cross-engine reproducible; only the alarm threshold (n·σ terms from
    exact decimal products) passes through doubles, with the identical
    expression on both engines.
    """
    observed = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
    ).agg(F.count(F.lit(1)).alias("x"))
    # Densify to the full per-type hour grid: an hour with ZERO events
    # must enter the series as x = 0 — an outage is precisely the signal
    # a changepoint detector exists for, and skipping silent hours also
    # biased μ/σ toward active hours and broke the prefix-sum index
    # across gaps (r5 review). The grid is type-bounded (min..max hour),
    # dimension-sized: |types| × |span hours| rows, from one tiny
    # aggregate + sequence() — no shuffle beyond the existing ones.
    span = observed.groupBy("event_type").agg(
        F.min("window_start").alias("_h0"), F.max("window_start").alias("_h1")
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("_h0", "_h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("window_start"),
    )
    hourly = grid.join(observed, on=["event_type", "window_start"], how="left").select(
        "event_type", "window_start", F.coalesce("x", F.lit(0)).alias("x")
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("total"),
        F.sum(F.col("x") * F.col("x")).alias("sumsq"),
    )
    j = hourly.join(F.broadcast(stats), on="event_type")
    d = F.col("n") * F.col("x") - F.col("total")  # n·(x − μ), exact
    w = Window.partitionBy("event_type").orderBy("window_start").rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = F.sum(d).over(w)
    with_r = j.withColumn("_r", r)
    # least(min, 0) supplies the R_0 = 0 term of the empty prefix.
    s = F.col("_r") - F.least(F.min("_r").over(w), F.lit(0))
    # n·σ·n = sqrt(n·sumsq − total²)·... : threshold for S (≡ n·CUSUM)
    # is h·n·σ = h·sqrt(n·sumsq − total²), from exact decimal products.
    nsig = F.sqrt(
        (
            F.col("n").cast("decimal(38,0)") * F.col("sumsq")
            - F.col("total").cast("decimal(38,0)") * F.col("total")
        ).cast("double")
    )
    return with_r.select(
        "event_type",
        "window_start",
        F.col("x").cast("bigint").alias("x"),
        s.cast("bigint").alias("cusum_scaled"),
        (s.cast("double") > F.lit(h_sigmas) * nsig).alias("alarm"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Per-key time-weighted average: each observation's value is
    weighted by how long it remained current (the gap to the next
    observation), the standard irregular-sampling mean (TimescaleDB's
    time_weight with LOCF semantics). The last observation of a key
    carries no weight — the series ends there.

    Exactness: gaps are integer microseconds, values go through
    DECIMAL(12,2) (exact for 2-decimal generator values), so the
    weighted sum is an exact decimal; only the final division is
    floating point. Keys with <2 observations (no interval) or zero
    span (all simultaneous) are excluded — a weighted mean over an
    empty span is undefined, and emitting the raw value would silently
    change semantics.

    Scale: one lead() window + one groupBy on the same key — the
    partitioning is reused; each key reduces to two sums.

    Returns (key, n_obs, span_us, twa).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    dt_us = F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))
    per_row = df.select(
        F.col(key_col).alias("key"),
        dt_us.alias("dt_us"),
        F.col(value_col).cast("decimal(12,2)").alias("v"),
    )
    agg = (
        per_row.groupBy("key")
        .agg(
            F.count("*").alias("n_obs"),
            F.sum("dt_us").alias("span_us"),
            F.sum(F.col("v") * F.col("dt_us").cast("decimal(18,0)")).alias("wsum"),
        )
        .filter((F.col("n_obs") >= 2) & (F.col("span_us") > 0))
    )
    return agg.select(
        "key",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.col("span_us").cast("bigint").alias("span_us"),
        F.round(
            F.col("wsum").cast("double") / F.col("span_us").cast("double"), 6
        ).alias("twa"),
    )


def hourly_ohlc(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """OHLC candlestick rollup per hour: open/close are the first/last
    values in event order (deterministic tie-break), high/low the
    extremes — the classic downsampling shape for dashboards and
    monitoring over any metric stream, not just prices.

    open/close come from rank-1 rows of two windows over the hour
    (ascending and descending) rather than min_by/max_by on a struct,
    so both engines resolve ties identically. No arithmetic touches
    the values — doubles pass through untouched, so cross-engine
    comparison is exact.

    Returns (hour_start, n_events, open, high, low, close).
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    base = df.select(
        hour.alias("hour_start"),
        F.col(ts_col).alias("_ts"),
        F.col(order_tiebreak).alias("_tb"),
        F.col(value_col).alias("v"),
    )
    asc = Window.partitionBy("hour_start").orderBy(
        F.col("_ts").asc(), F.col("_tb").asc()
    )
    # (_ts, _tb) totally orders each hour, so the last row in ascending
    # order IS the descending rank-1 row: close = the row where
    # ra == count(hour). One sorted window instead of two full sorts —
    # the count window needs only the hour partitioning, which the asc
    # sort already established (r5 review).
    ranked = base.select(
        "hour_start",
        "v",
        F.row_number().over(asc).alias("_ra"),
        F.count("*").over(Window.partitionBy("hour_start")).alias("_n"),
    )
    return ranked.groupBy("hour_start").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max(F.when(F.col("_ra") == 1, F.col("v"))).alias("open"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.max(F.when(F.col("_ra") == F.col("_n"), F.col("v"))).alias("close"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "left",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with
    ``right_ts >= left_ts`` for the same key — "what happened next"
    (next order after a touchpoint, next reading after an alarm). Same
    union-merge shape as the backward join, mirrored: right rows tag 1
    so at an exact tie they sort *after* the left row (inclusive), and
    the window takes ``first(payload, ignorenulls)`` over the
    FOLLOWING frame. One shuffle on the key, no row explosion.

    NULL semantics mirror asof_join: NULL keys/timestamps never match —
    critical here because a NULL-ts left row sorts FIRST and its
    following frame would otherwise "match" the key's earliest right
    row.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    payload = F.struct(*[F.col(c) for c in payload_cols])
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *left.columns,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag", *_tie_break_cols(right, payload_cols, tie_break))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = r.unionByName(l).withColumn(
        "_asof",
        F.when(
            F.col("_k").isNotNull() & F.col("_ts").isNotNull(),
            F.first("_payload", ignorenulls=True).over(w),
        ),
    )
    # Inner mode tests the _asof STRUCT (null ⟺ no right row follows),
    # not its first field — a matched right row whose first payload
    # column is legitimately NULL is still a match. The _payload sort
    # key makes right rows tied on (key, ts) pick a deterministic
    # payload (smallest wins for first()).
    matched = merged.filter(F.col("_tag") == 0)
    if how == "inner":
        matched = matched.filter(F.col("_asof").isNotNull())
    return matched.select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(f"next_{c}") for c in payload_cols],
    )


def debounce_events(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 5,
) -> DataFrame:
    """Telemetry debounce: within each key, coalesce BURSTS — chains of
    events where each arrives within ``gap_seconds`` of its
    predecessor (double-fires, retry storms, bounce clicks; the timer
    resets on every event, which is what distinguishes debounce from
    throttle's fixed-interval survivor chain) — and keep only each
    burst's first event. Gaps-and-islands: a new island starts when
    the gap from the previous row exceeds the threshold; island
    membership is transitive by construction. One window shuffle on
    the key. Returns input rows + ``debounce_keep`` flag.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, id_col)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    # A burst's first event is by construction the row that STARTS a new
    # island (no predecessor, or gap above threshold) — the island
    # running-sum + second per-island window the original
    # gaps-and-islands formulation used computed exactly this flag at
    # the cost of an extra sort pass (r5 review).
    return events.withColumn(
        "debounce_keep",
        prev_us.isNull()
        | (F.unix_micros(F.col(ts_col)) - prev_us > gap_seconds * 1_000_000),
    )


def holt_linear_per_key(
    series: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str = "x",
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Holt's double exponential smoothing (level + linear trend) per
    key over an ordered series — the step past EWMA when the series has
    drift: an EWMA of a steadily growing series lags by design, while
    Holt tracks the growth as an explicit trend term and yields the
    standard one-step forecast ``level + trend``.

        l_1 = x_1,  b_1 = 0
        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    Same execution shape as ewma_per_key: groupBy(key).applyInPandas,
    sort inside the group, one float64 recurrence pass per Arrow batch
    — state never crosses keys, so the operator scales on the key hash
    like any aggregation; series length per key (e.g. days) is bounded,
    so the per-group Python walk is dimension-sized, never corpus-sized.
    The recurrence's float expression tree matches the recursive-CTE
    oracle term for term (both engines: IEEE double, identical
    operation order), so results agree bit-exactly before the single
    output rounding.

    Returns (key, order, x, level, trend, forecast_next) with the three
    smoothed columns rounded to 6 dp; NULL values are excluded from the
    series on both sides (same contract as ewma_per_key).
    """
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    series = series.filter(F.col(value_col).isNotNull())
    a, b_ = float(alpha), float(beta)

    def holt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values([order_col], kind="mergesort")
        x = pdf[value_col].to_numpy(dtype="float64")
        n = len(x)
        lev = np.empty(n, dtype="float64")
        tr = np.empty(n, dtype="float64")
        l_prev, b_prev = x[0], 0.0
        lev[0], tr[0] = l_prev, b_prev
        for t in range(1, n):
            l_new = a * x[t] + (1.0 - a) * (l_prev + b_prev)
            b_new = b_ * (l_new - l_prev) + (1.0 - b_) * b_prev
            lev[t], tr[t] = l_new, b_new
            l_prev, b_prev = l_new, b_new
        out = pdf[[key_col, order_col, value_col]].copy()
        out["level"] = np.round(lev, 6)
        out["trend"] = np.round(tr, 6)
        out["forecast_next"] = np.round(lev + tr, 6)
        return out

    in_fields = {f.name: f.dataType.simpleString() for f in series.schema.fields}
    schema = (
        f"{key_col} {in_fields[key_col]}, {order_col} {in_fields[order_col]}, "
        f"{value_col} {in_fields[value_col]}, "
        "level double, trend double, forecast_next double"
    )
    return (
        series.select(key_col, order_col, value_col)
        .groupBy(key_col)
        .applyInPandas(holt, schema=schema)
    )


def negate_rollup_state(state: DataFrame) -> DataFrame:
    """Retraction form of a rollup state: every accumulator negated, so
    merging it subtracts the contribution of the rows it was built from.
    This is the CDC-delete / update-before half of incremental view
    maintenance — counts and decimal sums form an abelian group, so a
    state built from the deleted rows, negated, composes with
    merge_rollup_states exactly like an insert batch does. Groups whose
    rows are ALL retracted cancel to n_events = 0 (and an exactly-zero
    decimal sum); the serving projection drops them, which is precisely
    what a full recompute over the post-delete table produces."""
    return state.select(
        "window_start",
        "event_type",
        (-F.col("n_events")).alias("n_events"),
        (-F.col("_sum_dec")).alias("_sum_dec"),
    )
