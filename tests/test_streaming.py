"""Structured Streaming: exactly-once file ingest (checkpoint-as-ledger)
and windowed aggregations whose AvailableNow result equals batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_eng_project_spark.streaming.incremental import (
    ingest_new_text_files,
    read_events_stream,
)
from data_eng_project_spark.streaming.windows import (
    hourly_counts_stream,
    run_available_now,
    session_windows_stream,
)
from data_eng_project_spark.tables import load_table, table_path

SF = "/root/testdata/sf0.001"


def test_streaming_file_ingest_exactly_once(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    (src / "a.txt").write_text("r1\nr2\n")
    ingest_new_text_files(spark, str(src), ckpt, out)
    assert spark.read.parquet(out).count() == 2
    # re-run: nothing new → no duplicate rows (checkpoint is the ledger)
    ingest_new_text_files(spark, str(src), ckpt, out)
    assert spark.read.parquet(out).count() == 2
    # new file → only its rows appended
    (src / "b.txt").write_text("r3\n")
    ingest_new_text_files(spark, str(src), ckpt, out)
    assert spark.read.parquet(out).count() == 3


def test_streaming_hourly_equals_batch(spark):
    stream = read_events_stream(spark, table_path(SF, "events"))
    result = run_available_now(hourly_counts_stream(stream), "t_hourly")
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 6
            ).alias("total_value"),
        )
    )
    a = {tuple(r) for r in result.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b


def test_streaming_sliding_window_equals_batch(spark):
    """Sliding windows (1h window, 15min slide): each event lands in 4
    windows; the streamed result must equal the batch window() twin."""
    from data_eng_project_spark.streaming.windows import sliding_avg_stream

    stream = read_events_stream(spark, table_path(SF, "events"))
    result = run_available_now(sliding_avg_stream(stream), "t_sliding")
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "avg_value")
    )
    a = {(r.window_start, r.event_type, round(r.avg_value, 9)) for r in result.collect()}
    b = {(r.window_start, r.event_type, round(r.avg_value, 9)) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_stateful_profile_converges_to_batch(spark):
    """applyInPandasWithState custom operator: after draining the whole
    (bounded) stream, the last emitted profile per user must equal the
    batch aggregation of the same input."""
    from data_eng_project_spark.streaming.stateful import (
        running_user_profile_batch,
        running_user_profile_stream,
    )

    stream = read_events_stream(spark, table_path(SF, "events"))
    emitted = run_available_now(
        running_user_profile_stream(stream), "t_profiles", output_mode="update"
    )
    # update-mode emits one row per user per micro-batch; state is
    # cumulative, so the converged value is the row with max n_events.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    last = (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    batch = running_user_profile_batch(load_table(spark, SF, "events"))
    a = {(r.user_id, r.n_events, round(r.total_value, 6), r.last_ts) for r in last.collect()}
    b = {(r.user_id, r.n_events, round(r.total_value, 6), r.last_ts) for r in batch.collect()}
    assert a == b


def test_stream_stream_join_equals_batch_interval_join(spark):
    """Stream-stream time-bounded join drained with AvailableNow must
    equal the batch interval join over the same events."""
    from data_eng_project_spark.operators.temporal import range_pairs
    from data_eng_project_spark.streaming.windows import stream_stream_pairs

    a = read_events_stream(spark, table_path(SF, "events"))
    b = read_events_stream(spark, table_path(SF, "events"))
    streamed = run_available_now(
        stream_stream_pairs(a, b), "t_ss_pairs", output_mode="append"
    )
    batch = range_pairs(
        load_table(spark, SF, "events"),
        ts_col="ts",
        id_col="event_id",
        max_gap_seconds=60,
        partition_cols=["event_type"],
    )
    s = {(r.event_type, r.id_a, r.id_b, r.gap_us) for r in streamed.collect()}
    bt = {(r.event_type, r.id_a, r.id_b, r.gap_us) for r in batch.collect()}
    assert s == bt and len(s) > 0


def test_streaming_session_windows(spark):
    stream = read_events_stream(spark, table_path(SF, "events"))
    result = run_available_now(session_windows_stream(stream, gap="30 minutes"), "t_sessions")
    rows = result.collect()
    assert len(rows) > 0
    # every session is non-empty and well-ordered
    assert all(r.n_events >= 1 and r.session_start <= r.session_end for r in rows)
    # session count per user matches the batch gaps-and-islands count
    from data_eng_project_spark.plans import REGISTRY

    batch_sessions = REGISTRY["sessionize_events"].fn(spark, SF)
    assert result.count() == batch_sessions.count()


def test_streaming_dedup_across_micro_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark must suppress re-deliveries that
    arrive in a LATER micro-batch (not just within one): two copies of
    the events file forced into separate triggers via maxFilesPerTrigger,
    watermark covering the full redelivery horizon."""
    import shutil
    import uuid as _uuid

    from data_eng_project_spark.streaming.windows import dedup_events_stream

    src = table_path(SF, "events")
    shutil.copyfile(src, str(tmp_path / "copy_a.parquet"))
    shutil.copyfile(src, str(tmp_path / "copy_b.parquet"))
    stream = read_events_stream(
        spark, str(tmp_path / "*.parquet"), maxFilesPerTrigger="1"
    )
    out = run_available_now(
        dedup_events_stream(stream).select("event_id"),
        f"mem_xbatch_{_uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    n_batch = load_table(spark, SF, "events").count()
    assert out.count() == n_batch
    assert out.distinct().count() == n_batch


def test_stream_foreachbatch_idempotent_sink(spark, tmp_path):
    """Streaming foreachBatch → keyed idempotent parquet sink: duplicate
    deliveries across micro-batches AND a full re-run of the stream must
    leave exactly one row per event_id in the sink."""
    import shutil

    from data_eng_project_spark.streaming.incremental import stream_upsert_events

    src = table_path(SF, "events")
    shutil.copyfile(src, str(tmp_path / "copy_a.parquet"))
    shutil.copyfile(src, str(tmp_path / "copy_b.parquet"))
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    stream_upsert_events(
        spark, str(tmp_path / "*.parquet"), out, ckpt, maxFilesPerTrigger="1"
    )
    n_batch = load_table(spark, SF, "events").count()
    assert spark.read.parquet(out).count() == n_batch
    # Re-run with a FRESH checkpoint (worst case: all progress lost) —
    # the keyed sink, not the checkpoint, is the dedup authority.
    stream_upsert_events(
        spark, str(tmp_path / "*.parquet"), out, str(tmp_path / "ckpt2")
    )
    sunk = spark.read.parquet(out)
    assert sunk.count() == n_batch
    assert sunk.select("event_id").distinct().count() == n_batch


def test_csv_permissive_keeps_corrupt_record(spark, tmp_path):
    """PERMISSIVE mode must load well-formed rows AND surface malformed
    lines in _corrupt_record instead of dropping them silently — the
    quarantine path a production ingest needs next to DROPMALFORMED."""
    from pyspark.sql.types import StringType, StructField, StructType

    p = tmp_path / "dirty.csv"
    p.write_text("a,b\n1,x\n2,y,EXTRA,COLS\n3,z\n")
    schema = StructType(
        [
            StructField("a", StringType()),
            StructField("b", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
        .cache()
    )
    assert df.count() == 3
    bad = df.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and "EXTRA" in bad[0]["_corrupt_record"]
    df.unpersist()


def test_stream_maintained_rollup_equals_batch_and_survives_replay(spark, tmp_path):
    """foreachBatch-maintained rollup state: (a) after draining the
    stream, the merged serving view equals the one-shot batch rollup;
    (b) a replayed micro-batch (same batch_id redelivered, the
    at-least-once crash window) overwrites its own partition instead of
    double-counting."""
    from data_eng_project_spark.operators.temporal import (
        finalize_rollup,
        hourly_rollup_state,
    )
    from data_eng_project_spark.streaming.incremental import (
        read_maintained_rollup,
        stream_maintain_rollup,
        write_rollup_delta,
    )
    from data_eng_project_spark.tables import load_table, table_path

    state = str(tmp_path / "rollup_state")
    stream_maintain_rollup(
        spark,
        table_path(SF, "events"),
        state,
        str(tmp_path / "ckpt"),
        maxFilesPerTrigger="1",
    )
    events = load_table(spark, SF, "events")
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in finalize_rollup(hourly_rollup_state(events)).collect()
    }
    served = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in read_maintained_rollup(spark, state).collect()
    }
    assert served == batch and len(batch) > 0

    # Replay: redeliver a delta under an ALREADY-USED batch_id, twice.
    # Idempotence = the served state after the second delivery is
    # byte-identical to after the first (same partition overwritten with
    # the same rows — never accumulated), and no new partition appears.
    used = sorted(
        int(p.name.split("=")[1])
        for p in (tmp_path / "rollup_state").glob("batch_id=*")
    )
    delta = events.orderBy("event_id").limit(50)
    write_rollup_delta(delta, used[0], state)
    once = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in read_maintained_rollup(spark, state).collect()
    }
    write_rollup_delta(delta, used[0], state)  # the crash-replay
    twice = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in read_maintained_rollup(spark, state).collect()
    }
    assert twice == once and len(once) > 0
    replayed = {
        int(p.name.split("=")[1])
        for p in (tmp_path / "rollup_state").glob("batch_id=*")
    }
    assert replayed == set(used)  # no new partitions from the replay


def test_stream_stream_left_outer_equals_batch(spark):
    """Drained left-outer stream-stream interval join == batch left join
    with the same predicate: matched pairs identical AND every unmatched
    left event present exactly once with a NULL right side."""
    from data_eng_project_spark.streaming.incremental import read_events_stream
    from data_eng_project_spark.streaming.windows import (
        run_available_now,
        stream_stream_pairs_left_outer,
    )
    from data_eng_project_spark.tables import load_table, table_path

    stream = read_events_stream(spark, table_path(SF, "events"))
    out = run_available_now(
        stream_stream_pairs_left_outer(stream, stream),
        f"mem_sslo_{id(spark) % 10_000}",
        output_mode="append",
    )
    got = {(r.event_type, r.id_a, r.id_b) for r in out.collect()}

    ev = load_table(spark, SF, "events")
    a = ev.select(F.col("event_type").alias("_pa"), F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = ev.select(F.col("event_type").alias("_pb"), F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b"))
    batch = a.join(
        b,
        F.expr("_pa = _pb AND ts_b > ts_a AND ts_b <= ts_a + INTERVAL 1 minute"),
        "leftOuter",
    ).select(F.col("_pa").alias("event_type"), "id_a", "id_b")
    want = {(r.event_type, r.id_a, r.id_b) for r in batch.collect()}
    # Matched pairs emit on arrival — exact equality.
    assert {x for x in got if x[2] is not None} == {
        x for x in want if x[2] is not None
    }
    # Outer (no-match) rows finalize only once the watermark passes
    # ts_a + max_gap; events inside the final watermark+gap horizon of a
    # drained bounded stream legitimately never finalize. So: everything
    # emitted must be a true no-match, and every no-match old enough to
    # have finalized must have been emitted.
    got_outer = {x for x in got if x[2] is None}
    want_outer = {x for x in want if x[2] is None}
    assert got_outer <= want_outer
    ev_ts = {
        (r.event_type, r.event_id): r.ts
        for r in load_table(spark, SF, "events").collect()
    }
    import datetime as dt

    max_ts = max(ev_ts.values())
    horizon = max_ts - dt.timedelta(minutes=3)  # watermark 2m + gap 1m
    finalized = {x for x in want_outer if ev_ts[(x[0], x[1])] <= horizon}
    assert finalized <= got_outer and len(finalized) > 0


def test_misra_gries_heavy_hitters_bound(spark):
    """Bounded-state streaming heavy hitters: after draining, every
    shard's Misra–Gries summary must satisfy the deterministic bound
    (true_count − N_shard/(m+1) ≤ mg_count ≤ true_count) and contain
    every key whose true count exceeds N_shard/(m+1)."""
    from data_eng_project_spark.streaming.stateful import (
        MG_CAPACITY,
        N_SHARDS,
        final_heavy_hitter_summaries,
        heavy_hitters_stream,
    )
    from data_eng_project_spark.streaming.windows import run_available_now

    stream = read_events_stream(spark, table_path(SF, "events"))
    emitted = run_available_now(
        heavy_hitters_stream(stream), "t_hh", output_mode="update"
    )
    summaries = final_heavy_hitter_summaries(emitted).collect()
    mg = {(r["shard"], r["user_id"]): r["mg_count"] for r in summaries}

    events = load_table(spark, SF, "events").select("user_id").collect()
    exact: dict[tuple[int, int], int] = {}
    shard_n: dict[int, int] = {}
    for r in events:
        s = r["user_id"] % N_SHARDS
        exact[(s, r["user_id"])] = exact.get((s, r["user_id"]), 0) + 1
        shard_n[s] = shard_n.get(s, 0) + 1

    for (s, uid), c in mg.items():
        err = shard_n[s] / (MG_CAPACITY + 1)
        assert c <= exact[(s, uid)], "sketch may never overcount"
        assert c >= exact[(s, uid)] - err - 1e-9
    for (s, uid), true_c in exact.items():
        if true_c > shard_n[s] / (MG_CAPACITY + 1):
            assert (s, uid) in mg, "guaranteed heavy hitter missing"


def test_streaming_dedup_index_build_probe_and_replay(spark, tmp_path):
    """The persisted LSH index: (1) built across multiple micro-batches
    it equals the band rows computed in one batch job; (2) replaying a
    batch leaves the index byte-identical (dynamic partition overwrite
    + deterministic rows); (3) probing with perturbed copies finds each
    copy's original without rescanning the corpus."""
    from data_eng_project_spark.operators.dedup import (
        _shingle_sets_direct,
        lsh_band_rows,
    )
    from data_eng_project_spark.streaming.dedup_index import (
        probe_index,
        read_index,
        stream_build_index,
        write_index_delta,
    )

    docs = load_table(spark, SF, "documents").limit(60).localCheckpoint()
    # three source files → three micro-batches with maxFilesPerTrigger=1
    src = tmp_path / "docs_in"
    docs.repartition(3).write.parquet(str(src))
    index_dir = str(tmp_path / "lsh_index")
    ckpt = str(tmp_path / "ckpt")
    stream_build_index(
        spark, str(src), index_dir, ckpt, maxFilesPerTrigger="1"
    )

    idx = spark.read.parquet(index_dir)
    n_batches = idx.select("batch_id").distinct().count()
    assert n_batches >= 2  # really was incremental

    # (1) streamed index == one-shot band rows over the same corpus
    batch_rows = lsh_band_rows(
        _shingle_sets_direct(docs, "text", "doc_id", 3, with_minhash_keys=True)
    )
    streamed = {(r["id"], r["band"], r["bucket"]) for r in idx.collect()}
    oneshot = {(r["id"], r["band"], r["bucket"]) for r in batch_rows.collect()}
    assert streamed == oneshot

    # (2) replaying batch 0 (crash-after-write-before-commit) is a no-op:
    # re-deliver exactly the docs the stream processed as batch 0 (their
    # ids are recorded in the index partition) — the rewrite must leave
    # the whole index set-identical, not just same-sized.
    b0_ids = (
        idx.filter(F.col("batch_id") == 0)
        .select(F.col("id").alias("doc_id"))
        .distinct()
    )
    first_batch = docs.join(b0_ids, on="doc_id", how="left_semi")
    write_index_delta(
        first_batch.localCheckpoint(), 0, index_dir
    )  # same batch_id, overwrites its own partition only
    after = {
        (r["id"], r["band"], r["bucket"])
        for r in spark.read.parquet(index_dir).collect()
    }
    assert after == streamed

    # (3) probe: perturbed copies of 5 indexed docs must each find
    # their original (and only cross batch↔index pairs are returned)
    new_batch = (
        docs.limit(5)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tailword")).alias("text"),
        )
        .localCheckpoint()
    )
    hits = probe_index(spark, index_dir, new_batch, docs).collect()
    found = {(r["id_new"], r["id_indexed"]) for r in hits}
    for r in new_batch.collect():
        assert (r["doc_id"], r["doc_id"] - 1_000_000) in found
    assert all(r["id_new"] >= 1_000_000 for r in hits)
    assert all(r["jaccard"] >= 0.5 for r in hits)


def test_dedup_index_compaction_preserves_rows_and_prunes(spark, tmp_path):
    """compact_index must (a) cut file count, (b) preserve the exact
    band-row set, (c) produce disjoint per-file bucket ranges (the
    footer property that lets probes skip files), and (d) leave probe
    results identical."""
    import os

    import pyarrow.parquet as pq

    from data_eng_project_spark.streaming.dedup_index import (
        compact_index,
        probe_index,
        stream_build_index,
    )

    docs = load_table(spark, SF, "documents").limit(60).localCheckpoint()
    src = tmp_path / "docs_in"
    docs.repartition(8).write.parquet(str(src))
    index_dir = str(tmp_path / "idx")
    stream_build_index(
        spark, str(src), index_dir, str(tmp_path / "ckpt"), maxFilesPerTrigger="1"
    )
    compacted = str(tmp_path / "idx_compacted")
    before, after = compact_index(spark, index_dir, compacted, num_files=4)
    assert after < before and after <= 4
    orig = {(r["id"], r["band"], r["bucket"])
            for r in spark.read.parquet(index_dir)
            .select("id", "band", "bucket").collect()}
    comp = {(r["id"], r["band"], r["bucket"])
            for r in spark.read.parquet(compacted).collect()}
    assert comp == orig
    # disjoint bucket ranges across files (probe-side file pruning);
    # the compacted base lives under the reserved batch_id=-1 partition
    import glob

    files = sorted(
        glob.glob(os.path.join(compacted, "**", "*.parquet"), recursive=True)
    )
    assert files, "compacted base must contain parquet files"
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "bucket"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # no overlap
    # probe equivalence
    from pyspark.sql import functions as F

    new_batch = (
        docs.limit(5)
        .select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
        .localCheckpoint()
    )
    a = {(r["id_new"], r["id_indexed"], r["jaccard"])
         for r in probe_index(spark, index_dir, new_batch, docs).collect()}
    b = {(r["id_new"], r["id_indexed"], r["jaccard"])
         for r in probe_index(spark, compacted, new_batch, docs).collect()}
    assert a == b and a


def test_dedup_index_resume_appends_beside_compacted_base(spark, tmp_path):
    """ADVICE r3: the documented workflow — compact, then resume
    appending batch partitions into the SAME directory — requires the
    compacted base to live under a reserved hive partition
    (batch_id=-1); a flat base would make partition discovery fail on
    conflicting layouts. Pin the full cycle: build → compact → append a
    delta → read_index sees base ∪ delta."""
    from pyspark.sql import functions as F

    from data_eng_project_spark.streaming.dedup_index import (
        compact_index,
        read_index,
        stream_build_index,
        write_index_delta,
    )

    docs = load_table(spark, SF, "documents").limit(40).localCheckpoint()
    src = tmp_path / "docs_in2"
    docs.repartition(4).write.parquet(str(src))
    index_dir = str(tmp_path / "idx2")
    stream_build_index(
        spark, str(src), index_dir, str(tmp_path / "ckpt2"), maxFilesPerTrigger="2"
    )
    compacted = str(tmp_path / "idx2_compacted")
    compact_index(spark, index_dir, compacted, num_files=2)
    base = {(r["id"], r["band"], r["bucket"]) for r in read_index(spark, compacted).collect()}

    delta_docs = docs.limit(5).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "text"
    )
    write_index_delta(delta_docs, batch_id=0, index_dir=compacted)
    merged = {(r["id"], r["band"], r["bucket"]) for r in read_index(spark, compacted).collect()}
    delta_ids = {r["doc_id"] for r in delta_docs.collect()}
    assert base < merged
    assert {i for (i, _, _) in merged} - {i for (i, _, _) in base} == delta_ids

    # replay idempotence survives compaction: rewriting batch 0 changes nothing
    write_index_delta(delta_docs, batch_id=0, index_dir=compacted)
    again = {(r["id"], r["band"], r["bucket"]) for r in read_index(spark, compacted).collect()}
    assert again == merged


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_heavy_hitters_oracle_detectability_margin(spark, sf):
    """Regression (r5 review): the streaming_heavy_hitters oracle relies
    on a DATA property, not an MG theorem — every true global-top-20
    user must survive its shard's Misra-Gries summary, i.e. its exact
    count must exceed N_shard/(capacity+1). Pin that property (with a 2x
    safety margin) on both graded corpora, so a testdata regeneration
    that flattens the skew fails HERE with a clear message instead of
    surfacing as a driver hash mismatch on a correct pipeline."""
    from pyspark.sql import functions as F

    from data_eng_project_spark.session import prepare
    from data_eng_project_spark.streaming.stateful import MG_CAPACITY, N_SHARDS
    from data_eng_project_spark.tables import load_table

    prepare(spark)
    events = load_table(spark, f"/root/testdata/{sf}", "events")
    per_user = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    shard_n = (
        events.groupBy((F.col("user_id") % N_SHARDS).alias("shard"))
        .agg(F.count(F.lit(1)).alias("n_shard"))
    )
    top20 = (
        per_user.orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(20)
        .withColumn("shard", F.col("user_id") % N_SHARDS)
        .join(shard_n, on="shard")
        .collect()
    )
    # sf0.001 has only 15 distinct users — the "top 20" is then everyone.
    assert 0 < len(top20) <= 20
    for r in top20:
        floor = r["n_shard"] / (MG_CAPACITY + 1)
        assert r["n"] > 2 * floor, (
            f"user {r['user_id']}: count {r['n']} within 2x of the MG "
            f"eviction floor {floor:.1f} — the exact-top-20 oracle for "
            "streaming_heavy_hitters is no longer safely implied by MG "
            "detectability on this corpus"
        )


def test_stream_asof_enrich_multibatch_equals_batch(spark, tmp_path):
    """stream_asof_enrich must equal the batch as-of join even when the
    events arrive over MULTIPLE micro-batches (three file slices forced
    into separate triggers): a static right side makes each left row's
    match independent, so the drained union is exactly the batch answer
    — this is the decomposition claim the operator's docstring makes."""
    from pyspark.sql import functions as F

    from data_eng_project_spark.operators.temporal import asof_join
    from data_eng_project_spark.streaming.incremental import stream_asof_enrich

    import glob as _glob
    import os
    import shutil

    events = load_table(spark, SF, "events").select("event_id", "user_id", "ts")
    # Three slices as three flat files in one dir → maxFilesPerTrigger=1
    # forces three micro-batches (the layout read_events_stream globs).
    slices = tmp_path / "slices"
    os.makedirs(slices)
    for s in range(3):
        part_dir = str(tmp_path / f"_part{s}")
        events.filter(F.pmod("event_id", F.lit(3)) == s).coalesce(1).write.parquet(
            part_dir
        )
        [part_file] = _glob.glob(f"{part_dir}/*.parquet")
        shutil.copyfile(part_file, str(slices / f"slice_{s}.parquet"))
    src = str(slices / "*.parquet")
    orders = (
        load_table(spark, SF, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    streamed = stream_asof_enrich(
        spark,
        src,
        orders,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey"],
        maxFilesPerTrigger="1",
    )
    got = {
        r["event_id"]: r["asof_o_orderkey"]
        for r in streamed.select("event_id", "asof_o_orderkey").collect()
    }
    want = {
        r["event_id"]: r["asof_o_orderkey"]
        for r in asof_join(
            events, orders, on="user_id", left_ts="ts",
            right_ts="o_orderdate", payload_cols=["o_orderkey"],
        ).collect()
    }
    assert got == want
    assert len(got) == events.count()


def test_probe_recall_report_counts_match_components(spark, tmp_path):
    """The report's counts must equal the ones computed directly from
    its two constituents (probe_index pairs, exact bipartite Jaccard
    pairs) — pins the join/count plumbing independent of LSH banding
    luck. Planted perturbed copies make the ground truth non-trivial."""
    from data_eng_project_spark.operators.dedup import (
        ngram_jaccard_pairs_bipartite,
    )
    from data_eng_project_spark.streaming.dedup_index import (
        probe_index,
        probe_recall_report,
        write_index_delta,
    )

    docs = load_table(spark, SF, "documents").limit(60).localCheckpoint()
    index_dir = str(tmp_path / "idx")
    write_index_delta(docs, 0, index_dir)
    batch = (
        docs.limit(7)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tailword")).alias("text"),
        )
        .localCheckpoint()
    )
    probe_pairs = {
        (r.id_new, r.id_indexed)
        for r in probe_index(spark, index_dir, batch, docs).collect()
    }
    exact_pairs = {
        (r.id_b, r.id_a)
        for r in ngram_jaccard_pairs_bipartite(
            docs, batch, "text", "doc_id", n=3, threshold=0.5
        ).collect()
    }
    assert len(exact_pairs) >= 7  # each copy pairs with its original
    r = probe_recall_report(
        spark, index_dir, batch, docs, include_metrics=True
    ).collect()[0]
    assert r["n_new_docs"] == 7
    assert r["n_true_pairs"] == len(exact_pairs)
    assert r["n_probe_pairs"] == len(probe_pairs)
    assert r["n_hits"] == len(probe_pairs & exact_pairs)
    assert bool(r["probe_subset_ok"]) == (probe_pairs <= exact_pairs)


def test_probe_recall_report_empty_truth_vacuous(spark, tmp_path):
    """A batch with no near-dup in the corpus: zero true pairs, recall
    0/0 must grade vacuously true, not NULL or a crash."""
    from data_eng_project_spark.streaming.dedup_index import (
        probe_recall_report,
        write_index_delta,
    )

    docs = load_table(spark, SF, "documents").limit(40).localCheckpoint()
    index_dir = str(tmp_path / "idx")
    write_index_delta(docs, 0, index_dir)
    batch = spark.createDataFrame(
        [(9_000_001, "entirely novel text with no corpus overlap at all "
          "zyx wvu tsr qpo nml kji hgf edc ba")],
        "doc_id long, text string",
    )
    r = probe_recall_report(
        spark, index_dir, batch, docs, include_metrics=True
    ).collect()[0]
    assert r["n_true_pairs"] == 0 and r["n_probe_pairs"] == 0
    assert bool(r["probe_subset_ok"]) and bool(r["recall_ok"])


def test_probe_recall_report_testdata_floor(spark):
    """Measured recall floor on the registered query's own batch
    construction (sf0.001): the planted perturbed copies sit at J≈0.9
    where all-16-band collision probability ≈ 1 — measured recall is
    exactly 1.0 at sf0.001/0.01/0.1, so the registered 0.7 contract
    carries real margin."""
    import tempfile

    from data_eng_project_spark.streaming.dedup_index import (
        probe_recall_report,
        write_index_delta,
    )

    docs = load_table(spark, SF, "documents").localCheckpoint()
    with tempfile.TemporaryDirectory() as base:
        index_dir = f"{base}/idx"
        write_index_delta(docs, 0, index_dir)
        batch = docs.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" probeword")).alias("text"),
        )
        r = probe_recall_report(
            spark, index_dir, batch, docs,
            threshold=0.5, recall_contract=0.7, include_metrics=True,
        ).collect()[0]
    assert r["recall"] == 1.0
    assert bool(r["probe_subset_ok"]) and bool(r["recall_ok"])
