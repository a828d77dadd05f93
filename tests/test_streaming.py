"""Structured Streaming slice: streaming results must equal the batch
forms of the same logic (SURVEY §2.9)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from banksy_spark.streaming import (
    rate_limited_alert_stream,
    read_events_stream,
    tumbling_daily_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_tumbling_daily_stream_equals_batch(spark, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    q = (
        tumbling_daily_counts(stream)
        .writeStream.format("memory")
        .queryName("daily_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), 'stream did not finish in time'
    got = {
        (str(r.day), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM daily_counts").collect()
    }
    from banksy_spark.suite.registry import T

    batch = tumbling_daily_counts(T(spark, SF_SMOKE, "events"))
    want = {(str(r.day), r.event_type): r.n_events for r in batch.collect()}
    assert got == want and len(want) > 0


def test_rate_limited_stream_never_exceeds_quota(spark, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir).filter(
        F.col("event_type") == "error"
    )
    out = str(tmp_path / "out")
    log = str(tmp_path / "log")
    q = rate_limited_alert_stream(
        stream, log_path=log, out_path=out, checkpoint=str(tmp_path / "ckpt2")
    )
    assert q.awaitTermination(120), 'stream did not finish in time'

    sent = spark.read.parquet(out)
    per_day = sent.groupBy("user_id", "day").count()
    assert per_day.agg(F.max("count")).first()[0] <= 3
    assert sent.count() > 0
    # the log records exactly what was sent (reference :507-514)
    assert spark.read.parquet(log).count() == sent.count()

    # idempotent-ish restart: running again over the same (now fully
    # consumed) source adds nothing
    q2 = rate_limited_alert_stream(
        stream, log_path=log, out_path=out, checkpoint=str(tmp_path / "ckpt2")
    )
    assert q2.awaitTermination(120), 'stream did not finish in time'
    assert spark.read.parquet(out).count() == sent.count()


def test_stateful_rate_limit_across_batches(spark, tmp_path):
    """applyInPandasWithState: quota state persists across micro-batches
    (two copies of the events file, maxFilesPerTrigger=1 → 2 batches)."""
    import shutil

    src = tmp_path / "multi_in"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "a.parquet")

    from banksy_spark.streaming.stateful import rate_limit_stateful

    stream = read_events_stream(spark, str(src)).filter(F.col("event_type") == "error")
    limited = rate_limit_stateful(stream)
    q = (
        limited.writeStream.format("memory")
        .queryName("stateful_rl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), 'stream did not finish in time'
    out = spark.sql("SELECT * FROM stateful_rl")
    assert out.count() > 0
    per_day = out.groupBy("user_id", "day").count()
    assert per_day.agg(F.max("count")).first()[0] <= 3
    # nth_today is a proper 1..3 counter within each (user, day)
    bad = out.filter((F.col("nth_today") < 1) | (F.col("nth_today") > 3))
    assert bad.count() == 0


def test_dedup_within_watermark_stream(spark, events_dir, tmp_path):
    from banksy_spark.streaming.core import dedup_earliest_within_watermark

    stream = read_events_stream(spark, events_dir)
    q = (
        dedup_earliest_within_watermark(stream)
        .writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), 'stream did not finish in time'
    out = spark.sql("SELECT user_id, event_type FROM dedup_wm")
    # exactly one row per observed (user, event_type) key
    assert out.count() == out.distinct().count() > 0


def test_stream_stream_interval_join_equals_batch(spark, events_dir, tmp_path):
    from banksy_spark.streaming.core import purchase_attribution_stream

    stream = read_events_stream(spark, events_dir)
    purchases = stream.filter(F.col("event_type") == "purchase")
    clicks = stream.filter(F.col("event_type") == "click")
    q = (
        purchase_attribution_stream(purchases, clicks)
        .writeStream.format("memory")
        .queryName("attribution")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), 'stream did not finish in time'
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM attribution").collect()
    }
    # batch twin over the same file
    from banksy_spark.suite import REGISTRY
    batch = REGISTRY["stream_interval_join"].fn(spark, SF_SMOKE)
    want = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stateful_limiter_equals_batch_twin(spark, tmp_path):
    """The applyInPandasWithState limiter and its applyInPandas batch
    twin (the oracle-checked suite form) agree on a single batch."""
    import shutil

    from banksy_spark.streaming.stateful import rate_limit_batch, rate_limit_stateful

    src = tmp_path / "twin_in"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "a.parquet")

    stream = read_events_stream(spark, str(src)).filter(F.col("event_type") == "error")
    q = (
        rate_limit_stateful(stream)
        .writeStream.format("memory")
        .queryName("stateful_twin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_twin"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        (r.event_id, r.day, r.nth_today)
        for r in spark.sql("SELECT * FROM stateful_twin").collect()
    }

    from banksy_spark.suite.registry import T

    batch = T(spark, SF_SMOKE, "events").filter(F.col("event_type") == "error")
    want = {
        (r.event_id, str(r.day), r.nth_today)
        for r in rate_limit_batch(batch).collect()
    }
    assert got == want and len(got) > 0


def test_hopping_window_stream_equals_batch(spark, events_dir, tmp_path):
    from banksy_spark.streaming import hopping_hourly_sums

    stream = read_events_stream(spark, events_dir)
    q = (
        hopping_hourly_sums(stream)
        .writeStream.format("memory")
        .queryName("hopping_sums")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_hop"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        (str(r.win_start), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM hopping_sums").collect()
    }
    from banksy_spark.suite.registry import T

    batch = hopping_hourly_sums(T(spark, SF_SMOKE, "events"))
    want = {(str(r.win_start), r.event_type): r.n_events for r in batch.collect()}
    assert got == want and len(want) > 0


def test_session_window_stream_equals_batch(spark, events_dir, tmp_path):
    from banksy_spark.streaming import session_window_counts

    stream = read_events_stream(spark, events_dir)
    q = (
        session_window_counts(stream)
        .writeStream.format("memory")
        .queryName("session_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM session_counts").collect()
    }
    from banksy_spark.suite.registry import T

    batch = session_window_counts(T(spark, SF_SMOKE, "events"))
    want = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events)
        for r in batch.collect()
    }
    assert got == want and len(want) > 0


def test_incremental_lsh_dedup_stream_equals_batch(spark, tmp_path):
    # Ingest the corpus as 3 ordered parquet drops; the per-batch
    # store-probe decisions must equal the all-at-once batch
    # canonicalization (earliest-wins via min band-collider).
    import os

    import pandas as pd

    from banksy_spark.streaming.dedup_incremental import (
        batch_canonical,
        incremental_lsh_dedup,
        read_docs_stream,
    )
    from tests.conftest import SF_ORACLE

    pdf = pd.read_parquet(f"{SF_ORACLE}/documents.parquet").sort_values("doc_id")
    d = tmp_path / "docs_in"
    d.mkdir()
    n = len(pdf)
    for i in range(3):
        part = pdf.iloc[i * n // 3 : (i + 1) * n // 3]
        p = d / f"batch-{i}.parquet"
        part.to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i * 60, 1_000_000 + i * 60))

    stream = read_docs_stream(spark, str(d))
    assert stream.isStreaming
    q = incremental_lsh_dedup(
        stream,
        str(tmp_path / "band_store"),
        str(tmp_path / "decisions"),
        str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(240), "stream did not finish in time"

    got = {
        r.doc_id: (r.is_dup, r.canonical_id)
        for r in spark.read.parquet(str(tmp_path / "decisions")).collect()
    }
    want = {
        r.doc_id: (r.is_dup, r.canonical_id)
        for r in batch_canonical(spark, SF_ORACLE).collect()
    }
    assert got == want
    assert len(want) > 0 and any(v[0] for v in want.values()), "fixture has real dups"


def test_transform_with_state_first_seen_across_batches(spark, tmp_path):
    """First-seen dedup emits each user exactly once even when the same
    data arrives in two micro-batches (two file copies,
    maxFilesPerTrigger=1). The incremental run ALWAYS executes via the
    applyInPandasWithState twin (first_seen_stream_gs); the typed-state
    transformWithStateInPandas form additionally runs when its protocol
    dependency (google.protobuf) exists — the plan/schema build is
    asserted either way."""
    src = tmp_path / "tws_in"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "a.parquet")
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "b.parquet")

    from banksy_spark.streaming.transform_state import (
        first_seen_batch,
        first_seen_stream,
        first_seen_stream_gs,
    )
    from banksy_spark.suite.registry import T

    batch = T(spark, SF_SMOKE, "events")
    want = {(r["user_id"], r["event_id"]) for r in first_seen_batch(batch).collect()}
    assert len(want) == batch.select("user_id").distinct().count()

    # typed-state plan builds regardless (analysis catches schema errors)
    stream = read_events_stream(spark, str(src))
    tws = first_seen_stream(stream)
    assert tws.isStreaming
    assert [f.name for f in tws.schema.fields] == ["user_id", "event_id", "ts"]

    def run(df, name, ckpt):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish in time"
        return {
            (r["user_id"], r["event_id"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    got = run(first_seen_stream_gs(read_events_stream(spark, str(src))),
              "gs_first_seen", "ckpt_gs")
    assert got == want
    assert len(got) == batch.select("user_id").distinct().count()

    try:
        import google.protobuf  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False  # typed-state runtime gated; GS twin ran above
    if has_protobuf:
        assert run(tws, "tws_first_seen", "ckpt_tws") == want


def test_stateful_ewma_stream_equals_batch(spark, tmp_path):
    """The applyInPandasWithState EWMA must reproduce the batch fold
    (w_ewma) exactly when the stream delivers each user's timeline in
    order: events time-split into two files, processed one per batch
    in modification order — the acc carries across the batch boundary."""
    import time as _time

    from banksy_spark.streaming.ewma import ewma_stream
    from banksy_spark.suite.registry import T

    batch = T(spark, SF_SMOKE, "events")
    mid = batch.agg(F.expr("percentile_approx(CAST(ts AS DOUBLE), 0.5)")).first()[0]
    early = batch.filter(F.col("ts").cast("double") <= mid)
    late = batch.filter(F.col("ts").cast("double") > mid)
    src = tmp_path / "ewma_in"
    src.mkdir()
    early.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "e1"))
    _time.sleep(1.1)  # file-source orders by modification time
    late.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "e2"))
    for i, d in enumerate(("e1", "e2")):
        for f in (tmp_path / d).glob("*.parquet"):
            shutil.copy(f, src / f"{i}.parquet")
            _time.sleep(1.1)

    stream = read_events_stream(spark, str(src))
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in spark.sql("SELECT * FROM ewma_stream").collect()
    }
    from banksy_spark.suite import REGISTRY

    want = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in REGISTRY["w_ewma"].fn(spark, SF_SMOKE).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want, "incremental EWMA diverged from the batch fold"


def test_cms_maintenance_stream_equals_batch(spark, tmp_path):
    """The foreachBatch-maintained CMS grid must equal the one-shot
    batch grid cell-for-cell after streaming the events in two
    micro-batches (sketch merge == recompute, the IVM property)."""
    from banksy_spark.streaming.cms import cms_maintenance_stream
    from banksy_spark.suite.registry import T
    from banksy_spark.suite.round4 import cms_cells

    src = tmp_path / "cms_in"
    src.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "a.parquet")
    shutil.copy(f"{SF_SMOKE}/events.parquet", src / "b.parquet")
    store = str(tmp_path / "cms_store")

    stream = read_events_stream(spark, str(src))
    q = (
        cms_maintenance_stream(stream, store)
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"

    got = {(r.r, r.cell): r.cnt for r in spark.read.parquet(store).collect()}
    # the stream saw the events twice (two copies) -> 2x the batch counts
    batch = cms_cells(T(spark, SF_SMOKE, "events").select("user_id"))
    want = {(r.r, r.cell): 2 * r.cnt for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stateful_attribution_stream_equals_batch(spark, tmp_path):
    """The applyInPandasWithState last-touch attribution must
    re-aggregate to the batch query's per-channel (purchases,
    revenue-cents) exactly: events time-split into two files processed
    one per batch, the carried touchpoint crossing the boundary."""
    import time as _time

    from banksy_spark.streaming.attribution import attribution_stream
    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T

    batch = T(spark, SF_SMOKE, "events")
    mid = batch.agg(F.expr("percentile_approx(CAST(ts AS DOUBLE), 0.5)")).first()[0]
    early = batch.filter(F.col("ts").cast("double") <= mid)
    late = batch.filter(F.col("ts").cast("double") > mid)
    src = tmp_path / "attr_in"
    src.mkdir()
    early.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "a1"))
    _time.sleep(1.1)
    late.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "a2"))
    for i, d in enumerate(("a1", "a2")):
        for f in (tmp_path / d).glob("*.parquet"):
            shutil.copy(f, src / f"{i}.parquet")
            _time.sleep(1.1)

    stream = read_events_stream(spark, str(src))
    q = (
        attribution_stream(stream)
        .writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attr"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"

    got = {}
    for r in spark.sql(
        "SELECT channel, COUNT(*) AS purchases,"
        " SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents"
        " FROM attr_stream GROUP BY channel"
    ).collect():
        got[r["channel"]] = (r["purchases"], r["cents"])

    want = {}
    for r in REGISTRY["stream_attribution"].fn(spark, SF_SMOKE).collect():
        want[r["channel"]] = (r["purchases"], round(r["revenue"] * 100))

    assert len(got) == len(want) > 0
    assert got == want, "incremental attribution diverged from batch window"


def test_stateful_cusum_stream_equals_batch(spark, tmp_path):
    """The applyInPandasWithState CUSUM must reproduce the batch fold
    (w_cusum_changepoint) exactly when the daily series arrives split
    across two micro-batches: (mu, sigma) are fitted offline by
    cusum_parts and frozen as online-detector parameters — the
    standard fit-offline/monitor-online sequential-test split."""
    import time as _time

    from banksy_spark.streaming.cusum import cusum_stream
    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.round5 import cusum_parts

    daily, stats = cusum_parts(spark, SF_SMOKE)
    params = {r["pri"]: (r["mu"], r["sigma"]) for r in stats.collect()}

    day_l = F.col("day").cast("timestamp").cast("long")
    mid = daily.agg(F.expr(
        "percentile_approx(CAST(CAST(day AS TIMESTAMP) AS LONG), 0.5)"
    )).first()[0]
    early = daily.filter(day_l <= mid)
    late = daily.filter(day_l > mid)
    src = tmp_path / "cusum_in"
    src.mkdir()
    early.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "c1"))
    late.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "c2"))
    import os as _os

    now = _time.time()
    for i, d in enumerate(("c1", "c2")):
        for f in (tmp_path / d).glob("*.parquet"):
            dst = src / f"part-{i}.parquet"
            shutil.copy(f, dst)
            # file source orders batches by mtime at MS resolution —
            # sub-ms copy times tie and flip batch order; pin explicitly
            _os.utime(dst, (now + 10 * i, now + 10 * i))

    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        cusum_stream(stream, params)
        .writeStream.format("memory")
        .queryName("cusum_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cusum"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        (r["pri"], r["day"]): (r["cents"], r["s_pos"], r["drift"])
        for r in spark.sql("SELECT * FROM cusum_out").collect()
    }
    want = {
        (r["pri"], r["day"]): (r["cents"], r["s_pos"], r["drift"])
        for r in REGISTRY["w_cusum_changepoint"].fn(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(want) > 100


def test_stateful_capped_sessions_stream_equals_batch(spark, tmp_path):
    """The applyInPandasWithState capped sessionizer must reproduce the
    batch fold (w_capped_sessions) exactly when events arrive time-split
    across two micro-batches: session_id, last-event time, and the
    session-start anchor all carry across the batch boundary, so a
    session spanning the split is neither re-opened nor re-capped."""
    import os as _os
    import time as _time

    from banksy_spark.streaming.sessions import capped_sessions_stream
    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T

    batch = T(spark, SF_SMOKE, "events")
    mid = batch.agg(F.expr("percentile_approx(CAST(ts AS DOUBLE), 0.5)")).first()[0]
    early = batch.filter(F.col("ts").cast("double") <= mid)
    late = batch.filter(F.col("ts").cast("double") > mid)
    src = tmp_path / "sess_in"
    src.mkdir()
    early.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s1"))
    late.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "s2"))
    now = _time.time()
    for i, d in enumerate(("s1", "s2")):
        for f in (tmp_path / d).glob("*.parquet"):
            dst = src / f"part-{i}.parquet"
            shutil.copy(f, dst)
            _os.utime(dst, (now + 10 * i, now + 10 * i))

    stream = read_events_stream(spark, str(src))
    q = (
        capped_sessions_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    want = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in REGISTRY["w_capped_sessions"].fn(spark, SF_SMOKE).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want, "incremental capped sessions diverged from batch fold"


def test_stateful_holt_stream_equals_batch(spark, tmp_path):
    """The applyInPandasWithState Holt fold must reproduce the batch
    recursion (w_holt_linear) exactly when the daily series arrives
    split across two micro-batches: (t, level, trend) carry across the
    boundary so the first post-split point smooths against the carried
    state, not a re-initialized one."""
    import os as _os
    import time as _time

    from banksy_spark.streaming.holt import holt_stream
    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.round5 import cusum_parts

    daily, _stats = cusum_parts(spark, SF_SMOKE)
    day_l = F.col("day").cast("timestamp").cast("long")
    mid = daily.agg(F.expr(
        "percentile_approx(CAST(CAST(day AS TIMESTAMP) AS LONG), 0.5)"
    )).first()[0]
    early = daily.filter(day_l <= mid)
    late = daily.filter(day_l > mid)
    src = tmp_path / "holt_in"
    src.mkdir()
    early.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "h1"))
    late.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "h2"))
    now = _time.time()
    for i, d in enumerate(("h1", "h2")):
        for f in (tmp_path / d).glob("*.parquet"):
            dst = src / f"part-{i}.parquet"
            shutil.copy(f, dst)
            _os.utime(dst, (now + 10 * i, now + 10 * i))

    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        holt_stream(stream)
        .writeStream.format("memory")
        .queryName("holt_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_holt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    got = {
        (r["pri"], r["day"]): (r["cents"], r["level"], r["trend"])
        for r in spark.sql("SELECT * FROM holt_out").collect()
    }
    want = {
        (r["pri"], r["day"]): (r["cents"], r["level"], r["trend"])
        for r in REGISTRY["w_holt_linear"].fn(spark, SF_SMOKE).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want, "incremental Holt diverged from the batch fold"


# --- End-to-end scan app: scrape pages -> alerts, stream == batch -----------


def _odds_page(rows):
    """Minimal odds page in the reference's scraped shape: banner row,
    header AS data, one <tr> per team."""
    trs = "".join(
        f"<tr><td>{t}</td><td>{dk}</td><td>{fd}</td><td>{cz}</td></tr>"
        for t, dk, fd, cz in rows
    )
    return (
        "<table><tr><td colspan='4'>banner</td></tr>"
        "<tr><td>Team</td><td>DraftKings</td><td>FanDuel</td><td>Caesars</td></tr>"
        f"{trs}</table>"
    )


_EPOCHS = [
    # (alert_ts, {sport: page rows}) — the same NFL game arbs in every
    # scan; max_per_day=2 must let epochs 1-2 alert and suppress epoch 3
    ("2024-05-01 12:00:00", [("Alpha", "+150", "+140", "N/A"), ("Beta", "+120", "N/A", "+130")]),
    ("2024-05-01 13:00:00", [("Alpha", "+155", "+140", "N/A"), ("Beta", "+120", "N/A", "+135")]),
    ("2024-05-01 14:00:00", [("Alpha", "+160", "+140", "N/A"), ("Beta", "+120", "N/A", "+140")]),
]


def test_scan_app_stream_equals_batch_with_replay(spark, tmp_path):
    """Round 7 (VERDICT r6 item 6): the full reference loop as one
    streaming app — scrape payloads -> S1 parse -> normalize ->
    arbitrage -> sign audit + daily rate limit -> notify + alert-log
    state — over 3 micro-batches, equals the sequential batch form,
    and a REPLAYED epoch (Structured Streaming's at-least-once
    redelivery) delivers nothing and leaves the state identical
    (exercises upsert_batch's staging-rename swap under replay)."""
    from banksy_spark.streaming.app import process_scan_epoch, run_scan_stream

    payload_dir = str(tmp_path / "payloads")
    ckpt = str(tmp_path / "ckpt")
    state_s = str(tmp_path / "state_stream")
    state_b = str(tmp_path / "state_batch")
    posts_s: list[str] = []
    posts_b: list[str] = []

    # stream side: one payload file per scan cycle, drained as its own
    # micro-batch (availableNow after each drop => 3 micro-batches)
    for ts, rows in _EPOCHS:
        spark.createDataFrame(
            [("NFL", _odds_page(rows), ts)], "sport string, payload string, alert_ts string"
        ).write.mode("append").parquet(payload_dir)
        q = run_scan_stream(
            spark, payload_dir, ckpt, state_s, posts_s.append, max_per_day=2
        )
        q.awaitTermination(120)

    # batch twin: the same epochs folded sequentially through the same
    # pure scan function against a separate state dir
    for ts, rows in _EPOCHS:
        process_scan_epoch(
            spark, {"NFL": _odds_page(rows)}, ts, state_b, posts_b.append,
            max_per_day=2,
        )

    assert posts_s == posts_b
    assert len(posts_s) == 2, posts_s  # epoch 3 rate-limited away
    assert "Alpha" in posts_s[0] and "Beta" in posts_s[0]

    def state(p):
        return {
            (r["Team"], str(r["updated_at"]), r["combined"])
            for r in spark.read.parquet(p).collect()
        }

    assert state(state_s) == state(state_b)
    assert len(state(state_s)) == 4  # 2 teams x 2 delivered epochs

    # replayed epoch: redeliver scan 2 into the stream state — nothing
    # sends, the upsert path re-merges to the identical table
    before = state(state_s)
    ts2, rows2 = _EPOCHS[1]
    sent = process_scan_epoch(
        spark, {"NFL": _odds_page(rows2)}, ts2, state_s, posts_s.append,
        max_per_day=2,
    )
    assert sent == 0
    assert posts_s == posts_b
    assert state(state_s) == before


def test_stateful_sprt_equals_batch_twin_across_batches(spark, tmp_path):
    """The streaming SPRT monitor fires the SAME decisions at the SAME
    trial counts as the oracle-checked batch query, with the event file
    split into two time-ordered chunks so state must carry across
    micro-batches (maxFilesPerTrigger=1)."""
    from banksy_spark.streaming.stateful import sprt_monitor_stateful

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    cut = ev.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    src = tmp_path / "sprt_in"
    src.mkdir()
    # two chunks in event-time order: earlier half then later half
    ev.filter(F.col("ts") <= cut).coalesce(1).write.parquet(str(src / "a"))
    ev.filter(F.col("ts") > cut).coalesce(1).write.parquet(str(src / "b"))
    import shutil

    for sub, name in (("a", "0_first.parquet"), ("b", "1_second.parquet")):
        part = next((src / sub).glob("part-*.parquet"))
        shutil.move(str(part), str(src / name))
        shutil.rmtree(src / sub)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sprt_monitor_stateful(stream)
        .writeStream.format("memory")
        .queryName("sprt_mon")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sprt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        r.day: (r.n_at_decision, r.k_at_decision, r.decision)
        for r in spark.sql("SELECT * FROM sprt_mon").collect()
    }
    from banksy_spark.suite import REGISTRY

    batch = REGISTRY["ml_sprt_sequential"].fn(spark, SF_SMOKE)
    want = {
        str(r.day): (r.n_at_decision, r.decision)
        for r in batch.filter(F.col("decision") != "continue").collect()
    }
    assert set(got) == set(want) and len(want) >= 5
    for day, (n_dec, k_dec, decision) in got.items():
        assert want[day] == (n_dec, decision)
        # the streaming k is internally consistent with its own n
        assert 0 <= k_dec <= n_dec


def test_space_saving_heavy_hitters_guarantees(spark, tmp_path):
    """Streaming Space-Saving across two micro-batches: (a) every item
    whose true count exceeds N_shard/capacity is tracked, (b) estimates
    bracket the truth (true <= est <= true + err), (c) state stays
    bounded at capacity entries per shard."""
    from banksy_spark.streaming.stateful import heavy_hitters_stateful

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    cut = ev.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    src = tmp_path / "hh_in"
    src.mkdir()
    import shutil

    for flt, name in ((F.col("ts") <= cut, "0_a"), (F.col("ts") > cut, "1_b")):
        ev.filter(flt).coalesce(1).write.parquet(str(src / name))
        part = next((src / name).glob("part-*.parquet"))
        shutil.move(str(part), str(src / f"{name}.parquet"))
        shutil.rmtree(src / name)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        heavy_hitters_stateful(stream, "event_type", capacity=4, n_shards=2)
        .writeStream.format("memory")
        .queryName("hh_ss")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    # keep only the LAST emission per (shard, item): update mode re-emits
    out = spark.sql(
        "SELECT shard, item, est_count, max_err FROM hh_ss"
    ).toPandas()
    # memory-sink rows are unordered; counts grow monotonically, so the
    # max est per (shard, item) IS the final summary state
    final = (
        out.sort_values("est_count").groupby(["shard", "item"]).last().reset_index()
    )
    assert final.groupby("shard").size().max() <= 4
    # truth per shard (same hash sharding)
    truth = (
        ev.select(
            F.pmod(F.xxhash64("event_type"), F.lit(2)).cast("int").alias("shard"),
            F.col("event_type").alias("item"),
        )
        .groupBy("shard", "item")
        .count()
        .toPandas()
    )
    for _, t in truth.iterrows():
        n_shard = truth[truth.shard == t.shard]["count"].sum()
        row = final[(final.shard == t.shard) & (final["item"] == t["item"])]
        if t["count"] > n_shard / 4:
            assert len(row) == 1, f"frequent item {t['item']} not tracked"
        if len(row):
            est, err = int(row.est_count.iloc[0]), int(row.max_err.iloc[0])
            assert t["count"] <= est <= t["count"] + err


def test_stateful_rolling_corr_equals_batch_across_batches(spark, tmp_path):
    """The streaming rolling-corr operator emits BIT-IDENTICAL
    (brand, day, x, y, corr7) rows to the oracle-checked window query,
    with the daily series split into two time-ordered chunks so the
    (buffer, counter) state must carry across micro-batches."""
    from banksy_spark.streaming.stateful import rolling_corr_stateful
    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T

    li = T(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"
    )
    pt = T(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    daily = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .filter(F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#3"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.round("l_quantity", 0).cast("bigint")).alias("x"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .alias("y"),
        )
        .select("brand", F.col("day").cast("string").alias("day"), "x", "y")
    )
    # median ISO day as the chunk boundary (string-ordered == date-ordered)
    days = sorted(r[0] for r in daily.select("day").distinct().collect())
    cut = days[len(days) // 2]
    src = tmp_path / "rc_in"
    src.mkdir()
    import shutil

    for flt, name in (
        (F.col("day") <= cut, "0_first.parquet"),
        (F.col("day") > cut, "1_second.parquet"),
    ):
        daily.filter(flt).coalesce(1).write.parquet(str(src / "tmp"))
        part = next((src / "tmp").glob("part-*.parquet"))
        shutil.move(str(part), str(src / name))
        shutil.rmtree(src / "tmp")

    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        rolling_corr_stateful(stream)
        .writeStream.format("memory")
        .queryName("rc_mon")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_rc"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        (r.brand, r.day): (r.x, r.y, r.corr7)
        for r in spark.sql("SELECT * FROM rc_mon").collect()
    }
    want = {
        (r.brand, str(r.day)): (r.x, r.y, r.corr7)
        for r in REGISTRY["w_rolling_corr"].fn(spark, SF_SMOKE).collect()
    }
    assert len(want) >= 100
    assert set(got) == set(want)
    for k, (x, y, c) in want.items():
        gx, gy, gc = got[k]
        assert (gx, gy) == (x, y), k
        # bit-exact float parity, NaN-free by construction
        assert (gc is None and c is None) or gc == c, (k, gc, c)


def test_stateful_bollinger_equals_batch_across_batches(spark, tmp_path):
    """The streaming Bollinger operator emits BIT-IDENTICAL
    (pri, day, cents, mid, bands, breakout) rows to the oracle-checked
    window query, with the daily series split into two time-ordered
    chunks so the value buffer must carry across micro-batches."""
    from banksy_spark.streaming.stateful import bollinger_stateful
    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.round5o import _BB_WIN, _daily

    daily = _daily(spark, SF_SMOKE).select(
        "pri", F.col("day").cast("string").alias("day"), "cents"
    )
    days = sorted(r[0] for r in daily.select("day").distinct().collect())
    cut = days[len(days) // 2]
    src = tmp_path / "bb_in"
    src.mkdir()
    import shutil

    for flt, name in (
        (F.col("day") <= cut, "0_first.parquet"),
        (F.col("day") > cut, "1_second.parquet"),
    ):
        daily.filter(flt).coalesce(1).write.parquet(str(src / "tmp"))
        part = next((src / "tmp").glob("part-*.parquet"))
        shutil.move(str(part), str(src / name))
        shutil.rmtree(src / "tmp")

    stream = (
        spark.readStream.schema(daily.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        bollinger_stateful(stream, window=_BB_WIN)
        .writeStream.format("memory")
        .queryName("bb_mon")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bb"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        (r.pri, r.day): (r.cents, r.mid, r.lower_band, r.upper_band, r.breakout_up)
        for r in spark.sql("SELECT * FROM bb_mon").collect()
    }
    want = {
        (r.pri, str(r.day)): (r.cents, r.mid, r.lower_band, r.upper_band, r.breakout_up)
        for r in REGISTRY["w_bollinger_bands"].fn(spark, SF_SMOKE).collect()
    }
    assert len(want) >= 100
    assert set(got) == set(want)
    assert got == want  # bit-exact floats, no tolerance


def _events_two_chunks(spark, tmp_path, cols):
    """The shared two-chunk split for events-table stateful twins:
    write the normalized events as two time-ordered parquet files so
    maxFilesPerTrigger=1 forces the state to carry across micro-batches
    (same discipline as the Bollinger test above)."""
    from banksy_spark.suite.registry import T

    e = T(spark, SF_SMOKE, "events").select(*cols)
    cut = e.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    src = tmp_path / "ev_in"
    src.mkdir()
    for flt, name in (
        (F.col("ts") <= cut, "0_first.parquet"),
        (F.col("ts") > cut, "1_second.parquet"),
    ):
        e.filter(flt).coalesce(1).write.parquet(str(src / "tmp"))
        part = next((src / "tmp").glob("part-*.parquet"))
        shutil.move(str(part), str(src / name))
        shutil.rmtree(src / "tmp")
    return (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


def test_stateful_capped_balance_equals_batch_across_batches(spark, tmp_path):
    """The streaming token bucket emits BIT-IDENTICAL
    (event_id, user_id, capped_balance) rows to the oracle-checked
    w_capped_running_sum, with the events split into two time-ordered
    chunks so every user's one-double balance must carry across
    micro-batches."""
    from banksy_spark.streaming.stateful import capped_balance_stateful
    from banksy_spark.suite import REGISTRY

    stream = _events_two_chunks(
        spark, tmp_path, ["event_id", "user_id", "ts", "value"]
    )
    q = (
        capped_balance_stateful(stream)
        .writeStream.format("memory")
        .queryName("cb_mon")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cb"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        r.event_id: (r.user_id, r.capped_balance)
        for r in spark.sql("SELECT * FROM cb_mon").collect()
    }
    want = {
        r.event_id: (r.user_id, r.capped_balance)
        for r in REGISTRY["w_capped_running_sum"].fn(spark, SF_SMOKE).collect()
    }
    assert len(want) >= 1000
    assert got == want  # bit-exact floats, no tolerance


def test_stateful_markov_pairs_equal_batch_across_batches(spark, tmp_path):
    """The streaming last-event pairing emits the SAME transition
    multiset as stream_markov_transitions' lead() window, with the
    per-user last event carried across two micro-batches."""
    import collections

    from banksy_spark.streaming.stateful import markov_pairs_stateful
    from banksy_spark.suite import REGISTRY

    stream = _events_two_chunks(
        spark, tmp_path, ["event_id", "user_id", "ts", "event_type"]
    )
    q = (
        markov_pairs_stateful(stream)
        .writeStream.format("memory")
        .queryName("mk_mon")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = collections.Counter(
        (r.from_type, r.to_type)
        for r in spark.sql("SELECT * FROM mk_mon").collect()
    )
    want = {
        (r.from_type, r.to_type): r.n
        for r in REGISTRY["stream_markov_transitions"].fn(spark, SF_SMOKE).collect()
    }
    assert sum(want.values()) >= 900
    assert dict(got) == want


def test_ohlc_candles_stream_equals_batch(spark, events_dir, tmp_path):
    """OHLC via min_by/max_by is a DECLARATIVE windowed aggregation —
    streaming state per open candle is one candidate per extreme and
    the merge is associative, so the stream must equal the batch form
    bit-for-bit (values pass through unsummed). Twin of the
    oracle-checked suite query w_ohlc_resample (window.start ==
    date_trunc hour)."""
    from banksy_spark.streaming import ohlc_candles

    stream = read_events_stream(spark, events_dir)
    q = (
        ohlc_candles(stream)
        .writeStream.format("memory")
        .queryName("ohlc_candles")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_ohlc"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        (str(r.hour), r.event_type): (
            r.open_value, r.high_value, r.low_value, r.close_value, r.n_events
        )
        for r in spark.sql("SELECT * FROM ohlc_candles").collect()
    }
    from banksy_spark.suite.registry import T

    batch = ohlc_candles(T(spark, SF_SMOKE, "events"))
    want = {
        (str(r.hour), r.event_type): (
            r.open_value, r.high_value, r.low_value, r.close_value, r.n_events
        )
        for r in batch.collect()
    }
    assert got == want and len(want) > 0


def test_file_stats_manifest_stream_equals_batch(spark, tmp_path):
    """Incremental file-stats manifest (the lakehouse pruning manifest
    maintained AT WRITE TIME): orders arrive in three shuffled splits,
    one per micro-batch (maxFilesPerTrigger=1), so most files' stats
    rows are updated across multiple batches — count/min/max state
    merges associatively and the final manifest must equal the batch
    form bit-for-bit. Twin of the oracle-checked manifest CTE in
    suite.round12.o_manifest_prune / round11.o_file_skipping_stats."""
    from banksy_spark.streaming import file_stats_manifest
    from banksy_spark.suite.registry import T

    orders = T(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderdate")
    d = tmp_path / "orders_in"
    # deterministic 3-way split that interleaves every file's key range
    # across batches: split by orderkey mod 3, write one file per split
    for i in range(3):
        orders.filter(F.col("o_orderkey") % 3 == i).coalesce(1).write.parquet(
            str(d), mode="append"
        )
    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        file_stats_manifest(stream)
        .writeStream.format("memory")
        .queryName("file_manifest")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_manifest"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        r.file_id: (r.n_rows, r.min_key, r.max_key, str(r.min_date), str(r.max_date))
        for r in spark.sql("SELECT * FROM file_manifest").collect()
    }
    want = {
        r.file_id: (r.n_rows, r.min_key, r.max_key, str(r.min_date), str(r.max_date))
        for r in file_stats_manifest(orders).collect()
    }
    assert got == want and len(want) > 0


def test_kde_cell_density_stream_equals_batch(spark, tmp_path):
    """Incremental KDE heatmap: events arrive in three modulo splits
    (maxFilesPerTrigger=1), so most cells' (density_ppm, n_pts) state
    merges across micro-batches — integer sums merge associatively and
    the final surface must equal both the batch form AND the
    oracle-checked a_kde_epanechnikov output bit-for-bit."""
    from banksy_spark.streaming import kde_cell_density
    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T

    pts = T(spark, SF_SMOKE, "events").selectExpr(
        "value AS px", "CAST(user_id % 100 AS DOUBLE) AS py", "event_id"
    )
    d = tmp_path / "kde_in"
    for i in range(3):
        pts.filter(F.col("event_id") % 3 == i).select("px", "py").coalesce(
            1
        ).write.parquet(str(d), mode="append")
    stream = (
        spark.readStream.schema("px double, py double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        kde_cell_density(stream)
        .writeStream.format("memory")
        .queryName("kde_cells")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_kde"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        (r.jx, r.jy): (r.density_ppm, r.n_pts)
        for r in spark.sql("SELECT * FROM kde_cells").collect()
    }
    want_batch = {
        (r.jx, r.jy): (r.density_ppm, r.n_pts)
        for r in kde_cell_density(pts.select("px", "py")).collect()
    }
    assert got == want_batch and len(got) > 0
    # and the occupied-cell projection equals the oracle-checked query
    want_query = {
        (r.ix, r.iy): (r.density_ppm, r.n_pts)
        for r in REGISTRY["a_kde_epanechnikov"].fn(spark, SF_SMOKE).collect()
    }
    occupied = {k: v for k, v in got.items() if v[1] > 0}
    assert {k: (v[1], v[0]) for k, v in want_query.items()} == {
        k: (v[1], v[0]) for k, v in occupied.items()
    }


def test_reservoir_stateful_stream_equals_batch(spark, tmp_path):
    """Streaming A-ES reservoir across three shuffled micro-batches:
    per-shard state (top-50 by key) must merge-and-truncate to EXACTLY
    the batch replay's reservoir — and therefore to the per-shard
    window oracle of stream_reservoir_stateful. The final emission per
    shard is selected by the monotone n_seen counter."""
    from banksy_spark.streaming.stateful import reservoir_batch, reservoir_stateful
    from banksy_spark.suite import REGISTRY
    from banksy_spark.suite.registry import T
    from banksy_spark.suite.round13d import _RES_D, _RES_KEY, _RV_SHARDS

    d0 = spark.sql(
        _RES_D.replace("__DOCS__", "{d}"), d=T(spark, SF_SMOKE, "documents")
    )
    scored = d0.selectExpr(
        f"CAST(ABS(doc_id) % {_RV_SHARDS} AS INT) AS shard",
        "doc_id",
        "w AS weight",
        f"{_RES_KEY} AS es_key",
    )
    src = tmp_path / "rv_in"
    for i in range(3):
        scored.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            str(src), mode="append"
        )
    stream = (
        spark.readStream.schema(scored.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        reservoir_stateful(stream, k=50)
        .writeStream.format("memory")
        .queryName("rv_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_rv"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    out = spark.sql("SELECT * FROM rv_out").toPandas()
    final_seen = out.groupby("shard")["n_seen"].max()
    rows = out[
        out.apply(lambda r: r.n_seen == final_seen[r.shard], axis=1)
    ]
    got = {
        (r.shard, r.smp_rank): (r.doc_id, r.weight, r.es_key)
        for r in rows.itertuples()
    }
    want = {
        (r.shard, r.smp_rank): (r.doc_id, r.weight, r.es_key)
        for r in reservoir_batch(scored, k=50).collect()
    }
    assert got == want and len(got) > 0
    # the registry query is the same replay, projected
    reg = {
        (r.shard, r.smp_rank): (r.doc_id, r.weight, r.es_key)
        for r in REGISTRY["stream_reservoir_stateful"].fn(spark, SF_SMOKE).collect()
    }
    assert reg == want
