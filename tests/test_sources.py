"""Source/sink adapters (SURVEY §2.1 S1/S2/S5/K1-K3)."""

from __future__ import annotations

from banksy_spark.io import read_csv_dim, write_append, write_overwrite
from banksy_spark.sources import (
    blob_to_df,
    poll_until_valid,
    rows_to_df,
    send_notifications,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += s


def test_poll_until_valid_retries_then_succeeds():
    clock = FakeClock()
    payloads = iter(["", "short", "x" * 300])
    fetched = []

    def fetch():
        p = next(payloads)
        fetched.append(p)
        return p

    out = poll_until_valid(fetch, sleep=clock.sleep, clock=clock)
    assert out == "x" * 300
    assert len(fetched) == 3           # retried until valid
    assert clock.t == 4.0              # 2s between attempts (bovada_pull.py:40)


def test_poll_until_valid_gives_up_after_timeout():
    clock = FakeClock()
    out = poll_until_valid(lambda: "nope", sleep=clock.sleep, clock=clock, timeout_s=60.0)
    assert out is None
    assert clock.t >= 60.0             # gave up at the 60s budget (:34-38)


def test_blob_and_rows_sources(spark):
    assert blob_to_df(spark, "hello").count() == 1
    empty = blob_to_df(spark, None)
    assert empty.count() == 0 and empty.columns == ["payload"]
    df = rows_to_df(spark, [("A", 1), ("B", 2)], "team string, n int")
    assert df.count() == 2


def test_send_notifications_min_batch(spark):
    alerts = spark.createDataFrame([("a1",), ("a2",)], "combined string")
    posted = []
    n = send_notifications(alerts, posted.append)
    assert n == 2 and posted == ["a1\na2"]
    # below min batch (>1 row required, arbitrage_scanner.py:434): no send
    one = spark.createDataFrame([("only",)], "combined string")
    assert send_notifications(one, posted.append) == 0
    assert len(posted) == 1


def test_csv_dim_and_parquet_sinks(spark, tmp_path):
    # heterogeneous dim schemas: select the common subset (S3, :188-191)
    p = tmp_path / "teams.csv"
    p.write_text("ID,Name,Team,Abbreviation,Conference,Division,Sport\n"
                 "1,Buffalo,Bills,BUF,AFC,East,NFL\n")
    dim = read_csv_dim(spark, str(p), columns=["Team", "Abbreviation", "Sport"])
    assert dim.columns == ["Team", "Abbreviation", "Sport"]

    out = tmp_path / "sink"
    write_overwrite(dim, str(out))
    write_append(dim, str(out))
    assert spark.read.parquet(str(out)).count() == 2  # K1 overwrite + K2 append


def _scripted_fetch(payloads):
    """A fresh scripted fetch per run — last payload repeats forever."""
    seq = list(payloads)
    calls = []

    def fetch():
        p = seq[min(len(calls), len(seq) - 1)]
        calls.append(p)
        return p

    return fetch, calls


def test_scrape_stream_equals_batch_poll(spark, tmp_path):
    """Stream twin of poll_until_valid: same scripted fetch sequence →
    the sink holds exactly the payload the batch poll returns, with the
    same attempt count."""
    from banksy_spark.sources import blob_to_df, scrape_until_valid

    script = ["", "short", "x" * 300]

    fetch_b, calls_b = _scripted_fetch(script)
    clock = FakeClock()
    batch_payload = poll_until_valid(fetch_b, sleep=clock.sleep, clock=clock)

    fetch_s, calls_s = _scripted_fetch(script)
    got = scrape_until_valid(
        spark, fetch_s,
        str(tmp_path / "payloads"), str(tmp_path / "ckpt"),
        interval_s=0.05,
    )
    rows = got.collect()
    assert [r.payload for r in rows] == [batch_payload]
    assert rows[0].attempt == len(calls_b) == 3
    assert calls_s == calls_b


def test_scrape_stream_gives_up_like_batch(spark, tmp_path):
    """Give-up parity: an always-invalid fetch times out with ZERO rows
    in the sink — the same empty frame blob_to_df(None) seeds."""
    from banksy_spark.sources import blob_to_df, scrape_until_valid

    fetch, calls = _scripted_fetch(["nope"])
    got = scrape_until_valid(
        spark, fetch,
        str(tmp_path / "payloads"), str(tmp_path / "ckpt"),
        interval_s=0.05, timeout_s=0.3,
    )
    assert got.count() == 0
    assert got.columns == ["payload", "attempt"]
    assert len(calls) >= 1
    assert blob_to_df(spark, None).count() == 0  # the batch give-up twin


def test_jsonl_tolerant_quarantines_bad_lines(spark, tmp_path):
    from banksy_spark.io import read_jsonl_tolerant

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"game": "A@B", "odds": 120}\n'
        "not json at all\n"
        '{"game": "C@D", "odds": -145}\n'
        '{"game": "E@F", "odds": }\n'
    )
    # Spark disallows referencing only _corrupt_record on a raw JSON
    # scan; materialize first (see read_jsonl_tolerant docstring)
    df = read_jsonl_tolerant(spark, str(p), "game STRING, odds BIGINT").cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert good.count() == 2 and bad.count() == 2
    assert {r.game for r in good.collect()} == {"A@B", "C@D"}


def test_connected_components_checkpointing_identical(spark):
    """The converged operator and the bounded lazy form (with and
    without lineage checkpointing) agree on a graph both can solve."""
    from banksy_spark.operators.graph import (
        connected_components,
        label_propagation_cc,
    )

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    plain = {r.node: r.lab for r in connected_components(df).collect()}
    lazy = {r.node: r.lab for r in label_propagation_cc(df).collect()}
    ckpt = {
        r.node: r.lab
        for r in label_propagation_cc(df, checkpoint_every=2).collect()
    }
    assert plain == lazy == ckpt and plain[4] == 1


def test_dsv2_scrape_source_stream_equals_batch(spark, tmp_path):
    """VERDICT r4 item 6: the DSv2 scrape source (rate limit + validity
    predicate + give-up timeout) must deliver exactly what the batch
    poll loop delivers for the same scripted fetch sequence — one
    (attempt, payload) row on success, zero rows on give-up — in BOTH
    its batch and streaming forms."""
    import time

    from banksy_spark.sources.adapters import poll_until_valid
    from banksy_spark.sources.fetchers import flaky_then_valid, never_valid
    from banksy_spark.sources.scrape_source import register_scrape_source

    register_scrape_source(spark)

    def opts(reader, factory, timeout_s):
        return (
            reader.format("scrape")
            .option("fetcher", f"banksy_spark.sources.fetchers:{factory}")
            .option("min_len", "50")
            .option("timeout_s", str(timeout_s))
            .option("interval_s", "0.01")
            .option("sys_path", "/root/repo")
        )

    def run_stream(factory, timeout_s, name):
        q = (
            opts(spark.readStream, factory, timeout_s)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql(f"SELECT * FROM {name}").collect()
            if rows or factory == "never_valid" and time.time() > deadline - 85:
                # give-up case: wait a grace period, then accept empty
                if factory == "never_valid":
                    time.sleep(2)
                    rows = spark.sql(f"SELECT * FROM {name}").collect()
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(30)
        return [(r["attempt"], r["payload"]) for r in rows]

    # driver-side oracle of record: the adapter poll loop
    want_payload = poll_until_valid(
        flaky_then_valid(), min_len=50, timeout_s=10, interval_s=0,
        sleep=lambda _s: None, clock=lambda: 0.0,
    )
    assert want_payload is not None

    batch = opts(spark.read, "flaky_then_valid", 10).load().collect()
    assert [(r["attempt"], r["payload"]) for r in batch] == [(3, want_payload)]
    assert run_stream("flaky_then_valid", 10, "dsv2_ok") == [(3, want_payload)]

    # give-up arm: always-invalid payload, tiny budget -> zero rows
    assert poll_until_valid(
        never_valid(), min_len=50, timeout_s=0.02, interval_s=0.01,
        sleep=lambda _s: None,
    ) is None
    assert opts(spark.read, "never_valid", 0.02).load().collect() == []
    assert run_stream("never_valid", 0.02, "dsv2_giveup") == []


def test_dsv2_notify_sink_applies_min_batch_rule(spark, tmp_path):
    """The DSv2 notification sink must behave exactly like the
    send_notifications adapter (K3): a micro-batch with >=2 alerts
    posts ONE newline-joined push; a 1-alert batch posts nothing.
    Two parquet files with pinned mtimes -> two micro-batches."""
    import os
    import shutil
    import time

    from banksy_spark.sources.notify_sink import (
        read_pushes,
        register_notify_sink,
    )

    register_notify_sink(spark)
    src = tmp_path / "alerts_in"
    src.mkdir()
    spark.createDataFrame([("a1",), ("a2",)], "combined string").coalesce(
        1
    ).write.parquet(str(tmp_path / "b1"))
    spark.createDataFrame([("only",)], "combined string").coalesce(1).write.parquet(
        str(tmp_path / "b2")
    )
    now = time.time()
    for i, d in enumerate(("b1", "b2")):
        for f in (tmp_path / d).glob("*.parquet"):
            dst = src / f"part-{i}.parquet"
            shutil.copy(f, dst)
            os.utime(dst, (now + 10 * i, now + 10 * i))

    log = tmp_path / "pushes.log"
    q = (
        spark.readStream.schema("combined string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.format("notify")
        .option("path", str(log))
        .option("checkpointLocation", str(tmp_path / "ckpt_notify"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    pushes = read_pushes(str(log))
    assert len(pushes) == 1, f"exactly the 2-alert batch sends: {pushes}"
    assert sorted(pushes[0].split("\n")) == ["a1", "a2"]


def test_dynamic_partition_overwrite_backfills_one_day(spark, tmp_path):
    """write_partition_overwrite must replace ONLY the partitions in
    the frame: backfilling day 2 leaves days 1 and 3 byte-identical."""
    from banksy_spark.io import write_overwrite, write_partition_overwrite

    p = str(tmp_path / "fact")
    full = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "day int, k string, v int"
    )
    write_overwrite(full, p, partition_by=["day"])
    fix = spark.createDataFrame([(2, "b2", 99)], "day int, k string, v int")
    write_partition_overwrite(fix, p, partition_by=["day"])
    got = {
        (r["day"], r["k"], r["v"]) for r in spark.read.parquet(p).collect()
    }
    assert got == {(1, "a", 10), (2, "b2", 99), (3, "c", 30)}
    # the conf must be restored (static) after the scoped write
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"
    )


def test_upsert_batch_is_idempotent_under_replay(spark, tmp_path):
    """Replaying the same micro-batch through upsert_batch must
    converge to the identical state (the foreachBatch exactly-once
    contract under at-least-once redelivery)."""
    from banksy_spark.io import upsert_batch

    p = str(tmp_path / "state")
    b1 = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    upsert_batch(b1, p, ["id"])
    b2 = spark.createDataFrame([(2, "y2"), (3, "z")], "id int, v string")
    upsert_batch(b2, p, ["id"])
    want = {(1, "x"), (2, "y2"), (3, "z")}
    got = {(r["id"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got == want
    # replay batch 2 — state must not change
    upsert_batch(b2, p, ["id"])
    got2 = {(r["id"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got2 == want


def test_upsert_batch_version_col_picks_deterministic_winner(spark, tmp_path):
    """A batch with duplicate keys + version_col keeps exactly the
    highest-version row per key (the documented last-write-wins
    contract), and no staging directory is left behind."""
    import os

    from banksy_spark.io import upsert_batch

    p = str(tmp_path / "vstate")
    b = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "only", 7)],
        "id int, v string, ver int",
    )
    upsert_batch(b, p, ["id"], version_col="ver")
    got = {(r["id"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got == {(1, "new"), (2, "only")}
    # merge against existing state, replayed twice — still converges
    b2 = spark.createDataFrame(
        [(2, "upd", 8), (2, "stale", 3)], "id int, v string, ver int"
    )
    for _ in range(2):
        upsert_batch(b2, p, ["id"], version_col="ver")
        got = {(r["id"], r["v"]) for r in spark.read.parquet(p).collect()}
        assert got == {(1, "new"), (2, "upd")}
    assert not os.path.exists(p + "__staging__")


def test_html_table_parse_matches_declared_rows():
    """S1 (round 7): the regex <tr>/<td> extractor must emit exactly
    the raw rows the oracle fixture declares — first table only,
    nested markup dropped, entities decoded, ends stripped, ragged
    rows left ragged (promote_header squares them)."""
    from banksy_spark.sources.adapters import first_table_rows, parse_html_tables
    from banksy_spark.suite.pipe_scrape import _RAW_TR_ROWS, PAGES

    for sport, page in PAGES.items():
        want = [
            [c for c in r[2:] if c is not None]
            for r in _RAW_TR_ROWS
            if r[0] == sport
        ]
        got = first_table_rows(page)
        assert got == want, (sport, got)
    # the NFL page's second (footer) table exists but is not the first
    assert len(parse_html_tables(PAGES["NFL"])) == 2
    assert parse_html_tables("<p>no tables here</p>") == []


def test_html_header_promotion_reference_semantics():
    """promote_header mirrors arbitrage_scanner.py:61-66 + :142-143:
    banner dropped, blank-first-cell rows dropped, header promoted
    from DATA, mid-table repeated headers deleted, ragged rows padded
    to header width with None."""
    from banksy_spark.sources.adapters import first_table_rows, promote_header
    from banksy_spark.suite.pipe_scrape import PAGES

    header, data = promote_header(first_table_rows(PAGES["NFL"]))
    assert header == ["Team", "Time", "DraftKings", "FanDuel", "Caesars"]
    teams = [r[0] for r in data]
    assert teams == ["3 Seattle Seahawks", "Cardinals", "Bills & co", "Jets"]
    assert all(len(r) == 5 for r in data)
    jets = data[teams.index("Jets")]
    assert jets[4] is None  # ragged row padded like pd.DataFrame NaN
    assert promote_header([]) == ([], [])
    assert promote_header([["banner"]]) == ([], [])


def test_upsert_batch_recovers_interrupted_swap(spark, tmp_path):
    """Round-7 (ADVICE r6): a crash between delete(target) and
    rename(staging, target) leaves the ONLY copy of the table in the
    staging dir. The next call must complete the interrupted swap —
    not treat the batch as the full state and erase the orphan."""
    import shutil

    from banksy_spark.io import upsert_batch

    p = str(tmp_path / "crash_state")
    b1 = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    upsert_batch(b1, p, ["id"])
    # inject the crash window: target deleted, staging holds the table
    shutil.move(p, p + "__staging__")
    assert not __import__("os").path.exists(p)
    # replay the NEXT batch — must merge against the recovered state
    b2 = spark.createDataFrame([(3, "z")], "id int, v string")
    upsert_batch(b2, p, ["id"])
    got = {(r["id"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got == {(1, "x"), (2, "y"), (3, "z")}, "orphaned rows were lost"


def test_upsert_versioned_pointer_commit(spark, tmp_path):
    """Manifest-pointer sink: a reader resolving _CURRENT at any
    instant sees a complete snapshot; an interrupted commit (snapshot
    written, pointer never swung, pointer even deleted) recovers to
    the newest complete snapshot and converges on replay."""
    import os
    import shutil

    from banksy_spark.io import read_current, upsert_versioned

    p = str(tmp_path / "vtable")
    b1 = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    assert upsert_versioned(b1, p, ["id"]) == 1
    b2 = spark.createDataFrame([(2, "y2"), (3, "z")], "id int, v string")
    assert upsert_versioned(b2, p, ["id"]) == 2
    want = {(1, "x"), (2, "y2"), (3, "z")}
    got = {(r["id"], r["v"]) for r in read_current(spark, p).collect()}
    assert got == want
    # crash injection 1: pointer lost entirely (the pointer's own
    # delete+rename window) — recovery scans for the newest _SUCCESS
    os.remove(f"{p}/_CURRENT")
    got = {(r["id"], r["v"]) for r in read_current(spark, p).collect()}
    assert got == want
    # and the next commit proceeds from the recovered snapshot
    b3 = spark.createDataFrame([(4, "w")], "id int, v string")
    v = upsert_versioned(b3, p, ["id"])
    assert v == 3
    got = {(r["id"], r["v"]) for r in read_current(spark, p).collect()}
    assert got == want | {(4, "w")}
    # crash injection 2: a fully-written orphan snapshot without a
    # pointer swing — replaying the SAME batch converges (the orphan
    # is simply overwritten-past)
    shutil.copytree(f"{p}/v3", f"{p}/v4")
    upsert_versioned(b3, p, ["id"])
    got = {(r["id"], r["v"]) for r in read_current(spark, p).collect()}
    assert got == want | {(4, "w")}
    # old snapshots beyond keep_versions are gone
    assert not os.path.exists(f"{p}/v1")


def test_write_sorted_shards_range_disjoint_and_balanced(spark, tmp_path):
    """Sorted-shard export: exact NTILE fill contract (sizes differ by
    at most 1), shard key-ranges non-overlapping and ascending, and
    each shard internally sorted."""
    from banksy_spark.io import write_sorted_shards

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    n = df.count()
    p = str(tmp_path / "shards")
    man = write_sorted_shards(df, p, ["o_totalprice", "o_orderkey"], 8)
    assert [m["shard"] for m in man] == list(range(1, 9))
    sizes = [m["rows"] for m in man]
    assert sum(sizes) == n and max(sizes) - min(sizes) <= 1
    for a, b in zip(man, man[1:]):
        assert a["hi"] <= b["lo"]  # range-disjoint ascending shards
    import pandas as pd  # noqa: F401

    one = (
        spark.read.parquet(p + "/shard=3").select("o_totalprice").toPandas()
    )
    assert one["o_totalprice"].is_monotonic_increasing


def test_orc_roundtrip_all_tables(spark, tmp_path):
    """ORC source/sink: every testdata table survives a
    parquet->ORC->read roundtrip with identical schema and values —
    the native second columnar format a Hive/Trino-resident user
    migrates through. Also pins that a filter reaches the ORC scan
    as a pushed predicate (same posture PLANS.md audits for parquet)."""
    from banksy_spark.io import read_orc, write_orc
    from banksy_spark.suite.registry import T
    from tests.conftest import SF_SMOKE

    for tbl in ("region", "nation", "orders", "events", "documents"):
        src = T(spark, SF_SMOKE, tbl)
        out = str(tmp_path / f"orc_{tbl}")
        write_orc(src, out)
        back = read_orc(spark, out)
        assert back.schema == src.schema, tbl
        a = sorted(map(str, src.collect()))
        b = sorted(map(str, back.collect()))
        assert a == b, f"{tbl}: ORC roundtrip changed values"

    ev = read_orc(spark, str(tmp_path / "orc_orders"))
    plan = ev.filter(ev.o_orderkey == 42).select("o_orderkey")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:120], (
        "filter did not reach the ORC scan"
    )
