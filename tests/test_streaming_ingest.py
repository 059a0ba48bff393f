"""Streaming ingestion conformance: routing, audit log, checkpointed
exactly-once-effective processing, rowupsert side-output.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from webhookdb_spark.replicators.fake import FAKE_V1
from webhookdb_spark.sources.envelopes import (
    read_envelope_stream,
    read_envelopes,
    reject_bot_gets,
)
from webhookdb_spark.storage import Warehouse
from webhookdb_spark.streaming.ingest import IngestPipeline, IntegrationRuntime


def write_envelopes(path, bodies, opaque_id="svi_a"):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"batch_{abs(hash(str(bodies))) % 10**8}.json"
    with open(f, "w") as fh:
        for b in bodies:
            fh.write(
                json.dumps(
                    {
                        "integration_opaque_id": opaque_id,
                        "service_name": "fake_v1",
                        "request_method": "POST",
                        "request_path": f"/v1/service_integrations/{opaque_id}",
                        "headers": {"content-type": "application/json"},
                        "body": json.dumps(b),
                        "received_at": "2024-06-01T00:00:00.000Z",
                    }
                )
                + "\n"
            )


def test_streaming_pipeline_end_to_end(spark, tmp_warehouse):
    land = tmp_warehouse / "landing"
    write_envelopes(land, [{"my_id": f"k{i}", "at": "2024-06-01T00:00:00Z"} for i in range(5)])

    wh = Warehouse(spark, tmp_warehouse / "wh")
    pipeline = IngestPipeline(
        warehouse=wh, audit_table_path=str(tmp_warehouse / "audit")
    )
    seen_changes: list[int] = []
    pipeline.register(
        IntegrationRuntime(
            opaque_id="svi_a",
            org="org1",
            spec=FAKE_V1,
            on_rowupsert=lambda df: seen_changes.append(df.count()),
        )
    )
    stream = read_envelope_stream(spark, str(land))
    q = pipeline.start(stream, str(tmp_warehouse / "ckpt"), trigger_once=True)
    q.awaitTermination(120)

    table = wh.table("org1", "fake_v1")
    assert table.read().count() == 5
    assert seen_changes == [5]
    # audit log captured every envelope
    audit = spark.read.parquet(str(tmp_warehouse / "audit"))
    assert audit.count() == 5

    # second run with a new file: only new data processed (checkpoint
    # keeps offsets), and re-delivered rows are idempotent
    write_envelopes(land, [{"my_id": "k0", "at": "2024-06-02T00:00:00Z"},
                           {"my_id": "k9", "at": "2024-06-01T00:00:00Z"}])
    q2 = pipeline.start(stream, str(tmp_warehouse / "ckpt"), trigger_once=True)
    q2.awaitTermination(120)
    assert table.read().count() == 6  # k9 new, k0 updated
    assert str(table.read().where("my_id='k0'").first()["at"]) == "2024-06-02 00:00:00"
    assert seen_changes == [5, 2]


def test_unknown_integration_ignored(spark, tmp_warehouse):
    land = tmp_warehouse / "landing2"
    write_envelopes(land, [{"my_id": "x", "at": "2024-06-01T00:00:00Z"}], opaque_id="svi_unknown")
    wh = Warehouse(spark, tmp_warehouse / "wh2")
    pipeline = IngestPipeline(warehouse=wh)
    pipeline.register(IntegrationRuntime(opaque_id="svi_a", org="org1", spec=FAKE_V1))
    pipeline.process_batch(read_envelopes(spark, str(land)))
    assert not wh.table("org1", "fake_v1").exists()


def test_reject_bot_gets(spark):
    rows = [
        ("a", "GET", {"user-agent": "Googlebot/2.1"}),
        ("b", "GET", {"user-agent": "Mozilla/5.0"}),
        ("c", "POST", {"user-agent": "somebot"}),
    ]
    df = spark.createDataFrame(
        rows, "integration_opaque_id string, request_method string, headers map<string,string>"
    )
    kept = [r["integration_opaque_id"] for r in reject_bot_gets(df).collect()]
    assert sorted(kept) == ["b", "c"]


def test_per_org_semaphore_bounds_concurrent_merges(spark, tmp_warehouse):
    """process_webhook.rb:15-24 parity: with an 8-thread pool, one org's
    merges never exceed max_concurrent_per_org in flight, while a second
    org still gets a slot (fairness)."""
    import threading
    import time

    land = tmp_warehouse / "landing3"
    # 6 integrations: 5 in org-flood, 1 in org-quiet
    for i in range(5):
        write_envelopes(
            land, [{"my_id": f"f{i}", "at": "2024-06-01T00:00:00Z"}],
            opaque_id=f"svi_flood_{i}",
        )
    write_envelopes(
        land, [{"my_id": "q", "at": "2024-06-01T00:00:00Z"}], opaque_id="svi_quiet"
    )

    wh = Warehouse(spark, tmp_warehouse / "wh3")
    pipeline = IngestPipeline(
        warehouse=wh, max_parallel_merges=8, max_concurrent_per_org=2
    )
    # distinct tables per integration: the per-table mutex must not be
    # what bounds the flood — only the org semaphore should
    from dataclasses import replace

    for i in range(5):
        pipeline.register(
            IntegrationRuntime(
                opaque_id=f"svi_flood_{i}",
                org="org-flood",
                spec=replace(FAKE_V1, name=f"fake_c{i}_v1", table=f"fake_c{i}_v1"),
            )
        )
    pipeline.register(
        IntegrationRuntime(opaque_id="svi_quiet", org="org-quiet", spec=FAKE_V1)
    )

    lock = threading.Lock()
    inflight: dict[str, int] = {}
    peak: dict[str, int] = {}
    orgs = {f"svi_flood_{i}": "org-flood" for i in range(5)}
    orgs["svi_quiet"] = "org-quiet"

    def slow_merge(table, subset, spec):
        org = orgs[subset.select("integration_opaque_id").first()[0]]
        with lock:
            inflight[org] = inflight.get(org, 0) + 1
            peak[org] = max(peak.get(org, 0), inflight[org])
        time.sleep(0.3)  # hold the slot so overlap is observable
        with lock:
            inflight[org] -= 1
        from webhookdb_spark.operators.upsert import upsert_envelopes

        return upsert_envelopes(table, subset, spec)

    pipeline._merge_fn = slow_merge
    pipeline.process_batch(read_envelopes(spark, str(land)))

    assert peak["org-flood"] == 2  # bound held AND actually contended
    assert peak.get("org-quiet", 0) >= 1  # quiet org was not starved
    assert len(pipeline.merge_log) == 6
    assert wh.table("org-quiet", "fake_v1").read().count() == 1
    for i in range(5):
        assert wh.table("org-flood", f"fake_c{i}_v1").read().count() == 1


def test_same_table_merges_serialize(spark, tmp_warehouse):
    """Two integrations feeding ONE table must never merge concurrently
    (the manifest swap is last-writer-wins)."""
    import threading
    import time

    land = tmp_warehouse / "landing4"
    write_envelopes(land, [{"my_id": "a1", "at": "2024-06-01T00:00:00Z"}], opaque_id="svi_s1")
    write_envelopes(land, [{"my_id": "a2", "at": "2024-06-01T00:00:00Z"}], opaque_id="svi_s2")

    wh = Warehouse(spark, tmp_warehouse / "wh4")
    pipeline = IngestPipeline(warehouse=wh, max_parallel_merges=4)
    for oid in ("svi_s1", "svi_s2"):
        pipeline.register(IntegrationRuntime(opaque_id=oid, org="org1", spec=FAKE_V1))

    lock = threading.Lock()
    state = {"inflight": 0, "peak": 0}

    def slow_merge(table, subset, spec):
        with lock:
            state["inflight"] += 1
            state["peak"] = max(state["peak"], state["inflight"])
        time.sleep(0.3)
        with lock:
            state["inflight"] -= 1
        from webhookdb_spark.operators.upsert import upsert_envelopes

        return upsert_envelopes(table, subset, spec)

    pipeline._merge_fn = slow_merge
    pipeline.process_batch(read_envelopes(spark, str(land)))
    assert state["peak"] == 1  # serialized
    assert wh.table("org1", "fake_v1").read().count() == 2  # both rows landed


def test_max_files_per_trigger_paces_microbatches(spark, tmp_warehouse):
    """maxFilesPerTrigger plumbed through IngestPipeline.start: three
    landing files + cap 1 + availableNow => three paced micro-batches,
    each merged separately (merge_log has one entry per batch)."""
    land = tmp_warehouse / "landing"
    for i in range(3):
        write_envelopes(land, [{"my_id": f"m{i}", "at": "2024-06-01T00:00:00Z"}])
    assert len(list(land.glob("*.json"))) == 3

    wh = Warehouse(spark, tmp_warehouse / "wh")
    pipeline = IngestPipeline(warehouse=wh)
    pipeline.register(IntegrationRuntime(opaque_id="svi_a", org="org1", spec=FAKE_V1))
    q = pipeline.start(
        str(land), str(tmp_warehouse / "ckpt"), trigger_once=True,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    assert wh.table("org1", "fake_v1").read().count() == 3
    assert len(pipeline.merge_log) == 3  # one merge per paced micro-batch
    assert all(r.inserted == 1 for _, r in pipeline.merge_log)


def test_rate_source_pipeline_is_source_agnostic(spark, tmp_warehouse):
    """The envelope pipeline must run from a NON-file streaming source
    with no landing directory (the reference's queue boundary,
    api/helpers.rb:231-244: HTTP -> queue -> worker; the queue swap-in
    here is Spark's rate-micro-batch source standing in for Kafka).
    Per-trigger intake caps compose on this path too: the cap knob lives
    on the SOURCE (rowsPerBatch here, maxOffsetsPerTrigger on Kafka),
    and every micro-batch's merge honors it."""
    import time

    wh = Warehouse(spark, tmp_warehouse / "wh_rate")
    pipeline = IngestPipeline(
        warehouse=wh, audit_table_path=str(tmp_warehouse / "audit_rate")
    )
    pipeline.register(IntegrationRuntime(opaque_id="svi_r", org="org1", spec=FAKE_V1))
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 4)
        .option("numPartitions", 2)
        .load()
    )
    env = raw.select(
        F.lit("svi_r").alias("integration_opaque_id"),
        F.format_string(
            '{"my_id": "k%s", "at": "2024-06-01T00:00:00Z"}', F.col("value")
        ).alias("body"),
        F.col("timestamp").alias("received_at"),
    )
    q = pipeline.start(env, str(tmp_warehouse / "ckpt_rate"),
                       processing_time="0 seconds")
    try:
        deadline = time.time() + 90
        while time.time() < deadline and len(pipeline.merge_log) < 3:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(pipeline.merge_log) >= 3, "expected several capped micro-batches"
    # the per-trigger cap bounds every batch's merge
    assert all(r.inserted + r.updated <= 4 for _, r in pipeline.merge_log)
    # distinct rate values -> strictly growing table; audit kept pace
    table = wh.table("org1", "fake_v1")
    n = table.read().count()
    assert n >= 8  # at least two full capped batches landed
    audit = spark.read.parquet(str(tmp_warehouse / "audit_rate"))
    assert audit.count() >= n


def test_kafka_projection_feeds_pipeline(spark, tmp_warehouse):
    """envelopes_from_kafka: Kafka-shaped records (binary value, broker
    timestamp) project to the envelope schema — producer received_at
    wins, broker timestamp fills the gap — and the result drives
    process_batch unchanged (the projection is the only Kafka-specific
    code; everything downstream is source-agnostic)."""
    import datetime as dt

    from webhookdb_spark.sources.envelopes import envelopes_from_kafka

    body = json.dumps({"my_id": "kk1", "at": "2024-06-01T00:00:00Z"})
    with_ts = json.dumps(
        {
            "integration_opaque_id": "svi_a",
            "body": body,
            "received_at": "2024-06-02T03:04:05.000Z",
        }
    )
    without_ts = json.dumps(
        {
            "integration_opaque_id": "svi_a",
            "body": json.dumps({"my_id": "kk2", "at": "2024-06-01T00:00:00Z"}),
        }
    )
    broker_ts = dt.datetime(2024, 6, 5, 12, 0, 0)
    records = spark.createDataFrame(
        [
            (bytearray(b"k1"), bytearray(with_ts.encode()), "t", 0, 0, broker_ts, 0),
            (bytearray(b"k2"), bytearray(without_ts.encode()), "t", 0, 1, broker_ts, 0),
        ],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )
    env = envelopes_from_kafka(records)
    assert [f.name for f in env.schema.fields] == [
        "integration_opaque_id", "service_name", "request_method",
        "request_path", "headers", "body", "received_at",
    ]
    rows = {r.body: r.received_at for r in env.collect()}
    assert rows[body] == dt.datetime(2024, 6, 2, 3, 4, 5)       # producer wins
    assert min(rows.values()) != broker_ts or max(rows.values()) == broker_ts

    wh = Warehouse(spark, tmp_warehouse / "wh_kafka")
    pipeline = IngestPipeline(warehouse=wh)
    pipeline.register(IntegrationRuntime(opaque_id="svi_a", org="org1", spec=FAKE_V1))
    pipeline.process_batch(env)
    got = {r.my_id for r in wh.table("org1", "fake_v1").read().collect()}
    assert got == {"kk1", "kk2"}


def test_per_trigger_caps_rejected_on_prebuilt_stream(spark, tmp_warehouse):
    import pytest

    land = tmp_warehouse / "landing"
    write_envelopes(land, [{"my_id": "x", "at": "2024-06-01T00:00:00Z"}])
    pipeline = IngestPipeline(warehouse=Warehouse(spark, tmp_warehouse / "wh"))
    stream = read_envelope_stream(spark, str(land))
    with pytest.raises(ValueError, match="source options"):
        pipeline.start(stream, str(tmp_warehouse / "ckpt"), trigger_once=True,
                       max_files_per_trigger=1)


def test_pipeline_delivery_dedup_absorbs_retry_storm(spark, tmp_warehouse):
    """With dedup_deliveries_watermark set, a batch-2 redelivery of a
    batch-1 envelope (same integration + body) is dropped BEFORE the
    merge: the second micro-batch's merge sees only the genuinely new
    envelope, and the audit log records only deduped deliveries."""
    land = tmp_warehouse / "landing"
    write_envelopes(land, [{"my_id": "k0", "at": "2024-06-01T00:00:00Z"},
                           {"my_id": "k1", "at": "2024-06-01T00:00:00Z"}])

    wh = Warehouse(spark, tmp_warehouse / "wh")
    pipeline = IngestPipeline(
        warehouse=wh, audit_table_path=str(tmp_warehouse / "audit")
    )
    merged_counts: list[int] = []
    pipeline.register(
        IntegrationRuntime(
            opaque_id="svi_a", org="org1", spec=FAKE_V1,
            on_rowupsert=lambda df: merged_counts.append(df.count()),
        )
    )
    q = pipeline.start(
        str(land), str(tmp_warehouse / "ckpt"), trigger_once=True,
        dedup_deliveries_watermark="1 hour",
    )
    q.awaitTermination(120)
    assert merged_counts == [2]

    # batch 2: k0 redelivered byte-identical (retry) + k2 new
    write_envelopes(land, [{"my_id": "k0", "at": "2024-06-01T00:00:00Z"},
                           {"my_id": "k2", "at": "2024-06-01T00:00:00Z"}])
    q2 = pipeline.start(
        str(land), str(tmp_warehouse / "ckpt"), trigger_once=True,
        dedup_deliveries_watermark="1 hour",
    )
    q2.awaitTermination(120)
    assert merged_counts == [2, 1]  # retry dropped before the merge
    table = wh.table("org1", "fake_v1")
    assert table.read().count() == 3
    audit = spark.read.parquet(str(tmp_warehouse / "audit"))
    # documented trade of the stream-level knob: the dropped retry never
    # reaches the audit append (reference parity needs dedup_deliveries)
    assert audit.count() == 3


def test_batch_delivery_dedup_preserves_audit_parity(spark, tmp_warehouse):
    """IngestPipeline.dedup_deliveries dedups AFTER the audit append:
    every delivery (retries included) lands in the archive — the
    reference's log-then-process order (api/helpers.rb:271) — while the
    merge sees each distinct delivery once."""
    land = tmp_warehouse / "landing"
    # k0 delivered twice byte-identical in the same batch + k1 once
    write_envelopes(land, [{"my_id": "k0", "at": "2024-06-01T00:00:00Z"},
                           {"my_id": "k1", "at": "2024-06-01T00:00:00Z"}])
    write_envelopes(land, [{"my_id": "k0", "at": "2024-06-01T00:00:00Z"},
                           {"my_id": "k0", "at": "2024-06-01T00:00:00Z"}])

    wh = Warehouse(spark, tmp_warehouse / "wh")
    pipeline = IngestPipeline(
        warehouse=wh,
        audit_table_path=str(tmp_warehouse / "audit"),
        dedup_deliveries=True,
    )
    merged_counts: list[int] = []
    pipeline.register(
        IntegrationRuntime(
            opaque_id="svi_a", org="org1", spec=FAKE_V1,
            on_rowupsert=lambda df: merged_counts.append(df.count()),
        )
    )
    pipeline.process_batch(read_envelopes(spark, str(land)))

    assert wh.table("org1", "fake_v1").read().count() == 2  # k0, k1
    # the merge path saw the deduped stream (2 distinct deliveries) ...
    assert merged_counts == [2]
    # ... but the audit archive holds all 4 raw deliveries
    audit = spark.read.parquet(str(tmp_warehouse / "audit"))
    assert audit.count() == 4


def test_stream_changes_delivers_each_txn_exactly_once(spark, tmp_path):
    """The change feed as a streaming source: a checkpointed
    availableNow consumer sees each committed MERGE's post-images
    exactly once — txn1 in the first run, only txn2 in the second —
    with _action/_txn attached."""
    import json

    from webhookdb_spark.operators.upsert import stream_changes, upsert_envelopes
    from webhookdb_spark.replicators.fake import FAKE_V1
    from webhookdb_spark.storage import Warehouse

    def env(items):
        return spark.createDataFrame(
            [("fake_v1", json.dumps(it), None) for it in items],
            "opaque_id string, body string, received_at timestamp",
        )

    t = Warehouse(spark, tmp_path / "wh").table("org", "fake_v1")
    upsert_envelopes(t, env([
        {"my_id": "k1", "at": "2024-01-01T00:00:00Z"},
        {"my_id": "k2", "at": "2024-01-01T00:00:00Z"},
    ]), FAKE_V1)

    seen: list[tuple] = []

    def consume(batch, _bid):
        seen.extend(
            (r.my_id, r._action, r._txn) for r in batch.collect()
        )

    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            stream_changes(t)
            .writeStream.foreachBatch(consume)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = sorted(seen)
    assert [x[0] for x in first] == ["k1", "k2"]
    assert all(a == "insert" for _, a, _t in first)
    t1 = first[0][2]

    upsert_envelopes(t, env([
        {"my_id": "k1", "at": "2024-01-02T00:00:00Z"},   # update
        {"my_id": "k3", "at": "2024-01-01T00:00:00Z"},   # insert
    ]), FAKE_V1)
    seen.clear()
    run_once()
    second = sorted(seen)
    # ONLY txn2's rows — txn1 is behind the checkpoint
    assert [(m, a) for m, a, _ in second] == [("k1", "update"), ("k3", "insert")]
    assert all(tx == t1 + 1 for _, _, tx in second)


def test_dependent_table_maintained_from_change_stream(spark, tmp_path):
    """The streaming dependency DAG (service_integration.rb:75-77 /
    base.rb:814-818 re-expressed Spark-first): a CHILD table is
    maintained by a checkpointed streaming consumer of the parent's
    change feed — each micro-batch MERGEs the parent's post-images
    into the child (here a projection), so child state converges to
    the parent across arbitrary batch boundaries and restarts, with
    no rescans of the parent table."""
    import json

    from webhookdb_spark.operators.upsert import (
        merge_upsert,
        stream_changes,
        upsert_envelopes,
    )
    from webhookdb_spark.replicators.fake import FAKE_V1
    from webhookdb_spark.spec import Col, ReplicatorSpec
    from webhookdb_spark.storage import Warehouse
    from webhookdb_spark.types import ColumnType

    def env(items):
        return spark.createDataFrame(
            [("fake_v1", json.dumps(it), None) for it in items],
            "opaque_id string, body string, received_at timestamp",
        )

    wh = Warehouse(spark, tmp_path / "wh")
    parent = wh.table("org", "fake_v1")
    child = wh.table("org", "fake_child")
    child_spec = ReplicatorSpec(
        name="fake_child", table="fake_child",
        remote_key=Col("my_id", ColumnType.TEXT),
        denorm_cols=(Col("at", ColumnType.TIMESTAMP),),
        timestamp_col="at",
        update_where=lambda s, t: t("at") < s("at"),
        n_buckets=4,
    )
    child.create(child_spec.schema(), key="my_id", n_buckets=4)

    def maintain(batch, _bid):
        from pyspark.sql import functions as F

        shaped = batch.select(
            "my_id", "at", F.col("data"),
            F.current_timestamp().alias("_received_at"),
        )
        merge_upsert(child, shaped, child_spec, capture_changes=False)

    ckpt = str(tmp_path / "child_ckpt")

    def run_once():
        q = (
            stream_changes(parent)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    upsert_envelopes(parent, env([
        {"my_id": f"k{i}", "at": "2024-01-01T00:00:00Z"} for i in range(6)
    ]), FAKE_V1)
    run_once()
    assert sorted(r.my_id for r in child.read().collect()) == [
        f"k{i}" for i in range(6)
    ]

    # parent updates + a stale write; child converges, stale ignored
    upsert_envelopes(parent, env([
        {"my_id": "k0", "at": "2024-01-05T00:00:00Z"},
        {"my_id": "k6", "at": "2024-01-01T00:00:00Z"},
    ]), FAKE_V1)
    run_once()
    got = {r.my_id: str(r.at) for r in child.read().collect()}
    assert len(got) == 7 and got["k0"].startswith("2024-01-05")
    # replaying the stream (same checkpoint) is a no-op
    run_once()
    assert child.read().count() == 7


def test_ivm_maintainer_streaming_identical(spark, tmp_warehouse):
    """Streaming-identical proof for the IVM maintainer (the house
    standard the count-min/quantile sketches set in
    test_streaming_windows.py): IncrementalAggMaintainer driven from
    the envelope STREAM — hooked on each foreachBatch commit via
    on_rowupsert — must equal (a) a from-scratch groupBy of the
    table's current rows after every micro-batch, and (b) a one-shot
    batch maintainer folding the same feed in a single run. The
    watermark survives a maintainer restart (new instance, same path)
    as a no-op."""
    from webhookdb_spark.operators.matview import IncrementalAggMaintainer

    land = tmp_warehouse / "landing_ivm"
    wh = Warehouse(spark, tmp_warehouse / "wh_ivm")
    table = wh.table("org1", "fake_v1")
    shape = lambda b: b.select(  # noqa: E731
        "my_id",
        F.get_json_object(F.col("data").cast("string"), "$.g").alias("g"),
        F.get_json_object(F.col("data").cast("string"), "$.v")
        .cast("long")
        .alias("v"),
    )
    mt = IncrementalAggMaintainer(
        spark, str(tmp_warehouse / "ivm_stream"), "my_id", "g", "v",
        project=shape,
    )
    applied: list[int] = []
    pipeline = IngestPipeline(
        warehouse=wh, audit_table_path=str(tmp_warehouse / "audit_ivm")
    )
    pipeline.register(
        IntegrationRuntime(
            opaque_id="svi_a",
            org="org1",
            spec=FAKE_V1,
            on_rowupsert=lambda df: applied.append(mt.run(table)),
        )
    )

    def recompute():
        cur = table.read().select(
            F.get_json_object(F.col("data").cast("string"), "$.g").alias(
                "group"
            ),
            F.get_json_object(F.col("data").cast("string"), "$.v")
            .cast("long")
            .alias("v"),
        )
        return {
            (r.group, r.n_keys, r.total)
            for r in cur.groupBy("group")
            .agg(
                F.count("*").cast("long").alias("n_keys"),
                F.sum("v").cast("long").alias("total"),
            )
            .collect()
        }

    def maintained(m):
        return {(r.group, r.n_keys, r.total) for r in m.aggregate().collect()}

    write_envelopes(land, [
        {"my_id": "a", "at": "2024-06-01T00:00:00Z", "g": "x", "v": 10},
        {"my_id": "b", "at": "2024-06-01T00:00:00Z", "g": "x", "v": 5},
        {"my_id": "c", "at": "2024-06-01T00:00:00Z", "g": "y", "v": 7},
    ])
    stream = read_envelope_stream(spark, str(land))
    q = pipeline.start(stream, str(tmp_warehouse / "ckpt_ivm"), trigger_once=True)
    q.awaitTermination(120)
    assert applied == [1]
    assert maintained(mt) == recompute() == {("x", 2, 15), ("y", 1, 7)}

    # micro-batch 2: "a" moves group x -> y, "b" value in place, "d" new
    write_envelopes(land, [
        {"my_id": "a", "at": "2024-06-02T00:00:00Z", "g": "y", "v": 20},
        {"my_id": "b", "at": "2024-06-02T00:00:00Z", "g": "x", "v": 6},
        {"my_id": "d", "at": "2024-06-02T00:00:00Z", "g": "z", "v": 1},
    ])
    q2 = pipeline.start(stream, str(tmp_warehouse / "ckpt_ivm"), trigger_once=True)
    q2.awaitTermination(120)
    assert applied == [1, 1]
    want = {("x", 1, 6), ("y", 2, 27), ("z", 1, 1)}
    assert maintained(mt) == recompute() == want

    # restart safety: a NEW maintainer on the same path is a no-op
    mt2 = IncrementalAggMaintainer(
        spark, str(tmp_warehouse / "ivm_stream"), "my_id", "g", "v",
        project=shape,
    )
    assert mt2.run(table) == 0
    assert maintained(mt2) == want

    # batch rebuild: a fresh maintainer folding the SAME feed in one
    # run lands on the identical aggregate (streaming == batch fold)
    mt3 = IncrementalAggMaintainer(
        spark, str(tmp_warehouse / "ivm_batch"), "my_id", "g", "v",
        project=shape,
    )
    assert mt3.run(table) == 2
    assert maintained(mt3) == want


def test_contract_ingest_soak_releases_checkpoint_storage(spark, tmp_warehouse):
    """Sustained-ingest soak for the r10 checkpoint-release fix
    (operators/upsert.py:_release_local_checkpoint): N micro-batches
    through upsert_envelopes_with_contract must leave executor RDD
    storage O(1), not O(N) — each batch's eager localCheckpoint blocks
    are freed once its merge commits. Without the release, a
    long-running streaming ingest pins every batch's blocks until
    driver GC (unbounded storage growth at 100-TB scale; invisible to
    wall-clock benches). Also re-asserts correctness under the soak:
    every clean row lands, every violating row is quarantined."""
    import json as _json

    from pyspark.sql import functions as _F

    from webhookdb_spark.operators.upsert import (
        upsert_envelopes_with_contract,
    )
    from webhookdb_spark.replicators.fake import FAKE_V1
    from webhookdb_spark.storage import ManagedTable

    def env_df(sp, bodies):
        rows = [("svi_fake", _json.dumps(b), "2024-01-01T00:00:00")
                for b in bodies]
        df = sp.createDataFrame(
            rows, "opaque_id string, body string, received_at_s string")
        return df.withColumn(
            "received_at", _F.col("received_at_s").cast("timestamp")
        ).drop("received_at_s")

    t = ManagedTable(spark, tmp_warehouse / "org" / "fake_v1")
    qdir = str(tmp_warehouse / "quarantine")
    rules = [("not_null", "at"),
             ("between", "at", "2024-01-01 00:00:00", "2024-12-31 23:59:59")]
    sc = spark.sparkContext

    def stored_rdds():
        return len([i for i in sc._jsc.sc().getRDDStorageInfo()])

    base = stored_rdds()
    n_batches, per_batch = 12, 8
    total_clean = total_bad = 0
    high_water = base
    for b in range(n_batches):
        bodies = []
        for i in range(per_batch):
            bad = (i % 4) == 3
            bodies.append({
                "my_id": f"b{b}_i{i}",
                "at": "1999-01-01T00:00:00Z" if bad
                else f"2024-06-{(b % 27) + 1:02d}T00:00:0{i % 10}Z",
            })
        res, n_bad = upsert_envelopes_with_contract(
            t, env_df(spark, bodies), FAKE_V1, rules, qdir
        )
        total_clean += res.inserted + res.updated
        total_bad += n_bad
        high_water = max(high_water, stored_rdds())
    # O(1): at most a couple of live entries at any point (the batch in
    # flight), never the accumulated n_batches.
    assert high_water - base <= 2, (
        f"checkpoint blocks accumulating: base={base} high={high_water} "
        f"after {n_batches} batches"
    )
    assert stored_rdds() - base <= 1
    assert total_bad == n_batches * (per_batch // 4)
    assert t.read().count() == n_batches * (per_batch - per_batch // 4)
    assert spark.read.parquet(qdir).count() == total_bad


def test_canonicalize_headers_downcases_last_wins(spark):
    """logged_webhook.rb:186-188 before_save + its spec: header keys
    downcase on intake ({'Xyz': 'A', 'ABC': 'z'} → {'abc': 'z',
    'xyz': 'A'}); keys colliding after lowering keep the LAST value
    (Ruby transform_keys!), and a mixed-case User-Agent cannot bypass
    the bot-GET filter."""
    import json as _json

    from webhookdb_spark.sources.envelopes import (
        ENVELOPE_SCHEMA,
        canonicalize_headers,
        read_envelopes,
        reject_bot_gets,
    )

    # build the maps via from_json so entry order is document order —
    # the shape real envelopes arrive in (a python dict literal loses
    # ordering through createDataFrame)
    df = spark.createDataFrame(
        [('{"Xyz": "A", "ABC": "z"}',), ('{"UA": "1", "ua": "2", "uA": "3"}',),
         (None,)],
        "j string",
    ).select(F.from_json("j", "map<string,string>").alias("headers"))
    got = [r.h for r in df.select(
        canonicalize_headers(F.col("headers")).alias("h")).collect()]
    assert got[0] == {"abc": "z", "xyz": "A"}
    assert got[1] == {"ua": "3"}
    assert got[2] is None

    land = spark.createDataFrame(
        [
            ("keep", "svc", "POST", "/", {"User-Agent": "GoogleBot"}, "{}",
             dt.datetime(2026, 1, 1)),
            ("drop", "svc", "GET", "/", {"User-Agent": "GoogleBot"}, "{}",
             dt.datetime(2026, 1, 1)),
        ],
        schema=ENVELOPE_SCHEMA,
    )
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        land.write.mode("overwrite").json(d)
        env = read_envelopes(spark, d)
        kept = [r.integration_opaque_id for r in reject_bot_gets(env).collect()]
    assert kept == ["keep"]


def test_trim_logged_webhooks_full_policy(spark):
    """logged_webhook_spec.rb:117-154 — the reference's own trim
    fixture matrix: ancient orphan deleted, newer orphan kept; owned
    successes truncate after 7d and already-truncated ones delete
    after 90d (keeping their original truncated_at when younger);
    owned failures truncate after 30d and already-truncated ones
    delete after 90d."""
    from webhookdb_spark.operators.retention import trim_logged_webhooks

    now = dt.datetime(2026, 1, 1)
    days = lambda n: now - dt.timedelta(days=n)  # noqa: E731
    t = days(5)
    rows = [
        # (id, organization_id, response_status, inserted_at, truncated_at)
        ("orphan_ancient", None, 202, days(400), None),
        ("orphan_newer", None, 400, days(0), None),
        ("success_newer", "o", 202, days(0), None),
        ("success_older", "o", 202, days(20), None),
        ("success_truncated", "o", 202, days(20), t),
        ("success_ancient", "o", 202, days(400), days(395)),
        ("failure_newer", "o", 400, days(0), None),
        ("failure_mid", "o", 400, days(20), None),
        ("failure_older", "o", 400, days(40), None),
        ("failure_ancient", "o", 400, days(400), days(395)),
    ]
    df = spark.createDataFrame(
        [(i, o, s, ts, tr, "body", '{"a":"b"}') for i, o, s, ts, tr in rows],
        "id string, organization_id string, response_status int, "
        "inserted_at timestamp, truncated_at timestamp, "
        "request_body string, request_headers string",
    )
    out = {r.id: r for r in trim_logged_webhooks(df, now).collect()}
    assert set(out) == {
        "orphan_newer", "success_newer", "success_older",
        "success_truncated", "failure_newer", "failure_mid",
        "failure_older",
    }
    assert out["orphan_newer"].truncated_at is None
    assert out["success_newer"].truncated_at is None
    assert out["success_older"].truncated_at == now
    assert out["success_older"].request_body == ""
    assert out["success_older"].request_headers == "{}"
    assert out["success_truncated"].truncated_at == t  # original stamp kept
    assert out["failure_newer"].truncated_at is None
    assert out["failure_mid"].truncated_at is None  # 20d < 30d threshold
    assert out["failure_older"].truncated_at == now


def test_streaming_endpoint_intake_verifies_per_microbatch(spark, tmp_warehouse):
    """start(verify_secrets=...) runs the full endpoint-shaped intake
    per micro-batch: a bad-secret delivery lands in the audit archive
    WITH its 401 verdict and never reaches the table, while the
    good-secret one merges — and a checkpointed restart processes only
    new files, re-verifying them the same way."""
    import pytest

    land = tmp_warehouse / "landing"
    land.mkdir(parents=True, exist_ok=True)

    def write_batch(name, rows):
        with open(land / name, "w") as fh:
            for my_id, secret in rows:
                fh.write(json.dumps({
                    "integration_opaque_id": "svi_a",
                    "service_name": "fake_v1",
                    "request_method": "POST",
                    "request_path": "/v1/service_integrations/svi_a",
                    "headers": {"Whdb-Secret": secret},
                    "body": json.dumps(
                        {"my_id": my_id, "at": "2024-06-01T00:00:00Z"}),
                    "received_at": "2024-06-01T00:00:00.000Z",
                }) + "\n")

    write_batch("b1.json", [("good1", "s3cr3t"), ("evil1", "WRONG")])
    wh = Warehouse(spark, tmp_warehouse / "wh")
    pipeline = IngestPipeline(
        warehouse=wh, audit_table_path=str(tmp_warehouse / "audit"))
    pipeline.register(IntegrationRuntime(
        opaque_id="svi_a", org="org1", spec=FAKE_V1))
    secrets = {"svi_a": ("whdb_customer", "s3cr3t")}

    stream = read_envelope_stream(spark, str(land))
    q = pipeline.start(stream, str(tmp_warehouse / "ckpt"),
                       trigger_once=True, verify_secrets=secrets)
    q.awaitTermination(120)

    table = wh.table("org1", "fake_v1")
    assert [r["my_id"] for r in table.read().collect()] == ["good1"]
    audit = spark.read.parquet(str(tmp_warehouse / "audit"))
    verdicts = {json.loads(r["body"])["my_id"]: r["_reject_reason"]
                for r in audit.collect()}
    assert verdicts == {
        "good1": None,
        "evil1": "Whdb-Secret value does not match configured secret",
    }

    # checkpointed restart: only the NEW file is processed, verified
    # the same way — the table gains good2 only, the archive both
    write_batch("b2.json", [("good2", "s3cr3t"), ("evil2", "nope")])
    q2 = pipeline.start(stream, str(tmp_warehouse / "ckpt"),
                        trigger_once=True, verify_secrets=secrets)
    q2.awaitTermination(120)
    assert sorted(r["my_id"] for r in table.read().collect()) == [
        "good1", "good2"]
    audit = spark.read.parquet(str(tmp_warehouse / "audit"))
    assert audit.count() == 4  # every delivery archived exactly once
    assert audit.where("_reject_reason IS NOT NULL").count() == 2

    # the endpoint contract logs every delivery, so stream-level dedup
    # ahead of the archive is refused
    with pytest.raises(ValueError, match="verdict archive"):
        pipeline.start(stream, str(tmp_warehouse / "ckpt2"),
                       trigger_once=True, verify_secrets=secrets,
                       dedup_deliveries_watermark="1 hour")


def test_audit_archive_idempotent_per_microbatch(spark, tmp_warehouse):
    """r13 ADVICE: a crash between the audit append and the checkpoint
    commit re-executes the micro-batch; the audit write keyed on the
    foreachBatch batch id (overwrite on _batch=<id>) must archive every
    delivery exactly once across re-execution, for BOTH foreachBatch
    bodies (intake_batch and process_batch). Direct calls (no batch id)
    keep plain append semantics under _batch=-1."""
    wh = Warehouse(spark, tmp_warehouse / "wh")
    pipeline = IngestPipeline(
        warehouse=wh, audit_table_path=str(tmp_warehouse / "audit"))
    pipeline.register(IntegrationRuntime(
        opaque_id="svi_a", org="org1", spec=FAKE_V1))
    secrets = {"svi_a": ("whdb_customer", "s3cr3t")}

    def envelope_df(my_id, secret):
        return spark.createDataFrame([{
            "integration_opaque_id": "svi_a",
            "service_name": "fake_v1",
            "request_method": "POST",
            "request_path": "/v1/service_integrations/svi_a",
            "headers": {"Whdb-Secret": secret},
            "body": json.dumps(
                {"my_id": my_id, "at": "2024-06-01T00:00:00Z"}),
            "received_at": "2024-06-01T00:00:00.000Z",
        }]).withColumn(
            "received_at", F.col("received_at").cast("timestamp"))

    audit_path = str(tmp_warehouse / "audit")
    # re-executed intake_batch (same batch id) → archived exactly once
    batch = envelope_df("good1", "s3cr3t")
    pipeline.intake_batch(batch, secrets, audit_batch_id=7)
    pipeline.intake_batch(batch, secrets, audit_batch_id=7)
    assert spark.read.parquet(audit_path).count() == 1
    # a different batch id is a different micro-batch → appends
    pipeline.intake_batch(envelope_df("good2", "s3cr3t"), secrets,
                          audit_batch_id=8)
    assert spark.read.parquet(audit_path).count() == 2
    # re-executed process_batch path, same contract
    pipeline.process_batch(envelope_df("good3", "s3cr3t"),
                           audit_batch_id=9)
    pipeline.process_batch(envelope_df("good3", "s3cr3t"),
                           audit_batch_id=9)
    audit = spark.read.parquet(audit_path)
    assert audit.count() == 3
    # direct (no batch id) stays append-only: at-least-once by contract
    pipeline.process_batch(envelope_df("good4", "s3cr3t"))
    pipeline.process_batch(envelope_df("good4", "s3cr3t"))
    audit = spark.read.parquet(audit_path)
    assert audit.count() == 5
    assert audit.where("_batch = -1").count() == 2
    # the MERGE stays idempotent under the redelivery either way
    table = wh.table("org1", "fake_v1")
    assert sorted(r["my_id"] for r in table.read().collect()) == [
        "good1", "good2", "good3", "good4"]


def test_audit_archive_migrates_legacy_day_layout(spark, tmp_warehouse):
    """Pre-r14 archives have _day=... at the root; the first write of
    the _batch=<id> layout must migrate them in place (mixed depths
    fail Spark partition discovery) and the merged archive stays
    readable with every row intact."""
    audit_path = tmp_warehouse / "audit_legacy"
    wh = Warehouse(spark, tmp_warehouse / "wh")
    pipeline = IngestPipeline(warehouse=wh, audit_table_path=str(audit_path))
    pipeline.register(IntegrationRuntime(
        opaque_id="svi_a", org="org1", spec=FAKE_V1))

    def envelope_df(my_id):
        return spark.createDataFrame([{
            "integration_opaque_id": "svi_a",
            "service_name": "fake_v1",
            "request_method": "POST",
            "request_path": "/v1/service_integrations/svi_a",
            "headers": {"Whdb-Secret": "s"},
            "body": json.dumps(
                {"my_id": my_id, "at": "2024-06-01T00:00:00Z"}),
            "received_at": "2024-06-01T00:00:00.000Z",
        }]).withColumn(
            "received_at", F.col("received_at").cast("timestamp"))

    # legacy layout: a plain _day append at the archive root
    (
        envelope_df("old1").withColumn("_day", F.to_date("received_at"))
        .write.mode("append").partitionBy("_day")
        .parquet(str(audit_path))
    )
    assert (audit_path / "_day=2024-06-01").is_dir()
    # first post-upgrade write migrates the legacy dirs, then appends
    pipeline.process_batch(envelope_df("new1"), audit_batch_id=3)
    assert not (audit_path / "_day=2024-06-01").exists()
    assert (audit_path / "_batch=-1" / "_day=2024-06-01").is_dir()
    audit = spark.read.parquet(str(audit_path))
    ids = sorted(json.loads(r["body"])["my_id"] for r in audit.collect())
    assert ids == ["new1", "old1"]
    assert sorted(r["_batch"] for r in audit.collect()) == [-1, 3]


def test_streaming_endpoint_clock_is_batch_derived(spark, tmp_warehouse):
    """Code-review r13: the verify_secrets stream pins each
    micro-batch's verification clock to the batch's own newest
    received_at (data-derived), NOT the wall clock — so a checkpointed
    re-execution of the same batch minutes later reaches the same
    timestamp-window verdicts. Pinned by feeding a day-old
    Stripe-signed delivery whose signature matches its arrival
    instant: a wall clock would 401 it (outside the ±300 s window); the
    batch-derived clock verifies and merges it."""
    import hashlib
    import hmac as hmac_mod

    land = tmp_warehouse / "landing"
    land.mkdir(parents=True, exist_ok=True)
    secret = "whsec_s"
    received = dt.datetime(2026, 8, 15, 12, 0, 0, tzinfo=dt.timezone.utc)
    t0 = int(received.timestamp())  # signature epoch == arrival epoch
    body = json.dumps({"my_id": "old1", "at": "2026-08-15T12:00:00Z"})
    sig = hmac_mod.new(secret.encode(), f"{t0}.{body}".encode(),
                       hashlib.sha256).hexdigest()
    with open(land / "b1.json", "w") as fh:
        fh.write(json.dumps({
            "integration_opaque_id": "svi_a", "service_name": "fake_v1",
            "request_method": "POST",
            "request_path": "/v1/service_integrations/svi_a",
            "headers": {"Stripe-Signature": f"t={t0},v1={sig}"},
            "body": body,
            "received_at": "2026-08-15T12:00:00.000Z",
        }) + "\n")

    wh = Warehouse(spark, tmp_warehouse / "wh")
    pipeline = IngestPipeline(
        warehouse=wh, audit_table_path=str(tmp_warehouse / "audit"))
    pipeline.register(IntegrationRuntime(
        opaque_id="svi_a", org="org1", spec=FAKE_V1))
    q = pipeline.start(
        read_envelope_stream(spark, str(land)),
        str(tmp_warehouse / "ckpt"), trigger_once=True,
        verify_secrets={"svi_a": ("stripe", secret)})
    q.awaitTermination(120)

    table = wh.table("org1", "fake_v1")
    assert [r["my_id"] for r in table.read().collect()] == ["old1"]
    audit = spark.read.parquet(str(tmp_warehouse / "audit"))
    assert audit.collect()[0]["_reject_reason"] is None


def test_audit_legacy_scan_runs_once_per_pipeline(spark, tmp_warehouse):
    """r14 ADVICE: _write_audit re-scanned the audit root for legacy
    _day= dirs on EVERY micro-batch. The scan result is now cached per
    pipeline instance: once a scan finds no legacy dirs (or a
    migration completes) later batches skip the iterdir entirely —
    proven behaviorally by planting a legacy-shaped dir after the flag
    is set and observing it is NOT migrated (the pre-r14 layout cannot
    reappear under a live pipeline; only a fresh process re-checks)."""
    audit_path = tmp_warehouse / "audit_once"
    wh = Warehouse(spark, tmp_warehouse / "wh_once")
    pipeline = IngestPipeline(
        warehouse=wh, audit_table_path=str(audit_path))
    pipeline.register(IntegrationRuntime(
        opaque_id="svi_a", org="org1", spec=FAKE_V1))

    def envelope_df(my_id):
        return spark.createDataFrame([{
            "integration_opaque_id": "svi_a",
            "service_name": "fake_v1",
            "request_method": "POST",
            "request_path": "/v1/service_integrations/svi_a",
            "headers": {"Whdb-Secret": "s"},
            "body": json.dumps(
                {"my_id": my_id, "at": "2024-06-01T00:00:00Z"}),
            "received_at": "2024-06-01T00:00:00.000Z",
        }]).withColumn(
            "received_at", F.col("received_at").cast("timestamp"))

    pipeline.process_batch(envelope_df("a1"), audit_batch_id=1)
    pipeline.process_batch(envelope_df("a2"), audit_batch_id=2)
    assert pipeline._audit_migrated is True
    # plant a legacy-shaped dir AFTER the flag is cached: a skipped
    # scan leaves it untouched (before the fix every batch migrated it)
    legacy = audit_path / "_day=2099-01-01"
    legacy.mkdir()
    pipeline.process_batch(envelope_df("a3"), audit_batch_id=3)
    assert legacy.is_dir()  # not migrated: the per-batch scan is gone
