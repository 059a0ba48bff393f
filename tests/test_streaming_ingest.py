"""Streaming ingestion conformance: routing, audit log, checkpointed
exactly-once-effective processing, rowupsert side-output.
"""

from __future__ import annotations

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
