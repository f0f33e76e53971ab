"""Batch/streaming single-source-of-truth for events.ts (VERDICT r1 #1/#2/#9).

Round-1 regression class: the batch loader left ts as TIMESTAMP_NTZ (crashing
``unix_micros``) while the streaming source imposed a nanos-as-long schema on a
microsecond parquet column, compressing the timeline 1000x.  Both now route
through :func:`columnflow_spark.sources.normalize_events_ts`; these tests pin
(a) the batch schema, (b) batch/streaming timeline agreement to the microsecond.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from columnflow_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_events_ts_is_session_timestamp(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        "events.ts must normalize to TIMESTAMP (not TIMESTAMP_NTZ/bigint); "
        "unix_micros() and watermarks depend on it"
    )
    # unix_micros is the round-1 crash site: must evaluate, and micros must be
    # in the parquet's actual range (years ~2023-2025, not 1970±epsilon as the
    # 1000x-compressed bug produced)
    row = ev.select(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).first()
    assert row.lo > 1_000_000_000 * 1_000_000  # after 2001-09-09 in micros
    assert row.hi < 4_000_000_000 * 1_000_000  # before 2096


def test_batch_and_streaming_ts_agree(spark):
    from columnflow_spark.queries.streaming import _run_to_memory, _stream_events

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    stream_agg = _stream_events(spark, SF_SMOKE).select("ts").groupBy().agg(
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    stream = _run_to_memory(stream_agg, spark).first()
    assert stream.n == batch.n
    assert stream.lo == batch.lo
    assert stream.hi == batch.hi
