"""Streaming tests: batch-stream equivalence + micro-batch INSERT ingest
(SURVEY A1/A5/A9, E6, M5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, canon

EVENTS = os.path.join(SF_DIR, "events.parquet")


def _rows(df):
    return canon([tuple(r) for r in df.collect()])


def test_tumbling_batch_stream_equivalence(spark):
    from graphdb_free_mocha_sa_spark.streaming.ingest import (
        run_stream_batch_equivalent, tumbling_counts)
    batch, stream = run_stream_batch_equivalent(spark, EVENTS, tumbling_counts)
    assert _rows(batch) == _rows(stream)
    assert batch.count() > 0


def test_sliding_with_late_data(spark):
    from graphdb_free_mocha_sa_spark.streaming.ingest import (
        run_stream_batch_equivalent, sliding_counts)
    batch, stream = run_stream_batch_equivalent(
        spark, EVENTS, sliding_counts, shuffle_fraction=0.05)
    assert _rows(batch) == _rows(stream)


def test_session_window_batch_stream(spark):
    from graphdb_free_mocha_sa_spark.streaming.ingest import (
        run_stream_batch_equivalent, session_counts)
    batch, stream = run_stream_batch_equivalent(spark, EVENTS, session_counts)
    assert _rows(batch) == _rows(stream)


def test_stream_dedup_doubled_replay_equals_one_copy(spark):
    """E1×E6: two full replays through watermarked dropDuplicates emit
    exactly one copy — multi-batch replay (maxFilesPerTrigger) included."""
    from graphdb_free_mocha_sa_spark.sources.registry import (
        normalize_event_timestamps)
    from graphdb_free_mocha_sa_spark.streaming.ingest import run_stream_dedup
    out = run_stream_dedup(spark, EVENTS, copies=2)
    batch = normalize_event_timestamps(spark.read.parquet(EVENTS))
    assert out.count() == batch.count()
    assert out.select("event_id").distinct().count() == batch.count()


def test_stream_insert_ingest(spark, tmp_path):
    """EP2 parity: micro-batches of SPARQL INSERTs through foreachBatch."""
    from graphdb_free_mocha_sa_spark.store import QuadStore
    from graphdb_free_mocha_sa_spark.streaming.ingest import stream_inserts_from_files
    updates = tmp_path / "updates"
    updates.mkdir()
    for i in range(6):
        (updates / f"u{i}.ru").write_text(
            f'INSERT DATA {{ GRAPH <urn:stream> {{ <urn:e{i}> <urn:val> {i} }} }}')
    store = QuadStore(spark)
    stream_inserts_from_files(spark, store, str(updates))
    got = store.df.filter(F.col("g") == "urn:stream")
    assert got.count() == 6
    assert got.agg(F.sum("o_num")).collect()[0][0] == 15.0


def test_stream_mixed_batch_falls_back_to_serial(spark, tmp_path):
    """A micro-batch containing a pattern update must keep per-message
    execution (the batched fast path only fires for pure INSERT DATA)."""
    from graphdb_free_mocha_sa_spark.store import QuadStore
    from graphdb_free_mocha_sa_spark.streaming.ingest import stream_inserts_from_files
    updates = tmp_path / "updates"
    updates.mkdir()
    for i in range(4):
        (updates / f"a{i}.ru").write_text(
            f'INSERT DATA {{ <urn:e{i}> <urn:val> {i} }}')
    # delete targets a pre-seeded quad so intra-batch order doesn't matter
    (updates / "z_del.ru").write_text('DELETE DATA { <urn:e9> <urn:val> 9 }')
    store = QuadStore(spark)
    UpdateExecutor = __import__(
        "graphdb_free_mocha_sa_spark.update", fromlist=["UpdateExecutor"]
    ).UpdateExecutor
    UpdateExecutor(store).execute('INSERT DATA { <urn:e9> <urn:val> 9 }')
    stream_inserts_from_files(spark, store, str(updates))
    vals = sorted(r.o_num for r in store.df.select("o_num").collect())
    assert vals == [0.0, 1.0, 2.0, 3.0]
