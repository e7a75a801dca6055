"""Structured Streaming ingest + windowed analytics (SURVEY A1/A2/A9, E6).

The reference consumes RabbitMQ micro-batches of INSERT updates and executes
them concurrently post-bulk-load (EP2, GraphDBSystemAdapter.java:189-209).
Spark-first equivalent: a file/rate/kafka ``readStream`` feeding
``foreachBatch``; each micro-batch of SPARQL INSERT strings is parsed and
appended to the QuadStore — batch boundaries give the same atomicity as the
reference's per-update transactions.

Windowed analytics (E6): tumbling/sliding/session windows + watermark over
the ``events`` fixture, with an ``availableNow`` batch-equivalence harness
(FIXTURES.md §4): the same aggregation through ``read`` and ``readStream``
must produce identical results.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_free_mocha_sa_spark.model import QUAD_COLS
from graphdb_free_mocha_sa_spark.store import QuadStore
from graphdb_free_mocha_sa_spark.update import UpdateExecutor


# ------------------------------------------------------------ EP2 parity


_PARSED_SCHEMA = ("is_quads boolean, text string, g string, s string, p string, "
                  "o_lex string, o_dt string, o_lang string, o_num double, "
                  "o_ts timestamp")


def _parse_messages(rows):
    """Executor-side SPARQL-update parse: ground INSERT DATA messages become
    quad rows; anything else (pattern updates, deletes, malformed text)
    passes through as raw text for the serial driver path."""
    from graphdb_free_mocha_sa_spark.sparql import algebra as A
    from graphdb_free_mocha_sa_spark.sparql.parser import parse_update
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH
    from graphdb_free_mocha_sa_spark.update import _ground_rows

    for row in rows:
        text = row.value
        if not text.strip():
            continue
        ops = None
        try:
            parsed = parse_update(text)
            if all(isinstance(op, A.InsertData) for op in parsed):
                ops = parsed
        except Exception:
            ops = None
        if ops is None:
            yield (False, text, None, None, None, None, None, None, None, None)
        else:
            for op in ops:
                for r in _ground_rows(op.data, DEFAULT_GRAPH):
                    yield (True, None) + r


def _make_apply_batch(spark: SparkSession, store: QuadStore, skey: str):
    """The shared micro-batch applier: executor-side parse, one append per
    insert bulk, serial driver execution for the (rare) non-insert
    stragglers, and the per-(stream, batch) marker protocol that makes
    replays exactly-once for insert-only batches and idempotent otherwise
    (see stream_inserts_from_files for the full contract)."""
    executor = UpdateExecutor(store)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if store.stream_last(skey) >= batch_id:
            return                    # crash-replayed batch: already applied
        parsed = spark.createDataFrame(
            batch_df.rdd.mapPartitions(_parse_messages), _PARSED_SCHEMA
        ).localCheckpoint()
        quads = parsed.filter(F.col("is_quads")) \
                      .select(*[F.col(c) for c in QUAD_COLS])
        stragglers = [r.text for r in
                      parsed.filter(~F.col("is_quads")).select("text").collect()]
        if not stragglers:
            # insert-only batch (the hot path): the marker rides the
            # append's log entry — atomic, so replay is all-or-nothing and
            # no dedup join is needed
            store.stage_stream_mark(skey, batch_id)
        if not quads.isEmpty():
            # mixed batches dedup their insert leg: a crash between the
            # append-commit and the end-of-batch marker replays them
            store.add_quads(quads, dedup=bool(stragglers))
        for text in stragglers:
            executor.execute(text)
        if stragglers:
            store.stage_stream_mark(skey, batch_id)
        store.flush_stream_mark()

    return apply_batch


def stream_inserts_from_kafka(spark: SparkSession, store: QuadStore,
                              bootstrap_servers: str, topic: str,
                              checkpoint_dir: str,
                              starting_offsets: str = "earliest",
                              available_now: bool = True):
    """SPARQL-update ingest from a Kafka topic — the direct analogue of the
    reference's RabbitMQ update consumer (AbstractSystemAdapter1.java:54,
    130-149: one message = one SPARQL update, ≤100 in-flight). Message
    values are UTF-8 SPARQL update strings; the micro-batch applier, batch
    markers, and exactly-once-for-insert-only semantics are IDENTICAL to
    :func:`stream_inserts_from_files` (same `_make_apply_batch`), with
    Kafka offsets checkpointed by Structured Streaming in
    ``checkpoint_dir``.

    Requires the ``spark-sql-kafka`` connector on the classpath; in
    environments without it (this test container) the stream construction
    raises Spark's "Failed to find data source: kafka" analysis error —
    the wiring is env-gated exactly like the compressed-codec decoders
    (multimodal.py). Returns the started StreamingQuery.
    """
    stream = (spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", bootstrap_servers)
              .option("subscribe", topic)
              .option("startingOffsets", starting_offsets)
              .load()
              .selectExpr("CAST(value AS STRING) AS value"))
    apply_batch = _make_apply_batch(
        spark, store, f"kafka:{bootstrap_servers}/{topic}")
    writer = (stream.writeStream.foreachBatch(apply_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_inserts_from_files(spark: SparkSession, store: QuadStore,
                              updates_dir: str,
                              deadline_seconds: Optional[float] = None,
                              checkpoint_dir: Optional[str] = None,
                              max_files_per_trigger: Optional[int] = None) -> None:
    """Replay a directory of SPARQL-update files as a micro-batch stream.

    Each text file is one update message (the adapter's RabbitMQ message
    granularity); ``availableNow`` drains the backlog then stops — the
    equivalent of the reference's all-data-received barrier (A5,
    GraphDBSystemAdapter.java:306-315).

    Scale shape (EP2): the message PARSE runs on the executors
    (mapPartitions over the micro-batch), and the ground INSERT DATA
    messages — the streaming hot path — append as ONE quad DataFrame in one
    snapshot swap, so driver work per batch is O(1), not O(messages). In a
    MIXED batch only the (rare) pattern-update/delete messages' raw text
    reaches the driver for serial execution — never the whole batch. Like
    the reference's 2-thread update pool (GraphDBSystemAdapter.java:82),
    cross-message ordering within a batch is not guaranteed; the insert
    bulk lands first, then the non-insert stragglers in message order.

    Restartability (A5/A16 × B37): pass a STABLE ``checkpoint_dir`` to make
    the ingest resumable after a crash. foreachBatch replays the in-flight
    micro-batch on restart; the store records the highest applied batch id
    per checkpoint (durable stores persist it in the SAME log transaction
    as the batch's append), so a replayed insert-only batch is skipped
    exactly-once. A crash BETWEEN the append-commit and a mixed batch's
    end-of-batch marker re-runs the batch: the insert leg deduplicates
    (RDF set semantics, ``add_quads(dedup=True)``) and only the non-insert
    stragglers are at-least-once — the reference's concurrent update pool
    gives no stronger guarantee (GraphDBSystemAdapter.java:82)."""
    src = spark.readStream.format("text")
    if max_files_per_trigger:
        src = src.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = src.load(updates_dir)
    apply_batch = _make_apply_batch(spark, store,
                                    checkpoint_dir or updates_dir)
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_ing_")
    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    try:
        if deadline_seconds is None:
            q.awaitTermination()
        elif not q.awaitTermination(deadline_seconds):
            # graceful-drain deadline (A16): the reference caps its drain at
            # 2 h (GraphDBSystemAdapter.java:306-315) — stop after the
            # in-flight micro-batch, leaving the store consistent
            q.stop()
            q.awaitTermination()
    finally:
        if checkpoint_dir is None:
            # staged-file GC (A7): the drain is complete (availableNow), so
            # the one-shot streaming checkpoint is dead state — reclaim it.
            # Caller-provided checkpoints are kept: they are the restart
            # cursor.
            import shutil
            shutil.rmtree(ckpt, ignore_errors=True)


# ------------------------------------------------------------ windows


def tumbling_counts(events: DataFrame, minutes: int = 5,
                    watermark: str = "10 minutes") -> DataFrame:
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (e.groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"),
                    "event_type", "cnt", "sum_value"))


def sliding_counts(events: DataFrame, window_min: int = 10, slide_min: int = 5,
                   watermark: str = "10 minutes") -> DataFrame:
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (e.groupBy(F.window("ts", f"{window_min} minutes",
                               f"{slide_min} minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"), "cnt"))


def session_counts(events: DataFrame, gap_min: int = 5,
                   watermark: str = "10 minutes") -> DataFrame:
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (e.groupBy(F.session_window("ts", f"{gap_min} minutes").alias("w"),
                      "user_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"), "user_id", "cnt"))


def stream_dedup(events: DataFrame, keys: tuple = ("event_id",),
                 watermark: str = "30 days") -> DataFrame:
    """Streaming exact deduplication (E1 × E6): emit each key's FIRST
    arrival, suppress re-deliveries — the at-least-once → exactly-once
    repair every training-data ingest pipeline needs.

    The dedup key includes the event-time column, so Spark evicts dedup
    state once the watermark passes a key's timestamp: state is bounded by
    the re-delivery horizon (the watermark), not the stream's lifetime —
    the property that keeps this runnable forever at 100 TB/day. Duplicates
    arriving later than the watermark are dropped as late rows, which for
    a dedup is also correct (the first copy was already emitted)."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return e.dropDuplicates([*keys, "ts"])


def run_stream_dedup(spark: SparkSession, events_parquet: str,
                     copies: int = 2) -> DataFrame:
    """Replay ``copies`` full copies of the events table as a file stream
    through :func:`stream_dedup`; the output must equal ONE copy."""
    from graphdb_free_mocha_sa_spark.sources.registry import (
        normalize_event_timestamps)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = normalize_event_timestamps(spark.read.parquet(events_parquet))
    stage = tempfile.mkdtemp(prefix="stream_dedup_")
    for i in range(copies):
        batch.coalesce(4).write.mode("append") \
            .parquet(os.path.join(stage, f"c={i}"))
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 4).parquet(stage + "/*"))
    out = stream_dedup(stream)
    table = f"stream_dedup_{abs(hash(events_parquet)) % 10_000}"
    q = (out.writeStream.format("memory").queryName(table)
         .outputMode("append")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_dd_"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(table)


# ------------------------------------------------------------ equivalence harness


def run_stream_batch_equivalent(spark: SparkSession, events_parquet: str,
                                agg_fn: Callable[[DataFrame], DataFrame],
                                shuffle_fraction: float = 0.0,
                                seed: int = 7) -> tuple[DataFrame, DataFrame]:
    """Run ``agg_fn`` through batch read AND through readStream/availableNow.

    ``shuffle_fraction`` > 0 writes a late-data variant (that fraction of
    rows re-ordered into a second file) — watermark handling must still
    converge to the batch answer once the backlog drains."""
    from graphdb_free_mocha_sa_spark.sources.registry import normalize_event_timestamps
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = normalize_event_timestamps(spark.read.parquet(events_parquet))
    batch_out = agg_fn(batch)

    stage = tempfile.mkdtemp(prefix="stream_src_")
    if shuffle_fraction > 0:
        late = batch.sample(shuffle_fraction, seed=seed)
        ontime = batch.subtract(late)
        ontime.write.mode("overwrite").parquet(os.path.join(stage, "f=1"))
        late.write.mode("append").parquet(os.path.join(stage, "f=2"))
        src_path = stage + "/*"
    else:
        batch.write.mode("overwrite").parquet(stage)
        src_path = stage

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 4).parquet(src_path))
    out = agg_fn(stream)
    table = f"stream_eq_{abs(hash(events_parquet)) % 10_000}"
    q = (out.writeStream.format("memory").queryName(table)
         .outputMode("complete")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_eq_"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    stream_out = spark.table(table)
    return batch_out, stream_out
