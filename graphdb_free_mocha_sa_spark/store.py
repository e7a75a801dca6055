"""QuadStore — versioned, snapshot-isolated quad table management.

Mirrors the reference adapter's lifecycle (SURVEY §3):

* **Versioned bulk load** (EP1): each load lands in named graph
  ``http://graph.version.N`` (GraphDBSystemAdapter.java:318), version counter
  incremented per phase (:332). ``load_version`` is atomic write-then-swap —
  the new snapshot DataFrame only replaces the current one after the input
  parses completely, mirroring the reference's one-transaction-per-version
  begin/commit/rollback (:281-292).
* **Snapshot isolation** (A11/B38): the reference serializes task-INSERTs
  with a write-preferring RW lock (:82,:201,:227,:245). Spark DataFrames are
  immutable, so readers that grab ``store.df`` hold a consistent snapshot for
  free; writers swap the reference atomically. Write-pref semantics degenerate
  to "last swap wins", which is observationally equivalent for batch readers.
* At 100 TB this object would wrap a Delta/parquet table partitioned by ``g``
  (partition pruning = the reference's context index) and bucketed by ``s``;
  the in-memory union-of-DataFrames here keeps identical semantics for tests.
"""

from __future__ import annotations

import threading
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_free_mocha_sa_spark.model import (GRAPH_VERSION_PREFIX,
                                               QUAD_COLS, QUAD_SCHEMA,
                                               local_quads_df)

DEFAULT_GRAPH = "urn:x-default:graph"


class QuadStore:
    def __init__(self, spark: SparkSession, quads: Optional[DataFrame] = None):
        self.spark = spark
        self._df = quads.select(*QUAD_COLS) if quads is not None \
            else local_quads_df(spark, [])
        self._version = 0
        self._lock = threading.Lock()
        #: OUTER writer serialization (reentrant). Every public write path
        #: acquires it for its whole read-transform-commit span, and the
        #: engine's checked-update gate (B42) holds it across
        #: execute + consistency-check + rollback — so a rollback can never
        #: clobber a concurrent writer's committed update (r10 advisor fix:
        #: the old snapshot-then-unconditional-restore lost any commit that
        #: raced the consistency check). Readers never touch it: snapshot()
        #: only takes the short inner ``_lock``.
        self._writer_gate = threading.RLock()
        self._inferred: Optional[DataFrame] = None
        #: bumped by destructive ops (DELETE/CLEAR/COPY/MOVE). Readers that
        #: maintain append-only-incremental state (the engine's sameAs
        #: component cache) compare epochs: same epoch ⇒ only appends
        #: happened since, incremental update is sound.
        self.destructive_epoch = 0
        #: FTS index registry (B43): name IRI → operators.fts.FtsIndex.
        #: GraphDB semantics — an index is a SNAPSHOT built at
        #: luc:createIndex time, stale until explicitly re-created.
        #: fts_epoch joins the engine's plan-cache basis so a rebuild
        #: invalidates prepared plans that matched against the old index.
        self.fts_indexes: dict = {}
        self._fts_params: dict[str, str] = {}
        self.fts_epoch = 0
        #: bumped on EVERY committed mutation (appends, rewrites, closure
        #: re-materialization). The engine's B42 commit gate compares it
        #: against the epoch of the last update it verified consistent:
        #: equal ⇒ the pre-update state is known consistent and the
        #: O(delta) check / pure-delete skip are sound; different ⇒ some
        #: unchecked path (direct store writes, streaming ingest, an
        #: engine without the gate) mutated the store since, so the gate
        #: must fall back to the FULL check once (r10 advisor fix: the
        #: delta branch is only sound over a consistent pre-state —
        #: violations it can't see are exactly the ones not involving the
        #: delta).
        self.write_epoch = 0

    # -- snapshot reads ------------------------------------------------

    @property
    def df(self) -> DataFrame:
        """Current snapshot (immutable — readers keep it while writers swap)."""
        return self._df

    def snapshot(self) -> tuple:
        """Atomic (base, inferred) pair. Writers swap BOTH references under
        the lock (r9 concurrency-soak fix: base and closure used to swap in
        two steps, so a reader could pair a post-delete base with the
        pre-delete closure for the entire DRed computation — the served
        soak saw a member carrying its derived type without its premise)."""
        with self._lock:
            return self._df, self._inferred

    def df_with_inference(self) -> DataFrame:
        df, inf = self.snapshot()
        if inf is None:
            return df
        return df.unionByName(inf)

    @property
    def version(self) -> int:
        return self._version

    def _mutate(self, fn):
        """Atomic read-modify-write: the transform reads the CURRENT
        snapshot inside the lock, so concurrent writers can't lose updates
        (the reference serializes writers with its write-pref lock,
        GraphDBSystemAdapter.java:82,227 — same guarantee, shorter critical
        section: only driver-side plan building happens under the lock)."""
        with self._writer_gate, self._lock:
            self.destructive_epoch += 1
            self.write_epoch += 1
            self._commit_rewrite(fn(self._df))

    def _append(self, delta: DataFrame):
        """Append-only commit (INSERT DATA / bulk load): the durable
        subclass persists just the delta segment instead of the snapshot."""
        with self._writer_gate, self._lock:
            self._commit_append(delta.select(*QUAD_COLS))

    # -- transaction rollback (request atomicity / consistency gate) ------

    def txn_rollback_point(self) -> dict:
        """Opaque capture of the pre-transaction data state. Take it at
        transaction start under the writer gate; :meth:`txn_rollback`
        restores it in O(1) — no data rewrite. The durable subclass
        additionally captures its log pointer (base + segment names),
        whose files are immutable and stay on disk until an explicit
        vacuum, so its rollback is one log entry, not a base rewrite —
        at scale the difference between an O(1) abort and rewriting the
        whole store to undo a failed request."""
        with self._lock:
            point = {"df": self._df, "inferred": self._inferred}
            self._txn_capture(point)
            return point

    def _txn_capture(self, point: dict) -> None:
        """Subclass hook: add state to a rollback point (lock held)."""

    def txn_rollback(self, point: dict) -> bool:
        """Restore a rollback point; returns True when published data was
        actually rewound. The epoch bookkeeping lives here: the epoch
        must ADVANCE, never rewind — un-publishing applied ops (even
        pure appends) is a destructive transition, and re-reaching a
        mid-transaction epoch number would let a reader's cache seed
        sameAs propagation from the aborted state (epoch aliasing)."""
        with self._lock:
            changed = self._df is not point["df"]
            if changed:
                self._txn_restore(point)
                self.destructive_epoch += 1
            self._inferred = point["inferred"]
            return changed

    def _txn_restore(self, point: dict) -> None:
        """Re-publish the captured state (lock held)."""
        self._df = point["df"]

    # Commit hooks (called with the lock held). The in-memory store swaps
    # the snapshot reference; DurableQuadStore overrides both to write
    # through to the parquet segment log first (B37 safe transactions).

    #: in-memory appends re-materialize the snapshot every this many
    #: commits — without it a long streaming run builds an ever-deeper
    #: union lineage and driver-side planning becomes the bottleneck
    #: (VERDICT r4 "What's wrong" #2). The durable subclass doesn't need
    #: it (segments are parquet scans, lineage depth is the segment count).
    APPEND_CHECKPOINT_EVERY = 8

    def _commit_rewrite(self, new_df: DataFrame):
        self._df = new_df
        self._take_pending_mark()

    def _commit_append(self, delta: DataFrame):
        self._df = self._df.unionByName(delta)
        self._take_pending_mark()
        self._appends = getattr(self, "_appends", 0) + 1
        if self._appends % self.APPEND_CHECKPOINT_EVERY == 0:
            self._df = self._df.localCheckpoint()

    # -- replayable-ingest batch markers ---------------------------------
    #
    # Structured Streaming's foreachBatch is at-least-once: after a crash
    # the last in-flight micro-batch is REPLAYED. The store records the
    # highest applied batch id per stream key so a replay is detected; the
    # durable subclass persists the marks inside the SAME log transaction
    # as the batch's append (stage → commit), making insert-only batches
    # exactly-once across kill/restart (A5/A16 + B37 safe transactions).

    def stream_last(self, key: str) -> int:
        return getattr(self, "_stream_marks", {}).get(key, -1)

    def stage_stream_mark(self, key: str, batch_id: int) -> None:
        """Stage a mark to ride along with the NEXT commit's log entry."""
        self._pending_mark = (key, batch_id)

    def flush_stream_mark(self) -> None:
        """Ensure the staged mark is recorded even if no commit carried it
        (empty or non-insert-only batch)."""
        pend = getattr(self, "_pending_mark", None)
        if pend is None:
            return
        self._take_pending_mark()

    def _take_pending_mark(self) -> None:
        """Fold the staged mark into the in-memory mark table."""
        pend = getattr(self, "_pending_mark", None)
        if pend is None:
            return
        if not hasattr(self, "_stream_marks"):
            self._stream_marks = {}
        self._stream_marks[pend[0]] = max(self._stream_marks.get(pend[0], -1),
                                          pend[1])
        self._pending_mark = None

    # -- full-text search control (B43) -----------------------------------

    def fts_control(self, s: str, p: str, value) -> None:
        """Apply one ``luc:`` control triple (routed here by the update
        executor — control triples are consumed, never stored as data,
        matching the GraphDB Lucene-plugin magic-predicate protocol)."""
        from graphdb_free_mocha_sa_spark.operators.fts import (
            _KNOWN_PARAMS, LUC_CREATE, LUC_NS, LUC_SET_PARAM, LUC_UPDATE,
            FtsError, build_fts_index)
        with self._writer_gate:
            if p == LUC_SET_PARAM:
                if not s.startswith(LUC_NS):
                    raise FtsError(f"luc:setParam subject must be a luc: "
                                   f"parameter IRI, got {s!r}")
                name = s[len(LUC_NS):]
                # unknown parameters raise HERE, not silently no-op (r10
                # advisor fix: _KNOWN_PARAMS used to be dead code, so a
                # typoed or unimplemented parameter was accepted-and-ignored)
                if name not in _KNOWN_PARAMS:
                    raise FtsError(
                        f"unknown luc:setParam parameter {name!r} "
                        f"(supported: {', '.join(sorted(_KNOWN_PARAMS))})")
                if name == "analyzer":
                    # value validated at SET time (r11): an unsupported
                    # analyzer raises here, before it can be staged at
                    # all — the other half of the control-op atomicity
                    # fix (the executor additionally rolls staged params
                    # back when a later op of the same request fails)
                    from graphdb_free_mocha_sa_spark.operators.fts import (
                        validate_analyzer)
                    validate_analyzer(str(value))
                self._fts_params[name] = str(value)
                return
            if p in (LUC_CREATE, LUC_UPDATE):
                if str(value).lower() != "true":
                    return
                # index the READ view (explicit + materialized inference),
                # snapshotted now — updates do not refresh it implicitly
                self.fts_indexes[s] = build_fts_index(
                    self.spark, self.df_with_inference(),
                    dict(self._fts_params))
                self.fts_epoch += 1
                return
            raise FtsError(f"unknown luc: control predicate {p!r}")

    # FTS control state is transactional alongside the quad data (r11
    # advisor fix, both halves): (a) a failed op inside one update request
    # must not leave earlier luc: mutations behind — the live-found case
    # was a setParam that persisted after the same update's createIndex
    # raised, poisoning every later index build in the session; (b) the
    # B42 consistency-gate rollback must also rewind indexes built inside
    # the aborted transaction, else an index over never-committed triples
    # stays queryable. Update executor and engine snapshot/restore through
    # these hooks.

    def fts_state_snapshot(self) -> dict:
        """Cheap copy of the FTS control state (registry + params + epoch).
        Index objects are immutable snapshots, so shallow dict copies
        suffice."""
        return {"indexes": dict(self.fts_indexes),
                "params": dict(self._fts_params),
                "epoch": self.fts_epoch}

    def fts_state_changed(self, snap: dict) -> bool:
        return (self.fts_epoch != snap["epoch"]
                or self._fts_params != snap["params"]
                or self.fts_indexes != snap["indexes"])

    def fts_state_restore(self, snap: dict) -> None:
        self.fts_indexes = dict(snap["indexes"])
        self._fts_params = dict(snap["params"])
        self.fts_epoch = snap["epoch"]

    # -- writes ---------------------------------------------------------

    def add_quads(self, quads: DataFrame, dedup: bool = False):
        with self._writer_gate:
            self.write_epoch += 1
            self._add_quads_locked(quads, dedup)

    def _add_quads_locked(self, quads: DataFrame, dedup: bool = False):
        delta = quads.select(*QUAD_COLS)
        if dedup:
            # RDF set semantics on the write path: drop rows already in the
            # store (identity on all six term columns). Used by replayable
            # ingest so a crash-replayed micro-batch is idempotent; the
            # delta side is the small one, so this is an anti-join of the
            # delta against the (bucketed) base — O(delta) shuffle.
            cur = self._df.select(*QUAD_COLS)
            cond = F.lit(True)
            for c in ("g", "s", "p", "o_lex"):
                cond = cond & (F.col("l." + c) == F.col("r." + c))
            cond = cond & F.col("l.o_dt").eqNullSafe(F.col("r.o_dt")) \
                        & F.col("l.o_lang").eqNullSafe(F.col("r.o_lang"))
            delta = (delta.alias("l").join(cur.alias("r"), cond, "left_anti")
                     .dropDuplicates(["g", "s", "p", "o_lex", "o_dt", "o_lang"]))
        if self._inferred is not None:
            # closure is live: maintain it incrementally (EP2 parity — the
            # reference applies incremental inference on streaming INSERTs).
            # The whole read-increment-commit runs under the writer lock so
            # (a) concurrent writers can't interleave between the increment
            # basis and the append, and (b) base + closure swap in one
            # critical section — readers never see the delta without its
            # consequences (r9 soak fix; writers serialize, readers don't
            # block: they only take the lock for the snapshot() pair read)
            from graphdb_free_mocha_sa_spark.operators.inference import (
                owl_horst_closure, owl_horst_increment)
            with self._lock:
                new_inf = owl_horst_increment(self.spark, self._df,
                                              self._inferred, delta)
                self._commit_append(delta)
                if new_inf is None:          # TBox changed: re-materialize
                    self._inferred = owl_horst_closure(self.spark, self._df)
                elif not new_inf.isEmpty():
                    self._inferred = self._inferred.unionByName(new_inf)
            return
        self._append(delta)

    def delete_quads(self, quads: DataFrame):
        with self._writer_gate:
            self.write_epoch += 1
            self._delete_quads_locked(quads)

    def _delete_quads_locked(self, quads: DataFrame):
        victim = quads.select(*QUAD_COLS)
        ren = victim.select(*[F.col(c).alias("__d_" + c) for c in QUAD_COLS])
        cond = F.lit(True)
        for c in ["g", "s", "p", "o_lex"]:
            cond = cond & (F.col(c) == F.col("__d_" + c))
        cond = cond & (F.col("o_dt").eqNullSafe(F.col("__d_o_dt"))) \
                    & (F.col("o_lang").eqNullSafe(F.col("__d_o_lang")))
        # base delete + closure maintenance commit in ONE critical section
        # (r9 soak fix): the old two-step (_mutate, then retraction) left a
        # DRed-sized window where readers paired the post-delete base with
        # the stale closure — a dangling derived type without its premise
        with self._lock:
            self.destructive_epoch += 1
            new_df = self._df.join(ren, cond, "left_anti")
            if self._inferred is None:
                self._commit_rewrite(new_df)
                return
            # DRed scans the post-delete base several times (the deleted-set
            # anti-join, the old/new worlds of the over-delete and re-derive
            # passes) — pin it ONCE so each scan reads blocks instead of
            # re-running the delete anti-join (r11 opt, guide §5). Only on
            # the closure-maintenance path: a plain delete stays a lazy
            # single-reader plan.
            new_df = new_df.localCheckpoint()
            # DRed needs the TRIPLES whose last copy went away: a premise
            # deleted from one graph but still asserted in another still
            # holds (the closure reads the union of graphs)
            gone = victim.join(
                new_df.select(F.col("s").alias("__ks"),
                              F.col("p").alias("__kp"),
                              F.col("o_lex").alias("__ko"),
                              F.col("o_dt").alias("__kd"),
                              F.col("o_lang").alias("__kl")),
                (F.col("s") == F.col("__ks")) & (F.col("p") == F.col("__kp"))
                & (F.col("o_lex") == F.col("__ko"))
                & F.col("o_dt").eqNullSafe(F.col("__kd"))
                & F.col("o_lang").eqNullSafe(F.col("__kl")), "left_anti")
            new_inf = self._inferred_after_delete(new_df, gone)
            self._commit_rewrite(new_df)
            self._inferred = new_inf

    def load_version(self, quads: DataFrame, graph: Optional[str] = None) -> str:
        """Atomic versioned bulk load; returns the graph IRI used."""
        with self._writer_gate, self._lock:
            self.write_epoch += 1
            graph = graph or f"{GRAPH_VERSION_PREFIX}{self._version}"
            staged = quads.select(
                F.lit(graph).alias("g"),
                *[F.col(c) for c in QUAD_COLS if c != "g"])
            self._version += 1       # before commit: the log records it
            try:
                self._commit_append(staged)
            except Exception:
                self._version -= 1   # rollback (reference: :292, txn abort)
                raise
        return graph

    def clear_graph(self, target: str):
        """CLEAR/DROP GRAPH <g> | DEFAULT | NAMED | ALL (B34)."""
        if target == "ALL":
            xform = lambda df: self.spark.createDataFrame([], QUAD_SCHEMA)  # noqa: E731
        elif target == "DEFAULT":
            xform = lambda df: df.filter(F.col("g") != DEFAULT_GRAPH)  # noqa: E731
        elif target == "NAMED":
            xform = lambda df: df.filter(F.col("g") == DEFAULT_GRAPH)  # noqa: E731
        else:
            xform = lambda df: df.filter(F.col("g") != target)  # noqa: E731
        self._rewrite_maintaining_inference(xform)

    def copy_graph(self, op: str, src: Optional[str], dst: Optional[str]):
        s = src or DEFAULT_GRAPH
        d = dst or DEFAULT_GRAPH
        if s == d:
            return
        def xform(df: DataFrame) -> DataFrame:
            moved = df.filter(F.col("g") == s).withColumn("g", F.lit(d))
            base = df
            if op in ("COPY", "MOVE"):
                base = base.filter(F.col("g") != d)
            if op == "MOVE":
                base = base.filter(F.col("g") != s)
            return base.unionByName(moved.select(*QUAD_COLS))

        self._rewrite_maintaining_inference(xform)

    # -- inference ------------------------------------------------------

    def _rewrite_maintaining_inference(self, fn):
        """Destructive rewrite + closure re-materialization in ONE critical
        section (bulk graph ops re-materialize per the recorded policy:
        TBox delete / CLEAR / COPY / MOVE → re-materialize; readers never
        see the new base with the old closure — r9 soak fix)."""
        with self._writer_gate, self._lock:
            self.destructive_epoch += 1
            self.write_epoch += 1
            new_df = fn(self._df)
            if self._inferred is None:
                self._commit_rewrite(new_df)
                return
            from graphdb_free_mocha_sa_spark.operators.inference import (
                owl_horst_closure)
            new_inf = owl_horst_closure(self.spark, new_df)
            self._dred_depth = 0
            self._commit_rewrite(new_df)
            self._inferred = new_inf

    def _inferred_after_delete(self, new_df: DataFrame,
                               deleted: DataFrame) -> DataFrame:
        """The maintained closure after an ABox delete: GraphDB retracts
        inferred statements when their premises go (repo-config.ttl
        inference on delete). With the deleted quads in hand, DRed
        maintenance (over-delete the consequence cone, re-derive
        survivors — operators/inference.owl_horst_decrement) keeps the
        cost proportional to the deletion's consequences; TBox deletions
        re-materialize from the surviving base facts. Called with the
        writer lock HELD; returns the frame the caller commits together
        with the new base."""
        from graphdb_free_mocha_sa_spark.operators.inference import (
            QUAD_COLS, owl_horst_closure, owl_horst_decrement, pin_inference)
        # Pin the deleted set HERE (r12 opt): the emptiness check below and
        # every decrement-side reader share one materialization instead of
        # re-running the last-copy-gone anti-join (the lazy isEmpty alone
        # cost 4 jobs), and owl_horst_decrement skips its own re-pin.
        deleted = deleted.select(*QUAD_COLS).localCheckpoint()
        if deleted.isEmpty():           # nothing semantically removed
            return self._inferred
        new_inf = owl_horst_decrement(self.spark, new_df,
                                      self._inferred, deleted,
                                      deleted_pinned=True)
        if new_inf is not None:
            # the common no-restore path returns a LAZY broadcast
            # anti-join over the pinned closure; bound the lineage
            # depth across repeated deletes
            self._dred_depth = getattr(self, "_dred_depth", 0) + 1
            if self._dred_depth >= 4:
                new_inf = pin_inference(self.spark, new_inf)
                self._dred_depth = 0
            return new_inf
        self._dred_depth = 0            # TBox delete: re-materialize
        return owl_horst_closure(self.spark, new_df)

    def materialize_inference(self):
        """Forward-chaining closure maintained alongside base data (B40)."""
        from graphdb_free_mocha_sa_spark.operators.inference import owl_horst_closure
        with self._writer_gate:
            self.write_epoch += 1
            self._inferred = owl_horst_closure(self.spark, self._df)

    # -- persistence (the 100 TB layout) ---------------------------------

    def write_parquet(self, path: str):
        self._df.write.mode("overwrite").partitionBy("g").parquet(path)

    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str) -> "QuadStore":
        return cls(spark, spark.read.parquet(path))

    def write_bucketed_table(self, name: str, n_buckets: int = 32):
        """The full SURVEY §1.4 catalog layout: parquet **bucketed by ``s``
        and sorted by ``s``** within each bucket. Star-pattern BGPs are s=s
        self-joins; when both sides scan a bucketed table Spark's bucketed
        sort-merge join runs with ZERO Exchange — at 100 TB that deletes
        the dominant shuffle of every multi-pattern query. (Bucketing
        needs a metastore table, hence ``saveAsTable`` instead of a bare
        parquet path; graph pruning then comes from the ``s``-bucket +
        parquet row-group stats rather than directory partitioning.)"""
        (self._df.write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, "s").sortBy("s").saveAsTable(name))

    @classmethod
    def read_table(cls, spark: SparkSession, name: str) -> "QuadStore":
        return cls(spark, spark.table(name))


class _CommitConflict(Exception):
    """Internal: a concurrent committer won the log txn we attempted."""


class DurableQuadStore(QuadStore):
    """QuadStore that commits through to disk (B37: the reference runs
    GraphDB in safe-transaction mode, ``owlim:transaction-mode "safe"`` /
    ``transaction-isolation "true"``, repo-config.ttl:47-48, with durable
    storage surviving container restarts).

    Layout — a minimal transaction log over an immutable **bucketed base
    table** plus immutable parquet delta segments::

        path/_log/00000001.json   {"txn":1,"base":"base-...","segments":[...],
                                   "version":N,"buckets":32}
        path/base-00000001-ab12cd34/part-*_00000.c000.parquet  (bucketed by s)
        path/seg-00000002-cd34ef56/g_part=.../part-*.parquet

    The base is written ``bucketBy(n, "s").sortBy("s")`` and exposed as an
    external catalog table (re-registered from the log on every open — the
    session catalog need not survive restarts, the files + log are the
    durable truth). Star-pattern BGPs are s=s self-joins; scans of the base
    join bucket-to-bucket with ZERO Exchange (SURVEY §1.4 — the durable
    analogue of the reference's subject-clustered statement indexes,
    repo-config.ttl:30-31). Rewrites and compactions produce a fresh base;
    appends stay O(delta) parquet segments until the compaction threshold
    folds them in.

    * **Appends** (INSERT DATA, versioned bulk load, streaming micro-batch)
      write ONLY the delta as a new segment — O(delta) per commit, the same
      cost shape Delta Lake gives a 100 TB table — then publish a log entry
      naming the new live-segment list.
    * **Rewrites** (DELETE/CLEAR/COPY/MOVE) write one compacted snapshot
      segment. Appends also compact when the segment count passes
      :attr:`SEGMENT_COMPACT_THRESHOLD`, bounding read fan-in.
    * **Atomicity/rollback**: the log entry is written to a temp file and
      ``os.rename``d into place; a failed segment write (e.g. a parse error
      surfacing while the delta lineage executes) leaves the log untouched —
      the transaction never happened, mirroring the reference's
      begin/commit/rollback bulk load (GraphDBSystemAdapter.java:281-292).
    * **Snapshot isolation**: segments are immutable and a rewrite does not
      delete superseded segments, so a reader that pinned ``store.df``
      before the commit keeps a fully readable snapshot; ``vacuum()``
      reclaims unreferenced segments once old readers are gone.
    * Graph filters prune at the segment scan (``g_part`` partition layout,
      see :func:`persist_quads`) — the durable analogue of the reference's
      context index.

    The inference closure (``_inferred``) stays in-memory: it is derivable
    from the base facts and re-materialized on demand after recovery.
    """

    SEGMENT_COMPACT_THRESHOLD = 16
    #: bucket count for the base table (s-hash fan-out of the biggest
    #: star-join; at 100 TB this is sized to ~executor-core count × a few)
    BASE_BUCKETS = 32

    def __init__(self, spark: SparkSession, path: str,
                 base_buckets: int | None = None):
        import os
        self.spark = spark        # needed by _read_segments before super()
        self.path = path
        self._buckets = base_buckets or self.BASE_BUCKETS
        self._log_dir = os.path.join(path, "_log")
        os.makedirs(self._log_dir, exist_ok=True)
        entry = self._latest_log()
        self._txn = entry["txn"] if entry else 0
        self._base: Optional[str] = entry.get("base") if entry else None
        self._segments: list[str] = list(entry["segments"]) if entry else []
        self._stream_marks: dict = dict(entry.get("stream", {})) if entry else {}
        if entry and entry.get("buckets"):
            self._buckets = entry["buckets"]
        super().__init__(spark, self._snapshot_df())
        if entry:
            self._version = entry["version"]
        # disk bound across sessions: reclaim dirs unreferenced by the
        # latest log entry and older than the race horizon (a concurrent
        # committer's data lands before its log rename)
        self.vacuum(min_age_seconds=3600.0)
        self._load_fts_registry()

    # -- durable FTS indexes (B43: GraphDB's index survives restarts) -----

    def _fts_registry_path(self) -> str:
        import os
        return os.path.join(self.path, "fts", "registry.json")

    def _load_fts_registry(self) -> None:
        import json
        import os
        reg = self._fts_registry_path()
        if not os.path.exists(reg):
            return
        from graphdb_free_mocha_sa_spark.operators.fts import FtsIndex
        try:
            with open(reg) as fh:
                entries = json.load(fh)
            for name, rel in entries.items():
                self.fts_indexes[name] = FtsIndex.read(
                    self.spark, os.path.join(self.path, "fts", rel))
            if entries:
                self.fts_epoch += 1
        except Exception:
            # a torn registry (crash mid-create) must not poison open();
            # the index is rebuildable with one luc:createIndex
            self.fts_indexes.clear()
            return
        # vacuum superseded index generations (same 1h race horizon as
        # the segment vacuum: a concurrent rebuild's files land before
        # its registry rename)
        import shutil
        import time as _time
        live = set(entries.values())
        base = os.path.join(self.path, "fts")
        for d in os.listdir(base):
            full = os.path.join(base, d)
            if (os.path.isdir(full) and d not in live
                    and not d.endswith(".tmp")
                    and _time.time() - os.path.getmtime(full) > 3600.0):
                shutil.rmtree(full, ignore_errors=True)

    def fts_control(self, s: str, p: str, value) -> None:
        super().fts_control(s, p, value)
        from graphdb_free_mocha_sa_spark.operators.fts import (LUC_CREATE,
                                                               LUC_UPDATE)
        if p not in (LUC_CREATE, LUC_UPDATE) or s not in self.fts_indexes \
                or str(value).lower() != "true":
            return
        import hashlib
        import json
        import os
        import uuid
        # fresh generation dir per (re)build: a reader pinned on the OLD
        # index keeps readable files (same snapshot-isolation story as the
        # segment log); unreferenced generations are vacuumed at open
        rel = (hashlib.md5(s.encode()).hexdigest()[:12]
               + "-" + uuid.uuid4().hex[:8])
        base = os.path.join(self.path, "fts")
        os.makedirs(base, exist_ok=True)
        self.fts_indexes[s].write(os.path.join(base, rel))
        # re-open from the persisted files: the in-memory build's
        # localCheckpoint blocks die with this session, the parquet lives
        from graphdb_free_mocha_sa_spark.operators.fts import FtsIndex
        self.fts_indexes[s] = FtsIndex.read(self.spark,
                                            os.path.join(base, rel))
        reg = self._fts_registry_path()
        try:
            with open(reg) as fh:
                entries = json.load(fh)
        except Exception:
            entries = {}
        entries[s] = rel
        tmp = reg + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(entries, fh)
        os.rename(tmp, reg)

    def fts_state_snapshot(self) -> dict:
        """Durable stores also capture the on-disk registry bytes, so a
        restore rewinds what a re-open would see — the generation dirs a
        rolled-back build wrote become unreferenced and are reclaimed by
        the existing open-time vacuum (same 1h horizon as segments)."""
        import os
        snap = super().fts_state_snapshot()
        try:
            with open(self._fts_registry_path(), "rb") as fh:
                snap["registry"] = fh.read()
        except OSError:
            snap["registry"] = None
        return snap

    def fts_state_restore(self, snap: dict) -> None:
        import os
        super().fts_state_restore(snap)
        reg = self._fts_registry_path()
        if snap.get("registry") is None:
            try:
                os.remove(reg)
            except OSError:
                pass
            return
        tmp = reg + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(snap["registry"])
        os.rename(tmp, reg)

    # -- bucketed base table ----------------------------------------------

    def _register_base(self) -> str:
        """Expose the current base files as a bucketed external table.
        The catalog name embeds the BASE GENERATION (hash of path+base
        dir), so registration is append-only and idempotent — concurrent
        writers on the same path never DROP each other's registration,
        and a name always points at exactly one immutable dir. Catalog
        entries are session-scoped; the log names the live base dir, so
        every open re-derives the registration — files + log are the
        durable truth."""
        import hashlib
        import os
        loc = os.path.join(os.path.abspath(self.path), self._base)
        name = "quads_base_" + hashlib.sha1(loc.encode()).hexdigest()[:12]
        if not self.spark.catalog.tableExists(name):
            ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                            for f in QUAD_SCHEMA.fields)
            try:
                self.spark.sql(
                    f"CREATE TABLE {name} ({ddl}) USING parquet "
                    f"CLUSTERED BY (s) SORTED BY (s) "
                    f"INTO {self._buckets} BUCKETS LOCATION '{loc}'")
            except Exception:
                if not self.spark.catalog.tableExists(name):
                    raise               # a real failure, not a create race
        return name

    def _write_base(self, df: DataFrame) -> Optional[str]:
        """Persist ``df`` as a fresh bucketed base; None for an empty df."""
        import os
        import shutil
        import uuid
        if df.isEmpty():
            return None
        name = f"base-{self._txn + 1:08d}-{uuid.uuid4().hex[:8]}"
        loc = os.path.join(os.path.abspath(self.path), name)
        tmp = f"quads_base_stage_{uuid.uuid4().hex[:8]}"
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        try:
            # Pre-cluster on the bucket key: HashPartitioning and the
            # bucket spec share the same Murmur3 hash, so each write task
            # receives exactly one bucket — one output file per bucket
            # (instead of input_partitions x n_buckets small files) and
            # one bounded sort per task instead of hundreds of concurrent
            # sorters fighting for execution memory (the 10x scale probe
            # OOM'd here before this).
            from pyspark.sql import functions as F
            (df.select(*QUAD_COLS)
             .repartition(self._buckets, F.col("s")).write
             .bucketBy(self._buckets, "s").sortBy("s")
             .option("path", loc).saveAsTable(tmp))
        except Exception:
            shutil.rmtree(loc, ignore_errors=True)
            raise
        finally:
            self.spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        return name

    def _snapshot_df(self) -> DataFrame:
        if self._base:
            out = self.spark.table(self._register_base()).select(*QUAD_COLS)
            if self._segments:
                out = out.unionByName(self._read_segments(self._segments))
            return out
        if self._segments:
            return self._read_segments(self._segments)
        return None

    # -- log + segment primitives ----------------------------------------

    def _latest_log(self) -> Optional[dict]:
        import json
        import os
        names = sorted(n for n in os.listdir(self._log_dir)
                       if n.endswith(".json"))
        if not names:
            return None
        with open(os.path.join(self._log_dir, names[-1])) as fh:
            return json.load(fh)

    def _read_segments(self, segs: list[str]) -> DataFrame:
        import os
        if not segs:
            return self.spark.createDataFrame([], QUAD_SCHEMA)
        dfs = [load_persisted_quads(self.spark, os.path.join(self.path, s))
               for s in segs]
        out = dfs[0].select(*QUAD_COLS)
        for d in dfs[1:]:
            out = out.unionByName(d.select(*QUAD_COLS))
        return out

    def _write_segment(self, df: DataFrame) -> Optional[str]:
        """Persist ``df`` as an immutable segment; None for an empty delta
        (an empty partitioned write leaves nothing readable behind)."""
        import os
        import shutil
        import uuid
        seg = f"seg-{self._txn + 1:08d}-{uuid.uuid4().hex[:8]}"
        full = os.path.join(self.path, seg)
        persist_quads(df.select(*QUAD_COLS), full)
        if not any(e.startswith("g_part=") for e in os.listdir(full)):
            shutil.rmtree(full, ignore_errors=True)
            return None
        return seg

    def _commit_log(self, on_conflict=None) -> None:
        """Optimistic multi-writer commit: the log entry publishes via an
        ATOMIC-CREATE (``os.link`` — fails if the txn number is taken), so
        a concurrent committer on the same path can never be silently
        overwritten. On a lost race, appends MERGE onto the winner's state
        (``on_conflict`` folds the latest entry in) and retry; rewrites
        republish their own snapshot at the next txn (last-writer-wins —
        the same semantics the in-memory store's snapshot swap has)."""
        import json
        import os
        import uuid
        self._take_pending_mark()     # batch marker commits WITH the data
        while True:
            self._txn += 1
            tmp = os.path.join(self._log_dir, f".tmp-{uuid.uuid4().hex[:8]}")
            with open(tmp, "w") as fh:
                json.dump({"txn": self._txn, "base": self._base,
                           "segments": self._segments,
                           "version": self._version,
                           "buckets": self._buckets,
                           "stream": getattr(self, "_stream_marks", {})}, fh)
            target = os.path.join(self._log_dir, f"{self._txn:08d}.json")
            try:
                os.link(tmp, target)
                os.unlink(tmp)
                return
            except FileExistsError:
                os.unlink(tmp)
                latest = self._latest_log()
                self._txn = latest["txn"]
                if on_conflict is not None:
                    on_conflict(latest)

    def flush_stream_mark(self) -> None:
        """A mark not carried by any data commit (empty / non-insert-only
        batch) still needs durability: write a log-only transaction."""
        if getattr(self, "_pending_mark", None) is None:
            return
        with self._lock:
            if getattr(self, "_pending_mark", None) is not None:
                self._commit_log()

    # -- commit hooks (lock held by callers) ------------------------------

    def _commit_append(self, delta: DataFrame):
        if self._base is None and not self._segments:
            # first write into an empty store: land it as the bucketed
            # base directly — bulk load IS the index build (the reference
            # builds its statement indexes during load). Pin the delta:
            # a lost initialization race retries it as a plain segment.
            import os
            import shutil
            delta = delta.select(*QUAD_COLS).localCheckpoint()
            base = self._write_base(delta)
            if base is None:
                return
            self._base, self._segments = base, []
            conflict: dict = {}

            def on_c(latest: dict) -> None:
                conflict["latest"] = latest
                raise _CommitConflict()

            try:
                self._commit_log(on_conflict=on_c)
            except _CommitConflict:
                # another writer initialized the store first: our bucketed
                # base can't stack on theirs — fold the delta in as a
                # normal segment on top of the winner's state instead
                latest = conflict["latest"]
                shutil.rmtree(os.path.join(self.path, base),
                              ignore_errors=True)
                self._txn = latest["txn"]
                self._base = latest.get("base")
                self._segments = list(latest["segments"])
                self._version = max(self._version, latest["version"])
                marks = getattr(self, "_stream_marks", {})
                for k, v in (latest.get("stream") or {}).items():
                    marks[k] = max(marks.get(k, -1), v)
                self._stream_marks = marks
                self._append_segment(delta)
                return
            df = self._snapshot_df()
            self._df = df if df is not None \
                else self.spark.createDataFrame([], QUAD_SCHEMA)
            return
        if len(self._segments) >= self.SEGMENT_COMPACT_THRESHOLD:
            # compaction: fold base + segments + delta into a fresh base
            self._commit_rewrite(self._df.unionByName(delta))
            return
        self._append_segment(delta)

    def _append_segment(self, delta: DataFrame):
        seg = self._write_segment(delta)
        if seg is None:
            return                     # empty delta: no transaction needed
        self._segments = self._segments + [seg]
        raced = []

        def merge_append(latest: dict) -> None:
            """Fold a concurrent winner's state under OUR delta segment:
            the append stays valid against any base/segment set."""
            raced.append(True)
            self._base = latest.get("base")
            self._segments = list(latest["segments"]) + [seg]
            self._version = max(self._version, latest["version"])
            marks = getattr(self, "_stream_marks", {})
            for k, v in (latest.get("stream") or {}).items():
                marks[k] = max(marks.get(k, -1), v)
            self._stream_marks = marks

        self._commit_log(on_conflict=merge_append)
        if raced:
            df = self._snapshot_df()   # base/segments changed underneath
            self._df = df if df is not None \
                else self.spark.createDataFrame([], QUAD_SCHEMA)
        else:
            self._df = self._df.unionByName(
                self._read_segments([seg]))

    def _txn_capture(self, point: dict) -> None:
        point.update({"base": self._base,
                      "segments": list(self._segments),
                      "store_version": self._version})

    def _txn_restore(self, point: dict) -> None:
        # O(1) durable rollback: republish the captured log pointer — the
        # referenced base/segment files are immutable and still on disk
        # (vacuum only runs quiesced / at open behind an age horizon), so
        # no data is rewritten. Segments/bases written by the aborted
        # transaction become unreferenced and are reclaimed by the next
        # vacuum, exactly like rolled-back FTS index generations.
        self._base = point["base"]
        self._segments = list(point["segments"])
        self._version = point["store_version"]
        self._commit_log()
        self._df = point["df"]

    def _commit_rewrite(self, new_df: DataFrame):
        self._base = self._write_base(new_df)
        self._segments = []
        self._commit_log()
        df = self._snapshot_df()
        self._df = df if df is not None \
            else self.spark.createDataFrame([], QUAD_SCHEMA)

    def vacuum(self, min_age_seconds: float = 0.0) -> int:
        """Delete bases/segments no longer referenced by the latest log
        entry (old pinned snapshots become unreadable — call when
        quiesced). ``min_age_seconds`` guards the open-time auto-vacuum:
        a dir younger than the horizon may be a concurrent session's
        about-to-be-committed write (data lands before its log entry), so
        only old garbage is reclaimed."""
        import os
        import shutil
        import time
        live = set(self._segments) | ({self._base} if self._base else set())
        # a sibling quad-view POINTER artifact may share the original base
        # files (open_fixture_store's single-write cold open) — keep its
        # target even after later mutations roll the live base
        try:
            from graphdb_free_mocha_sa_spark import cache as C
            tgt = C.read_pointer(os.path.join(
                os.path.dirname(os.path.abspath(self.path)), "quads"))
            if tgt:
                live.add(os.path.basename(tgt.rstrip("/")))
        except Exception:
            pass
        n = 0
        now = time.time()
        for name in os.listdir(self.path):
            if (name.startswith("seg-") or name.startswith("base-")) \
                    and name not in live:
                full = os.path.join(self.path, name)
                try:
                    if now - os.path.getmtime(full) < min_age_seconds:
                        continue
                except OSError:
                    continue
                shutil.rmtree(full, ignore_errors=True)
                n += 1
        return n


def open_fixture_store(spark: SparkSession, sf_dir: str) -> "DurableQuadStore":
    """THE default store for a fixture directory (VERDICT r4 top item):
    a :class:`DurableQuadStore` rooted in the fingerprint-keyed artifact
    cache. Cold open loads the RDF quad encoding of ``sf_dir`` and lands it
    as the bucketed-by-``s`` base table (the reference builds its persistent
    statement indexes during bulk load, repo-config.ttl:30-31); any warm
    open — same session or a later one — re-registers the base from the
    transaction log and scans parquet, no re-derivation. Fixture
    regeneration changes the fingerprint, which rolls the store directory.

    Two sessions racing the cold build both write a txn-1 base; the log
    rename is atomic, so readers see one winner and the loser's base dir
    is unreferenced (vacuumable) — same guarantee as the artifact cache's
    publish race."""
    import os
    from graphdb_free_mocha_sa_spark import cache as C
    from graphdb_free_mocha_sa_spark.sources.registry import load_quads
    store = DurableQuadStore(spark, os.path.join(C.artifact_dir(sf_dir),
                                                 "store"))
    if store._base is None and not store._segments:
        # Cold open writes the quads ONCE (r12 opt, guide §6): the bucketed
        # base is built straight from the 7-table quad-view LINEAGE
        # (artifact=False skips the separate quad-view parquet write the
        # r11 cold profile measured as a second full disk pass), and the
        # quad-view artifact is then published as a POINTER at the base
        # files. The base dir is immutable (mutations write fresh bases)
        # and vacuum() keeps pointer targets alive.
        store.add_quads(load_quads(spark, sf_dir, cache=False,
                                   artifact=False))
        if store._base:
            C.publish_pointer(
                os.path.join(os.path.abspath(store.path), store._base),
                os.path.join(C.artifact_dir(sf_dir), "quads"))
    return store


# ---------------------------------------------------------------- durable layout


def persist_quads(quads: DataFrame, path: str,
                  graph_partitioned: bool = True) -> None:
    """Write the quad table in the durable 100 TB layout: Parquet
    partitioned by ``g`` — GRAPH/version-pinned queries then read only
    matching partitions (partition pruning = the reference's context index,
    repo-config.ttl:29). Graph IRIs are hex-encoded into the partition
    value to stay filesystem-safe; ``load_persisted_quads`` restores them.

    (Bucketing by ``s`` additionally applies when writing through a
    catalog table — ``df.write.bucketBy(n, "s").sortBy("s")`` — which
    needs a metastore; the partition layout alone is self-describing.)
    """
    enc = quads.withColumn(
        "g_part", F.hex(F.col("g").cast("binary")))
    (enc.write.mode("overwrite").partitionBy("g_part").parquet(path))


def load_persisted_quads(spark: SparkSession, path: str) -> DataFrame:
    """Read the durable layout back; ``g`` is restored from the partition
    value so filters on ``g`` become PartitionFilters in the scan."""
    df = spark.read.parquet(path)
    return (df.withColumn("g", F.unhex(F.col("g_part")).cast("string"))
            .drop("g_part") if "g_part" in df.columns else df)
