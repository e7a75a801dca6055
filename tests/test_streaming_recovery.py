"""Kill/restart recovery for streaming ingest against the durable store
(VERDICT r4 item 6): checkpoint + segment-log recovery must resume with no
loss and no duplication — the Spark analogue of the reference's safe
transaction mode (``owlim:transaction-mode "safe"``, repo-config.ttl:47).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_free_mocha_sa_spark.store import DurableQuadStore
from graphdb_free_mocha_sa_spark.streaming.ingest import stream_inserts_from_files

N_FILES = 12


def _write_updates(d, n=N_FILES):
    d.mkdir(exist_ok=True)
    for i in range(n):
        (d / f"u{i:03d}.ru").write_text(
            f'INSERT DATA {{ <urn:e{i}> <urn:p> "v{i}" }}')


def _expected(n=N_FILES):
    return {(f"urn:e{i}", f"v{i}") for i in range(n)}


def _observed(store):
    return {(r.s, r.o_lex)
            for r in store.df.where(F.col("p") == "urn:p")
            .select("s", "o_lex").collect()}


class _CrashBefore(DurableQuadStore):
    """Crash BEFORE the commit lands once the fuse burns down: the batch
    must be invisible and fully replayed on restart."""
    fuse = 2

    def _commit_append(self, delta):
        if _CrashBefore.fuse == 0:
            raise RuntimeError("injected crash before commit")
        _CrashBefore.fuse -= 1
        super()._commit_append(delta)


class _CrashAfter(DurableQuadStore):
    """Crash AFTER the commit lands (data + batch marker durable, but the
    streaming checkpoint offset is not): the replayed batch must be
    detected by the marker and skipped — no duplicate rows."""
    fuse = 2

    def _commit_append(self, delta):
        super()._commit_append(delta)
        if _CrashAfter.fuse == 0:
            raise RuntimeError("injected crash after commit")
        _CrashAfter.fuse -= 1


@pytest.mark.parametrize("crasher,fuse", [(_CrashBefore, 2), (_CrashAfter, 2)])
def test_ingest_crash_restart_no_loss_no_dup(spark, tmp_path, crasher, fuse):
    updates = tmp_path / "updates"
    _write_updates(updates)
    ckpt = str(tmp_path / "ckpt")
    store_path = str(tmp_path / "store")

    crasher.fuse = fuse
    broken = crasher(spark, store_path)
    with pytest.raises(Exception, match="injected crash"):
        stream_inserts_from_files(spark, broken, str(updates),
                                  checkpoint_dir=ckpt,
                                  max_files_per_trigger=2)
    assert len(_observed(broken)) < N_FILES     # it really died mid-stream

    # restart: RE-OPEN the store from its log (cold, fresh object) and
    # resume from the same checkpoint
    recovered = DurableQuadStore(spark, store_path)
    stream_inserts_from_files(spark, recovered, str(updates),
                              checkpoint_dir=ckpt,
                              max_files_per_trigger=2)
    assert _observed(recovered) == _expected()
    # exactly-once: no duplicate quad rows either
    assert recovered.df.count() == \
        recovered.df.dropDuplicates(["g", "s", "p", "o_lex"]).count()


def test_ingest_warm_store_restart(spark, tmp_path):
    """Second crash-free scenario: a WARM store object (the one that took
    the crash) is reused for the resume instead of a cold reopen."""
    updates = tmp_path / "updates"
    _write_updates(updates)
    ckpt = str(tmp_path / "ckpt")

    _CrashAfter.fuse = 3
    store = _CrashAfter(spark, str(tmp_path / "store"))
    with pytest.raises(Exception, match="injected crash"):
        stream_inserts_from_files(spark, store, str(updates),
                                  checkpoint_dir=ckpt,
                                  max_files_per_trigger=2)
    _CrashAfter.fuse = 10**9                     # defuse; same object resumes
    stream_inserts_from_files(spark, store, str(updates),
                              checkpoint_dir=ckpt,
                              max_files_per_trigger=2)
    assert _observed(store) == _expected()
    assert store.df.count() == \
        store.df.dropDuplicates(["g", "s", "p", "o_lex"]).count()


def test_kafka_ingest_wiring_env_gated(spark, tmp_path):
    """A2 parity: the Kafka update-consumer wiring exists and shares the
    micro-batch applier with the file path. The connector jar is not in
    this container, so stream construction must fail with Spark's
    missing-data-source error (the documented env gate) — if the jar IS
    present, the query starts and is stopped immediately."""
    from graphdb_free_mocha_sa_spark.store import QuadStore
    from graphdb_free_mocha_sa_spark.streaming.ingest import (
        stream_inserts_from_kafka)
    try:
        q = stream_inserts_from_kafka(
            spark, QuadStore(spark), "localhost:9092", "updates",
            checkpoint_dir=str(tmp_path / "ckpt"))
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        assert "kafka" in msg.lower(), msg
    else:
        q.stop()


def test_open_time_vacuum_reclaims_old_garbage_only(spark, tmp_path):
    """Re-opening a durable store GCs dirs unreferenced by the latest log
    entry — but only past the race horizon, so a concurrent committer's
    in-flight write is never deleted."""
    import os
    import time
    from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA
    path = str(tmp_path / "store")
    st = DurableQuadStore(spark, path)

    def q(s):
        return spark.createDataFrame(
            [("urn:g", s, "urn:p", "v", None, None, None, None)], QUAD_SCHEMA)

    st.add_quads(q("urn:a"))                  # base
    st.add_quads(q("urn:b"))                  # segment
    st.delete_quads(q("urn:zz"))              # rewrite -> old base+seg stale
    stale = [n for n in os.listdir(path)
             if (n.startswith(("seg-", "base-")))
             and n not in ({st._base} | set(st._segments))]
    assert stale
    old = time.time() - 7200
    for n in stale:
        os.utime(os.path.join(path, n), (old, old))
    reopened = DurableQuadStore(spark, path)
    assert reopened.df.count() == 2           # data intact
    left = set(os.listdir(path))
    assert not (left & set(stale))            # old garbage reclaimed
    assert reopened._base in left             # live base untouched


def test_ingest_mixed_batch_replay_dedups(spark, tmp_path):
    """A mixed batch (inserts + a pattern DELETE) that crashes between the
    insert append and the end-of-batch marker replays its insert leg with
    set semantics — no duplicate quads."""
    updates = tmp_path / "updates"
    updates.mkdir()
    (updates / "u000.ru").write_text(
        'INSERT DATA { <urn:a> <urn:p> "1" . <urn:b> <urn:p> "2" }')
    (updates / "u001.ru").write_text(
        'DELETE WHERE { <urn:none> <urn:p> ?o }')
    ckpt = str(tmp_path / "ckpt")

    class CrashAfterFirst(DurableQuadStore):
        armed = True

        def _commit_append(self, delta):
            super()._commit_append(delta)
            if CrashAfterFirst.armed:
                CrashAfterFirst.armed = False
                raise RuntimeError("injected crash after commit")

    store = CrashAfterFirst(spark, str(tmp_path / "store"))
    with pytest.raises(Exception, match="injected crash"):
        stream_inserts_from_files(spark, store, str(updates),
                                  checkpoint_dir=ckpt,
                                  max_files_per_trigger=10)
    recovered = DurableQuadStore(spark, str(tmp_path / "store"))
    stream_inserts_from_files(spark, recovered, str(updates),
                              checkpoint_dir=ckpt,
                              max_files_per_trigger=10)
    rows = recovered.df.where(F.col("p") == "urn:p")
    assert {(r.s, r.o_lex) for r in rows.collect()} == \
        {("urn:a", "1"), ("urn:b", "2")}
    assert rows.count() == 2                     # deduped replay


def test_concurrent_writers_no_lost_appends(spark, tmp_path):
    """Two independent store objects on the SAME path appending
    concurrently: the atomic-create log commit + append merge must keep
    every delta — no lost updates — and a fresh reopen sees all of them."""
    import threading
    from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA
    path = str(tmp_path / "store")
    a = DurableQuadStore(spark, path)
    b = DurableQuadStore(spark, path)

    def q(tag, i):
        return spark.createDataFrame(
            [("urn:g", f"urn:{tag}{i}", "urn:p", "v", None, None, None,
              None)], QUAD_SCHEMA)

    errs = []

    def writer(store, tag):
        try:
            for i in range(6):
                store.add_quads(q(tag, i))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(a, "a"))
    t2 = threading.Thread(target=writer, args=(b, "b"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    re = DurableQuadStore(spark, path)
    subjects = {r.s for r in re.df.select("s").collect()}
    assert subjects == {f"urn:a{i}" for i in range(6)} \
        | {f"urn:b{i}" for i in range(6)}
    assert re.df.count() == 12
