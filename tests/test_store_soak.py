"""Durable-vs-memory lockstep soak (round 5): the DEFAULT store must agree
with the reference in-memory semantics under long randomized transaction
sequences, survive reopen at any point, and keep its segment count bounded
by compaction.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA
from graphdb_free_mocha_sa_spark.store import DurableQuadStore, QuadStore


def _quads(spark, rows):
    return spark.createDataFrame(
        [("urn:g%d" % g, "urn:s%d" % s, "urn:p%d" % p, "v%d" % v,
          None, None, None, None) for g, s, p, v in rows], QUAD_SCHEMA)


def _snapshot(store):
    return sorted((r.g, r.s, r.p, r.o_lex)
                  for r in store.df.select("g", "s", "p", "o_lex").collect())


@pytest.mark.parametrize("seed", [20260814])
def test_durable_store_lockstep_soak(spark, tmp_path, seed):
    rng = random.Random(seed)
    mem = QuadStore(spark)
    dur = DurableQuadStore(spark, str(tmp_path / "store"), base_buckets=4)

    def rand_rows(k):
        return [(rng.randrange(2), rng.randrange(8), rng.randrange(3),
                 rng.randrange(5)) for _ in range(k)]

    for step in range(60):
        op = rng.random()
        if op < 0.55:
            rows = rand_rows(rng.randrange(1, 6))
            for st in (mem, dur):
                st.add_quads(_quads(spark, rows))
        elif op < 0.75:
            rows = rand_rows(3)
            for st in (mem, dur):
                st.delete_quads(_quads(spark, rows))
        elif op < 0.85:
            g = "urn:g%d" % rng.randrange(2)
            for st in (mem, dur):
                st.clear_graph(g)
        elif op < 0.95:
            src = "urn:g%d" % rng.randrange(2)
            dst = "urn:g%d" % rng.randrange(2)
            kind = rng.choice(["COPY", "ADD", "MOVE"])
            for st in (mem, dur):
                st.copy_graph(kind, src, dst)
        else:
            rows = rand_rows(4)
            for st in (mem, dur):
                st.load_version(_quads(spark, rows))
        if step % 20 == 19:
            assert _snapshot(mem) == _snapshot(dur), f"diverged at {step}"

    final = _snapshot(mem)
    assert final == _snapshot(dur)
    # segment fan-in stays bounded by compaction
    assert len(dur._segments) <= dur.SEGMENT_COMPACT_THRESHOLD
    # reopen = identical state (durability), including version counter
    re = DurableQuadStore(spark, dur.path)
    assert _snapshot(re) == final
    assert re.version == dur.version
    # RDF set semantics on the dedup path: a dedup-append of existing rows
    # changes nothing
    some = _quads(spark, [(0, 1, 1, 1)])
    dur.add_quads(some, dedup=True)
    dur.add_quads(some, dedup=True)
    n = dur.df.where((F.col("s") == "urn:s1") & (F.col("p") == "urn:p1")
                     & (F.col("o_lex") == "v1")
                     & (F.col("g") == "urn:g0")).count()
    assert n == 1
