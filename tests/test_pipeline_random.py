"""Randomized differential sweeps for the round-5c curation operators:
pure-Python reference implementations replayed over random corpora
(the same strategy as the SPARQL MINUS/UNION randomized sweeps)."""

from __future__ import annotations

import math
import random

from graphdb_free_mocha_sa_spark.operators import pipeline as P


def _ref_line_dedup(docs, sep, min_chars=0):
    seen = set()
    out = {}
    for doc_id, text in sorted(docs):
        kept, total = [], 0
        for line in text.split(sep):
            total += 1
            if min_chars and len(line) < min_chars:
                kept.append(line)
            elif line not in seen:
                seen.add(line)
                kept.append(line)
        out[doc_id] = (sep.join(kept), len(kept), total - len(kept))
    return out


def test_line_dedup_random_differential(spark):
    rng = random.Random(13)
    vocab = [f"line{i}" for i in range(30)] + ["", "x"]
    docs = [(i, "\n".join(rng.choice(vocab)
                          for _ in range(rng.randint(1, 12))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    for mc in (0, 3):
        got = {r.doc_id: (r.text_dedup, r.n_kept, r.n_dropped)
               for r in P.line_dedup(df, min_chars=mc).collect()}
        assert got == _ref_line_dedup(docs, "\n", mc), f"min_chars={mc}"


def test_line_dedup_regex_special_separator(spark):
    """The separator is a literal, not a regex — '.' and '|' must split
    on themselves only."""
    docs = [(1, "a.b.c"), (2, "b.zzz")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r.doc_id: r.text_dedup
           for r in P.line_dedup(df, sep=".").collect()}
    assert got == {1: "a.b.c", 2: "zzz"}
    df2 = spark.createDataFrame([(1, "p|q"), (2, "q|r")],
                                "doc_id bigint, text string")
    got2 = {r.doc_id: r.text_dedup
            for r in P.line_dedup(df2, sep="|").collect()}
    assert got2 == {1: "p|q", 2: "r"}


def _ref_lm_score(docs, alpha):
    import re
    tok = lambda t: [w for w in re.split(r"[^a-z0-9']+", t.lower()) if w]
    uni, big = {}, {}
    toks = {d: tok(t) for d, t in docs}
    for ws in toks.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[a, b] = big.get((a, b), 0) + 1
    V = len(uni)
    out = {}
    for d, ws in toks.items():
        evs = list(zip(ws, ws[1:]))
        if not evs:
            out[d] = (0, None)
            continue
        # mirror the engine's DECIMAL(18,6) per-event quantization
        s = sum(round(math.log((big[a, b] + alpha) / (uni[a] + alpha * V)),
                      6) for a, b in evs)
        out[d] = (len(evs), round(s, 6) / len(evs))
    return out


def test_lm_score_random_differential(spark):
    rng = random.Random(29)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 15))))
            for i in range(80)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    ref = _ref_lm_score(docs, 0.5)
    got = {r.doc_id: (r.n_events, r.avg_logprob)
           for r in P.lm_score(df, alpha=0.5).collect()}
    assert set(got) == set(ref)
    for d in ref:
        assert got[d][0] == ref[d][0], d
        if ref[d][1] is None:
            assert got[d][1] is None, d
        else:
            assert abs(got[d][1] - ref[d][1]) < 2e-6, d


def test_curation_ops_on_structured_stream(spark, tmp_path):
    """The map-only curation stages (quality features, PII scrub) apply
    unchanged to a Structured Stream — stateless Column expressions are
    streaming-safe, so the same curation plan runs at ingest time."""
    import json
    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [{"doc_id": i,
             "text": ("fine readable text with plenty of good words here"
                      if i % 2 else "spam spam spam spam contact "
                                    "a@b.com now")}
            for i in range(8)]
    with open(src / "batch0.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    stream = (spark.readStream.schema("doc_id bigint, text string")
              .json(str(src)))
    curated = P.pii_scrub(P.repetition_features(stream)
                          .filter("keep").select("doc_id", "text"))
    q = (curated.writeStream.format("memory")
         .queryName("curated_stream").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    out = spark.sql("select * from curated_stream").collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [1, 3, 5, 7]           # spam docs filtered out
    assert all("[EMAIL]" not in r.text for r in out)
