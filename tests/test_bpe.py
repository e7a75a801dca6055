"""Distributed BPE tokenizer training (operators/bpe.py) vs an
independent in-test pure-Python reference implementation (SURVEY §5
golden-answer strategy), plus losslessness and layout-invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_free_mocha_sa_spark.operators import bpe as B


def ref_bpe(word_freqs: dict[str, int], n_merges: int,
            min_count: int = 2) -> list[tuple[str, str]]:
    words = {}
    for w, c in word_freqs.items():
        t = tuple(w)
        words[t] = words.get(t, 0) + c
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pc[syms[i], syms[i + 1]] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        (a, b), cnt = min(pc.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_count:
            break
        merges.append((a, b))
        new: dict[tuple, int] = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new[t] = new.get(t, 0) + c
        words = new
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _corpus(spark, freqs):
    rows = [(i, w) for i, (word, c) in enumerate(freqs.items())
            for w in [" ".join([word] * c)]]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bpe_train_matches_reference(spark):
    df = _corpus(spark, SENNRICH)
    got = B.bpe_train(df, n_merges=8)
    assert got == ref_bpe(SENNRICH, 8)
    assert got[0] == ("e", "s")          # es: 9 weighted occurrences
    assert got[1] == ("es", "t")


def test_bpe_train_min_count_stops_early(spark):
    freqs = {"ab": 1, "cd": 1}
    df = _corpus(spark, freqs)
    assert B.bpe_train(df, n_merges=5, min_pair_count=2) == []


def test_bpe_encode_lossless_and_compresses(spark):
    df = _corpus(spark, SENNRICH)
    merges = B.bpe_train(df, n_merges=10)
    enc = B.bpe_encode(
        spark.createDataFrame([(1, "newest lowland")],
                              "doc_id bigint, text string"), merges)
    row = enc.collect()[0]
    # lossless: concatenating subwords reproduces the words
    assert "".join(row.bpe_tokens) == "newestlowland"
    # frequent training word collapses to one symbol; novel word doesn't
    assert "newest" in row.bpe_tokens
    assert row.n_bpe < len("newestlowland")


def test_bpe_train_partitioning_invariant(spark):
    rows = [(i, "spark shuffle spark merge shuffle join") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = B.bpe_train(df.repartition(1), n_merges=5)
    b = B.bpe_train(df.repartition(13), n_merges=5)
    assert a == b and len(a) == 5


def test_pair_counts_closed_form(spark):
    wc = spark.createDataFrame([(["a", "b", "a", "b"], 3), (["a", "b"], 2)],
                               "syms array<string>, wc bigint")
    got = {(r.a, r.b): r.c for r in B.pair_counts(wc).collect()}
    assert got == {("a", "b"): 8, ("b", "a"): 3}


def test_bpe_encode_distinct_matches_expression_encoder(spark):
    import random
    rng = random.Random(41)
    df_train = _corpus(spark, SENNRICH)
    merges = B.bpe_train(df_train, n_merges=10)
    vocab = ["low", "lower", "newest", "widest", "lowland", "zq", ""]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    a = {r.doc_id: (tuple(r.bpe_tokens), r.n_bpe)
         for r in B.bpe_encode(df, merges).collect()}
    b = {r.doc_id: (tuple(r.bpe_tokens), r.n_bpe)
         for r in B.bpe_encode_distinct(df, merges).collect()}
    assert a == b
    # empty docs present with empty token arrays
    empties = [d for d, t in docs if not t.strip()]
    for d in empties:
        assert b[d] == ((), 0)


def test_bpe_encode_distinct_large_merge_list(spark):
    """The join-based encoder must handle merge lists far beyond what the
    nested-expression encoder can compile."""
    df = _corpus(spark, SENNRICH)
    real = B.bpe_train(df, n_merges=10)
    # pad with merges that never fire to reach 500 rules
    fake = [(f"q{i}", f"z{i}") for i in range(490)]
    out = {r.doc_id: tuple(r.bpe_tokens)
           for r in B.bpe_encode_distinct(df, real + fake).collect()}
    ref = {r.doc_id: tuple(r.bpe_tokens)
           for r in B.bpe_encode_distinct(df, real).collect()}
    assert out == ref
