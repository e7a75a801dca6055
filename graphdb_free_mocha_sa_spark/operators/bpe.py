"""Distributed BPE tokenizer training (E3 extension, round 5c).

Byte-pair-encoding merge-rule learning (Sennrich et al. 2016) as a
Spark-native iterative aggregation — the tokenizer-training stage of an
LLM data pipeline, run on the corpus the pipeline just curated.

Scale shapes:

- Training iterates over the DISTINCT-WORD table (one corpus-wide
  explode → groupBy, then every BPE iteration costs O(|vocab|), not
  O(corpus) — the classic word-frequency-dict formulation).
- The per-iteration argmax moves exactly ONE row to the driver (the
  winning pair); pair counting is an explode → groupBy → orderBy-limit-1
  aggregate with a total deterministic order (count desc, pair asc), so
  the learned merge list is independent of partitioning.
- Symbol arrays evolve via a left fold (``F.aggregate``) inside codegen
  — no Python in the row loop, merges apply left-to-right
  non-overlapping exactly like the reference algorithm.
- Lineage is re-rooted with ``localCheckpoint`` every few iterations so
  a 1000-merge run doesn't drown the driver in plan history.

The wrapped reference engine has no tokenizer surface
(GraphDBSystemAdapter.java exposes query/update only); this is an [EXT]
north-star operator per SURVEY.md §2.3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphdb_free_mocha_sa_spark.operators.text import tokens

_CHECKPOINT_EVERY = 8


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table ``(word, wc)`` — the training set of
    the word-frequency-dict BPE formulation."""
    return (df.select(F.explode(tokens(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("wc")))


def chars(word: Column) -> Column:
    """Initial symbol sequence of a word: its characters."""
    return F.regexp_extract_all(word, F.lit("."), 0)


def pair_counts(words: DataFrame, sym_col: str = "syms",
                wc_col: str = "wc") -> DataFrame:
    """Weighted adjacent-symbol-pair counts ``(a, b, c)`` over a
    symbolized word table — the aggregate at the heart of every BPE
    iteration (and the oracle-checkable face of the operator)."""
    s = F.col(sym_col)
    n = F.size(s)
    pairs = F.when(n >= 2, F.transform(
        F.slice(s, 1, n - 1),
        lambda x, i: F.struct(x.alias("a"),
                              F.element_at(s, i + 2).alias("b")),
    )).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (words.select(F.col(wc_col), F.explode(pairs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum(wc_col).alias("c")))


def merge_pair(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent ``(a, b)`` into
    the single symbol ``a+b`` — a fold entirely inside codegen."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(x))))


def bpe_train(df: DataFrame, n_merges: int, text_col: str = "text",
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns the
    ordered merge list (the entire trained tokenizer state — a few KB on
    the driver; everything else stays distributed).

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (weighted by word frequency).
    """
    words = (word_counts(df, text_col)
             .select(chars(F.col("word")).alias("syms"), "wc")
             .localCheckpoint())
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        best = (pair_counts(words)
                .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                .limit(1).collect())
        if not best or best[0]["c"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        words = words.select(merge_pair(F.col("syms"), a, b).alias("syms"),
                             "wc")
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            words = words.localCheckpoint()
    return merges


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """Apply a learned merge list to every document: adds ``bpe_tokens``
    (the flat subword sequence) and ``n_bpe`` (its length). Merges fold
    per word inside codegen; the expression nests one ``aggregate`` per
    merge rule, so keep rule lists to the hundreds on the hot path (or
    encode against a persisted vocab via a join-based segmenter)."""
    def encode_word(w: Column) -> Column:
        s = chars(w)
        for a, b in merges:
            s = merge_pair(s, a, b)
        return s

    toks = tokens(F.col(text_col))
    bpe = F.flatten(F.transform(toks, encode_word))
    return df.select("*", bpe.alias("bpe_tokens"),
                     F.size(bpe).alias("n_bpe"))


def _apply_merges_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Sequential in-order merge application — the exact Python mirror of
    the :func:`merge_pair` fold, so both encoders segment identically."""
    syms = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        out = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_encode_distinct(df: DataFrame, merges: list[tuple[str, str]],
                        text_col: str = "text") -> DataFrame:
    """The 100 TB encode path: segment each DISTINCT word once (an
    Arrow-batched pandas pass over the vocab-sized word table — cheap
    pure-Python string work, the sanctioned Python lane), then hash-join
    the word→subwords map back onto the corpus and reassemble documents
    in position order. Unlike :func:`bpe_encode` the merge-list length
    never enters the expression tree, so 10k-merge tokenizers encode as
    cheaply as 10-merge ones.

    Output schema matches :func:`bpe_encode`: input columns +
    ``bpe_tokens array<string>`` + ``n_bpe``; the two encoders segment
    identically (equality-tested).
    """
    import pandas as pd

    spark = df.sparkSession
    id_cols = df.columns
    toks = df.select("*", F.posexplode(tokens(F.col(text_col)))
                     .alias("__pos", "__w"))
    distinct_words = toks.select(F.col("__w")).dropDuplicates()

    merges_local = list(merges)

    def seg(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "__w": pdf["__w"],
                "__sub": [_apply_merges_py(w, merges_local)
                          for w in pdf["__w"]],
            })

    seg_tbl = distinct_words.mapInPandas(
        seg, "  __w string, __sub array<string>")

    joined = toks.join(seg_tbl, "__w")
    rebuilt = (joined.groupBy(*id_cols)
               .agg(F.flatten(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct("__pos", "__sub"))),
                   lambda s: s["__sub"])).alias("bpe_tokens")))
    # docs with zero tokens disappear from the explode: restore as empty
    return (df.join(rebuilt, id_cols, "left")
            .select(*id_cols,
                    F.coalesce("bpe_tokens",
                               F.array().cast("array<string>"))
                    .alias("bpe_tokens"))
            .withColumn("n_bpe", F.size("bpe_tokens")))
