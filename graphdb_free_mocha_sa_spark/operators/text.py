"""Text analysis operators for training-data pipelines (E3).

Language-ID (stopword-overlap heuristic), quality scoring (length / punct /
stopword / word-length features), token counting (whitespace + BPE-ish
regex), and document fingerprinting (normalized rolling hash). Everything is
native Column expressions — at 100 TB these run inside whole-stage codegen
with zero Python in the row loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was",
           "for", "on", "with", "as", "at", "by", "an", "be", "this", "are"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "den", "mit",
           "nicht", "ein", "eine", "auf", "für", "im", "dem", "sich", "des"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "dans",
           "que", "qui", "pour", "sur", "pas", "au", "du", "par", "ce"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
           "es", "por", "con", "para", "no", "se", "del", "al", "como"],
}


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"[^\p{L}\p{N}']+"),
                    lambda w: F.length(w) > 0)


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(F.trim(text), r"\s+"),
                           lambda w: F.length(w) > 0))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: count of GPT-2-style pretokenizer matches
    (word pieces, numbers, punctuation runs)."""
    pattern = r"'(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS[lang])))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def lang_id(text: Column) -> Column:
    """Heuristic language id: argmax of per-language stopword hit ratio."""
    toks = tokens(text)
    denom = F.greatest(F.size(toks), F.lit(1)).cast("double")
    scores = {lang: F.size(F.filter(toks, lambda w: w.isin(*sw))).cast("double") / denom
              for lang, sw in STOPWORDS.items()}
    best = F.greatest(*scores.values())
    out = F.lit("unknown")
    for lang in reversed(list(scores)):     # deterministic tie-break: dict order
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite [0,1] score."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[\p{L}\p{N}\s]", ""))
    mean_wl = (F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w))
               .cast("double") / n_tok)
    sw = stopword_ratio(t)
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    score = (
        F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + F.least(sw * 4, F.lit(1.0)) * 0.2
        + F.when((mean_wl >= 3) & (mean_wl <= 10), 1.0).otherwise(0.0) * 0.2)
    return df.select(
        "*", F.size(toks).alias("n_tokens"), n_chars.alias("n_chars_computed"),
        punct_ratio.alias("punct_ratio"), mean_wl.alias("mean_word_len"),
        sw.alias("stopword_ratio"), score.alias("quality_score"))


def fingerprint(text: Column, hasher: str = "xxhash64") -> Column:
    """Deterministic 64-bit document fingerprint over normalized content
    (case/whitespace/punctuation-insensitive rolling hash). ``hasher``
    picks xxhash64 (default, fastest) or md5 (portable — DuckDB computes
    the identical signed value, the exact-oracle path of
    ``ext_fingerprint_md5``, r6c)."""
    norm = F.concat_ws(" ", tokens(text))
    if hasher == "md5":
        from graphdb_free_mocha_sa_spark.operators.dedup import _md5_hash64
        return _md5_hash64(norm)
    return F.xxhash64(norm)


def term_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level term frequency table (explode + groupBy)."""
    return (df.select(F.explode(tokens(F.col(text_col))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .orderBy(F.desc("tf"), F.asc("term")))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = 13, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination (round 5) — the standard LLM-training
    hygiene rule: flag a training document when it shares any word n-gram
    (default 13, the GPT-3/Llama convention) with a held-out benchmark
    set.

    Scale shape: benchmark n-grams hash to 8-byte keys and are typically
    a tiny side (benchmarks are small) — distinct'd and joined against
    the exploded doc-gram hashes; only the 8-byte hash shuffles, never
    the text. Returns ``(doc_id, contaminated BOOLEAN, n_hits BIGINT)``
    for EVERY input doc. Docs shorter than ``n`` tokens contribute their
    full token sequence as a single (short) gram — an exact short-text
    match against a short benchmark item still counts as contamination.
    """
    from graphdb_free_mocha_sa_spark.operators.dedup import word_shingles

    def grams(df, idc):
        return (df.select(F.col(idc).alias("__id"),
                          F.explode(word_shingles(F.col(text_col), n))
                          .alias("g"))
                .select("__id", F.xxhash64("g").alias("gh")))

    bench = (benchmark.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("g"))
        .select(F.xxhash64("g").alias("gh")).dropDuplicates())
    hits = (grams(docs, id_col)
            .join(bench, "gh")
            .groupBy("__id").agg(F.count(F.lit(1)).alias("n_hits")))
    return (docs.select(F.col(id_col))
            .join(hits.withColumnRenamed("__id", id_col), id_col, "left")
            .select(id_col,
                    F.col("n_hits").isNotNull().alias("contaminated"),
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits")))
