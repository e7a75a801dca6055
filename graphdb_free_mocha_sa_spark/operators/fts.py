"""GraphDB-style full-text search via the ``luc:`` magic predicates (B43).

The reference repository CONFIG disables its FTS index
(``owlim:ftsIndexPolicy "never"``, repo-config.ttl:36-38), but FTS is a
first-class GraphDB Free capability a user can switch on, queried through
the publicly documented Lucene-plugin magic-predicate surface
(namespace ``http://www.ontotext.com/owlim/lucene#``):

* ``luc:<param> luc:setParam "value"``      — set an index parameter
  (INSERT DATA; consumed, never stored as data),
* ``luc:myIndex luc:createIndex "true"``    — build index "myIndex" from
  the CURRENT repository state with the current parameters,
* ``luc:myIndex luc:updateIndex "true"``    — rebuild (re-sync) it,
* ``?node luc:myIndex "query"``             — match entities against the
  index inside a BGP,
* ``?node luc:score ?sc``                   — bind the match's relevance
  score for an entity variable matched earlier in the same group.

Spark-first design: the "index" is a pair of pinned DataFrames — a
document table ``(node, text, ntext)`` (one row per subject, its literal
molecule concatenated) and a token table ``(node, term, tf)`` + corpus
stats — exactly the layout the [EXT] BM25 operator shuffles once and
reuses, so a match is: broadcast the (tiny) parsed query-term table, hash
equi-join it against the token table, aggregate per node, BM25-score with
DECIMAL partial sums (addition order cannot perturb ranking). GraphDB
semantics preserved: the index is a SNAPSHOT — stale until re-created,
never implicitly refreshed by updates.

Supported query syntax (documented Lucene subset): whitespace-separated
terms (default operator OR, like Lucene), ``AND`` to require all plain
terms, ``+term`` required / ``-term`` prohibited prefixes, ``"a phrase"``
(position-exact token sequence, matched against the normalized text),
``term*`` prefix wildcard. Anything else (fuzzy ``~``, boosts ``^``,
fielded ``f:v``, ranges) raises — honestly unsupported, not silently
mis-ranked.

Supported parameters: ``include`` ("literals" only — matches
``owlim:ftsLiteralsOnly "true"``), ``includePredicates`` /
``excludePredicates`` (space-separated predicate IRIs restricting which
literals join a node's molecule), ``moleculeSize`` ("1" only: the node +
its own literals), ``analyzer`` — StandardAnalyzer (default: lowercase +
non-alphanumeric split, no stemming) or, since r11, EnglishAnalyzer
(the same tokenization + Lucene's English stop set + the Porter
stemmer, operators/porter.py; index text, document lengths, phrase
positions and query terms all read the analyzed form, while prefix
wildcards skip analysis exactly as Lucene wildcard terms do). Other
analyzer values and unknown parameter names raise AT setParam time
(store.fts_control; r11 — validation moved earlier as half of the
control-op atomicity fix).

At 100 TB: index build is one groupBy(s) over the literal slice of the
quad table (predicate-pruned when includePredicates is set) plus one
explode→groupBy token aggregation; a query touches only the broadcast
query terms joined against the token table — never the full text again.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LUC_NS = "http://www.ontotext.com/owlim/lucene#"
LUC_SCORE = LUC_NS + "score"
LUC_CREATE = LUC_NS + "createIndex"
LUC_UPDATE = LUC_NS + "updateIndex"
LUC_SET_PARAM = LUC_NS + "setParam"

#: control predicates — never index names, never stored as data
CONTROL_PREDS = {LUC_CREATE, LUC_UPDATE, LUC_SET_PARAM}

_KNOWN_PARAMS = {"include", "includePredicates", "excludePredicates",
                 "moleculeSize", "analyzer"}


class FtsError(ValueError):
    """Bad FTS query syntax / unknown index / unsupported parameter."""


def validate_analyzer(value: str) -> str:
    """Normalize a ``luc:analyzer`` value at setParam time (r11: raising
    HERE, not only at createIndex, is half of the control-op atomicity
    fix — a poisoned param can no longer be staged at all). Accepted:
    the default StandardAnalyzer (tokenize only) and EnglishAnalyzer
    (stop words + Porter stemming, operators/porter.py); anything else
    raises honestly."""
    name = (value or "").rsplit(".", 1)[-1]
    if name in ("", "StandardAnalyzer"):
        return "standard"
    if name == "EnglishAnalyzer":
        return "english"
    raise FtsError(
        f"unsupported luc:analyzer {value!r} (implemented: the default "
        "StandardAnalyzer tokenization — lowercase + non-alphanumeric "
        "split — and EnglishAnalyzer — the same tokenization + Lucene's "
        "English stop set + Porter stemming)")


class FtsIndex:
    """One built index: pinned document + token tables and corpus stats."""

    def __init__(self, docs: DataFrame, tokens: DataFrame,
                 n_docs: int, avgdl: float, analyzer: str = "standard"):
        self.docs = docs          # (node, text, ntext, dl)
        self.tokens = tokens      # (node, term, tf)
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.analyzer = analyzer  # query terms analyzed to match at search

    def write(self, path: str) -> None:
        """Persist to parquet (doc + token tables) + a stats sidecar,
        atomically (write to tmp, rename) — the durable store's index
        layout; at 100 TB the token table IS the scale-bearing artifact
        and lands as a real columnar table, not executor-memory blocks."""
        import json
        import os
        import shutil
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        self.docs.write.parquet(os.path.join(tmp, "docs"))
        self.tokens.write.parquet(os.path.join(tmp, "tokens"))
        with open(os.path.join(tmp, "stats.json"), "w") as fh:
            json.dump({"n_docs": self.n_docs, "avgdl": self.avgdl,
                       "analyzer": self.analyzer}, fh)
        shutil.rmtree(path, ignore_errors=True)
        os.rename(tmp, path)

    @classmethod
    def read(cls, spark: SparkSession, path: str) -> "FtsIndex":
        import json
        import os
        with open(os.path.join(path, "stats.json")) as fh:
            stats = json.load(fh)
        return cls(spark.read.parquet(os.path.join(path, "docs")),
                   spark.read.parquet(os.path.join(path, "tokens")),
                   int(stats["n_docs"]), float(stats["avgdl"]),
                   str(stats.get("analyzer", "standard")))


_TOKEN_SPLIT = r"[^a-z0-9]+"


def _norm_text(col):
    """Lower-cased, delimiter-normalized text: tokens joined by single
    spaces with leading/trailing sentinels, so a phrase match is one
    substring containment test."""
    return F.concat(F.lit(" "),
                    F.trim(F.regexp_replace(F.lower(col), _TOKEN_SPLIT, " ")),
                    F.lit(" "))


def _tokens(col):
    return F.filter(F.split(F.lower(col), _TOKEN_SPLIT), lambda t: t != "")


def build_fts_index(spark: SparkSession, quads: DataFrame,
                    params: dict[str, str] | None = None) -> FtsIndex:
    """Materialize an index snapshot from the quad table (literals only,
    molecule size 1 — the reference config's ``ftsLiteralsOnly`` shape)."""
    params = params or {}
    include = params.get("include", "literals")
    if include != "literals":
        raise FtsError(f"unsupported luc:include {include!r} "
                       "(this engine indexes literals only, matching "
                       "owlim:ftsLiteralsOnly; repo-config.ttl:38)")
    if params.get("moleculeSize", "1") not in ("0", "1"):
        raise FtsError("unsupported luc:moleculeSize "
                       f"{params['moleculeSize']!r} (only 0/1: the node "
                       "and its own literals)")
    # analyzer values validated at setParam time too (store.fts_control);
    # re-validated here because build_fts_index is also a public kernel
    analyzer = validate_analyzer(params.get("analyzer", ""))
    lits = quads.filter(F.col("o_dt").isNotNull())
    inc = [p for p in params.get("includePredicates", "").split() if p]
    exc = [p for p in params.get("excludePredicates", "").split() if p]
    if inc:
        lits = lits.filter(F.col("p").isin(inc))
    if exc:
        lits = lits.filter(~F.col("p").isin(exc))
    # deterministic molecule text: literals sorted, joined by single spaces
    docs = (lits.groupBy(F.col("s").alias("node"))
            .agg(F.array_join(F.array_sort(F.collect_list("o_lex")), " ")
                 .alias("text")))
    return index_from_docs(spark, docs, analyzer=analyzer)


def _english_ntext():
    """Arrow-batched EnglishAnalyzer text normalization: tokenize (same
    base splitter as the standard path), drop Lucene's English stop set,
    Porter-stem, rejoin with space sentinels. A pandas UDF because
    rule-based stemming is genuinely inexpressible in built-in SQL
    functions — and it runs ONCE per index build, never per query."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from graphdb_free_mocha_sa_spark.operators.porter import english_analyze
    split = _re.compile(_TOKEN_SPLIT)

    def f(text):
        def one(t):
            toks = [x for x in split.split((t or "").lower()) if x]
            return " " + " ".join(english_analyze(toks)) + " "
        return text.map(one)

    # explicit annotation objects: this module uses `from __future__ import
    # annotations`, which stringifies inline hints and pandas_udf cannot
    # resolve the local 'pd' name from them
    f.__annotations__ = {"text": pd.Series, "return": pd.Series}
    return pandas_udf(f, "string")


def index_from_docs(spark: SparkSession, docs: DataFrame,
                    analyzer: str = "standard") -> FtsIndex:
    """Index a ``(node, text)`` frame directly — the kernel under
    :func:`build_fts_index`, also usable over a plain document corpus
    (the [EXT] ``documents`` table). ``ntext`` is the ANALYZED text
    (space-sentinel token join), so the token table, document lengths
    and phrase containment all read the one analyzed form."""
    ntext = (_english_ntext()(F.col("text")) if analyzer == "english"
             else _norm_text(F.col("text")))
    docs = (docs.select("node", "text")
            .withColumn("ntext", ntext)
            .withColumn("dl", F.size(_tokens(F.col("ntext"))))
            .localCheckpoint(eager=True))
    tokens = (docs.select("node", F.explode(_tokens(F.col("ntext")))
                          .alias("term"))
              .groupBy("node", "term").agg(F.count(F.lit(1)).alias("tf"))
              .localCheckpoint(eager=True))
    n_docs = docs.count()
    avgdl = (docs.agg(F.avg("dl")).first()[0] or 1.0) if n_docs else 1.0
    return FtsIndex(docs, tokens, n_docs, float(avgdl), analyzer)


# ----------------------------------------------------------- query parsing

_QUERY_TOKEN = re.compile(r'"([^"]*)"|(\S+)')
_UNSUPPORTED = re.compile(r"[~^:()\[\]{}]|\*\S|\?")


def parse_fts_query(q: str) -> dict:
    """Parse the documented Lucene subset into term groups.

    Returns ``{"required": [...], "optional": [...], "prohibited": [...],
    "phrases": [...], "req_prefixes": [...], "opt_prefixes": [...],
    "pro_prefixes": [...]}`` where prefixes are ``term*`` forms with the
    star stripped (``-term*`` excludes every doc containing ANY token
    starting with the prefix — r10 advisor fix: it used to degrade to an
    exact prohibited term, so ``-spark*`` failed to exclude "sparkling").
    """
    required, optional, prohibited, phrases = [], [], [], []
    req_pre, opt_pre, pro_pre = [], [], []
    plain_slots = []     # (list, token) — retargeted to required under AND
    saw_and = False
    for m in _QUERY_TOKEN.finditer(q):
        if m.group(1) is not None:
            toks = [t for t in re.split(_TOKEN_SPLIT, m.group(1).lower())
                    if t]
            # dedupe repeated phrases: they fold to ONE qterm in the
            # match aggregation, so counting each repetition toward
            # n_required would make '"a b" "a b"' unsatisfiable
            # (r10 fuzzer find)
            if toks and toks not in phrases:
                phrases.append(toks)
            continue
        raw = m.group(2)
        if raw == "AND":
            saw_and = True
            continue
        if raw == "OR":
            continue
        if _UNSUPPORTED.search(raw.lstrip("+-").rstrip("*")) \
                or ("*" in raw and not raw.endswith("*")):
            raise FtsError(f"unsupported Lucene syntax in FTS query: {raw!r}")
        sign = ""
        if raw[:1] in "+-":
            sign, raw = raw[0], raw[1:]
        is_prefix = raw.endswith("*")
        term = raw.rstrip("*").lower()
        term = re.sub(_TOKEN_SPLIT, "", term)
        if not term:
            continue
        if sign == "-":
            (pro_pre if is_prefix else prohibited).append(term)
        elif sign == "+":
            (req_pre if is_prefix else required).append(term)
        else:
            tgt = (opt_pre if is_prefix else None)
            if tgt is None:
                plain_slots.append(term)
            else:
                tgt.append(term)
    if saw_and:
        required.extend(plain_slots)
        req_pre.extend(opt_pre)
        opt_pre = []
    else:
        optional.extend(plain_slots)
    if not (required or optional or phrases or req_pre or opt_pre):
        raise FtsError(f"FTS query matches nothing: {q!r}")
    return {"required": required, "optional": optional,
            "prohibited": prohibited, "phrases": phrases,
            "req_prefixes": req_pre, "opt_prefixes": opt_pre,
            "pro_prefixes": pro_pre}


def _analyze_spec(spec: dict, query: str) -> dict:
    """Apply the EnglishAnalyzer pipeline to a parsed query: stop words
    drop out of term groups and phrases (Lucene's query-time StopFilter),
    remaining terms/phrase tokens stem; prefix groups pass through
    unanalyzed (Lucene wildcard semantics). A query left with no positive
    component raises the same matches-nothing error as the parser."""
    from graphdb_free_mocha_sa_spark.operators.porter import (EN_STOPWORDS,
                                                              porter_stem)

    def terms(ts):
        return [porter_stem(t) for t in ts if t not in EN_STOPWORDS]

    out = dict(spec)
    for g in ("required", "optional", "prohibited"):
        out[g] = terms(spec[g])
    # re-dedupe: distinct phrases can stem to the same one, and a
    # duplicate would make the AND-count unsatisfiable (same reason the
    # parser dedupes raw phrases — r10 fuzzer find)
    out["phrases"] = []
    for p in (terms(ph) for ph in spec["phrases"]):
        if p and p not in out["phrases"]:
            out["phrases"].append(p)
    if not (out["required"] or out["optional"] or out["phrases"]
            or out["req_prefixes"] or out["opt_prefixes"]):
        raise FtsError(
            f"FTS query matches nothing after stop-word analysis: {query!r}")
    return out


# ----------------------------------------------------------------- matching

def fts_match(spark: SparkSession, index: FtsIndex, query: str,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Match + score: ``(node STRING, score DOUBLE)``.

    A node matches iff every required term/prefix/phrase matches, no
    prohibited term matches, and (when only optional terms exist) at least
    one optional term matches. Score = BM25 over the matched terms (DECIMAL
    partial sums; phrase hits contribute their occurrence count at idf-like
    weight ln(1+N)).

    On an ``english``-analyzed index, query terms and phrase tokens are
    analyzed the same way the index text was (stop-word removal + Porter
    stem, driver-side — a handful of terms); prefix wildcards are NOT
    stemmed, matching Lucene, where wildcard terms skip analysis and match
    the (stemmed) index terms literally.
    """
    spec = parse_fts_query(query)
    if index.analyzer == "english":
        spec = _analyze_spec(spec, query)
    toks, docs = index.tokens, index.docs
    n = max(index.n_docs, 1)

    def hits(terms: list[str], prefixes: list[str], group: str) -> DataFrame | None:
        pieces = []
        if terms:
            tdf = spark.createDataFrame([(t,) for t in sorted(set(terms))],
                                        "qterm string")
            pieces.append(toks.join(F.broadcast(tdf),
                                    toks["term"] == F.col("qterm"))
                          .select("node", "qterm", "tf"))
        for p in sorted(set(prefixes)):
            # prefix wildcard: per-prefix filter over the token table,
            # folded to ONE logical qterm so AND-counting stays exact
            pieces.append(toks.filter(F.col("term").startswith(p))
                          .groupBy("node")
                          .agg(F.sum("tf").alias("tf"))
                          .select("node", F.lit(p + "*").alias("qterm"), "tf"))
        if not pieces:
            return None
        out = pieces[0]
        for x in pieces[1:]:
            out = out.unionByName(x)
        return out.withColumn("grp", F.lit(group))

    req = hits(spec["required"], spec["req_prefixes"], "req")
    opt = hits(spec["optional"], spec["opt_prefixes"], "opt")
    matched = req
    if opt is not None:
        matched = opt if matched is None else matched.unionByName(opt)

    # phrase containment against the normalized text (substring test is
    # token-exact thanks to the space sentinels)
    phrase_hits = None
    for toks_seq in spec["phrases"]:
        needle = " " + " ".join(toks_seq) + " "
        m_len = len(toks_seq)
        # token positions read the ANALYZED text (identical to raw-text
        # tokens on a standard index; stemmed/stop-filtered on english)
        arr = _tokens(F.col("ntext"))
        # exact OVERLAPPING occurrence count via token-position slices
        # (r10 fuzzer fix: the old replace-length formula over-counted by
        # one — a single occurrence scored tf=2 — because consecutive
        # occurrences share a sentinel space that non-overlapping replace
        # misses, and the +1 meant to compensate broke the base case).
        # Runs only over contains()-filtered candidate docs.
        cnt = F.when(
            F.size(arr) >= m_len,
            F.size(F.filter(
                F.sequence(F.lit(1), F.size(arr) - F.lit(m_len - 1)),
                lambda i: F.slice(arr, i, m_len)
                == F.array(*[F.lit(t) for t in toks_seq])))).otherwise(0)
        ph = (docs.filter(F.col("ntext").contains(needle))
              .select("node",
                      F.lit('"' + " ".join(toks_seq) + '"').alias("qterm"),
                      cnt.cast("long").alias("tf"))
              .withColumn("grp", F.lit("req")))
        phrase_hits = ph if phrase_hits is None else phrase_hits.unionByName(ph)
    if phrase_hits is not None:
        matched = phrase_hits if matched is None \
            else matched.unionByName(phrase_hits)

    n_required = (len(set(spec["required"])) + len(set(spec["req_prefixes"]))
                  + len(spec["phrases"]))
    has_optional = bool(spec["optional"] or spec["opt_prefixes"])

    # per-(node, qterm) BM25 partial; phrases take a flat ln(1+N) idf
    dfreq = (matched.groupBy("qterm")
             .agg(F.count_distinct("node").alias("df")))
    scored = (matched.join(F.broadcast(dfreq), "qterm")
              .join(docs.select("node", "dl"), "node"))
    idf = F.when(F.col("qterm").startswith('"'),
                 F.lit(math.log(1.0 + n))) \
        .otherwise(F.log(F.lit(1.0)
                         + (F.lit(n) - F.col("df") + F.lit(0.5))
                         / (F.col("df") + F.lit(0.5))))
    denom = (F.col("tf").cast("double")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") / F.lit(index.avgdl)))
    part = idf * F.col("tf").cast("double") * F.lit(k1 + 1.0) / denom
    agg = (scored.groupBy("node")
           .agg(F.sum(part.cast("decimal(18,6)")).alias("__s"),
                F.count_distinct(F.when(F.col("grp") == "req",
                                        F.col("qterm"))).alias("__nreq"),
                F.count_distinct(F.when(F.col("grp") == "opt",
                                        F.col("qterm"))).alias("__nopt")))
    cond = F.col("__nreq") == n_required
    if has_optional and n_required == 0:
        cond = cond & (F.col("__nopt") > 0)
    out = agg.filter(cond).select(
        "node", F.col("__s").cast("double").alias("score"))

    if spec["prohibited"] or spec["pro_prefixes"]:
        cond = F.lit(False)
        if spec["prohibited"]:
            cond = cond | F.col("term").isin(spec["prohibited"])
        for p in sorted(set(spec["pro_prefixes"])):
            cond = cond | F.col("term").startswith(p)
        bad = toks.filter(cond).select("node").dropDuplicates()
        out = out.join(bad, "node", "left_anti")
    return out
