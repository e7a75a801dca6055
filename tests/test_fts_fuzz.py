"""B43 FTS differential fuzzer (r10, VERDICT r9 item 4).

Random corpora + random Lucene-subset queries (term/AND/+/-/phrase/prefix
mixes) are evaluated twice:

* by the engine kernel (``operators.fts`` — broadcast-terms x token-table
  joins, token-slice phrase counting, DECIMAL-partial BM25), and
* by a transcribed pure-Python matcher + BM25 scorer in this file.

Queries are GENERATED from a structured spec (groups chosen first, the
query string assembled from them), so the comparison exercises the parser
AND the matcher end-to-end without duplicating the parser in the oracle.
Matched node sets must agree exactly; scores to 1e-5.

The fuzzer's design review already found two phrase-handling defects
before its first run (pinned in test_fts.py): the replace-length phrase
tf over-counted by one, and duplicate phrases were unsatisfiable because
each repetition counted toward n_required while folding to one qterm.
"""

from __future__ import annotations

import math
import random
import re
from collections import Counter

import pytest

TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")

#: prefix families on purpose: prefixes must hit multiple distinct terms
VOCAB = ["spark", "sparkle", "sparkling", "cook", "cooking", "cooker",
         "data", "dataset", "graph", "graphs", "graphite", "index",
         "indexing", "fire", "firefly", "query", "quest", "engine",
         "slow", "fast", "water", "wave"]
ABSENT = ["zzz", "qqq", "xxyy"]          # guaranteed out-of-corpus terms


def _tokens(text: str) -> list[str]:
    return [t for t in TOKEN_SPLIT.split(text.lower()) if t]


def _lev(a: str, b: str) -> int:
    """Classic Levenshtein, independent DP transcription."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _fuzzy_ok(index_term: str, qterm: str, n: int) -> bool:
    """The documented fuzzy distance, independently: adjacent swaps cost
    one edit and apply to the QUERY term first; classic Levenshtein pays
    the remaining budget."""
    if abs(len(index_term) - len(qterm)) > n:
        return False
    forms = {qterm: n}
    frontier = {qterm}
    for spent in range(1, n + 1):
        nxt = set()
        for s in frontier:
            for i in range(len(s) - 1):
                if s[i] != s[i + 1]:
                    nxt.add(s[:i] + s[i + 1] + s[i] + s[i + 2:])
        frontier = nxt
        for v in frontier:
            forms[v] = max(forms.get(v, -1), n - spent)
    return any(_lev(index_term, v) <= bud for v, bud in forms.items())


def _range_ok(term: str, rng: tuple) -> bool:
    lo, hi, ilo, ihi = rng
    if lo != "*" and not (term >= lo if ilo else term > lo):
        return False
    if hi != "*" and not (term <= hi if ihi else term < hi):
        return False
    return True


def _range_label(rng: tuple) -> str:
    lo, hi, ilo, ihi = rng
    return ("[" if ilo else "{") + lo + " TO " + hi + ("]" if ihi else "}")


def ref_match(corpus: dict[str, str], spec: dict,
              k1: float = 1.2, b: float = 0.75) -> dict[str, float]:
    """Pure-Python reference for fts_match over a (node -> text) corpus.

    Implements the documented semantics independently: plain terms are
    deduped per group; a prefix folds all matching vocabulary terms into
    ONE logical qterm with summed tf; a phrase counts OVERLAPPING token-
    sequence occurrences; idf = ln(1 + (N - df + .5)/(df + .5)) for terms
    and prefixes, ln(1 + N) for phrases; per-(node, qterm) BM25 parts are
    rounded to 6 decimal places (the engine's DECIMAL(18,6) partials)
    before summing. A node matches iff every distinct required
    term/prefix/phrase hit, no prohibited term/prefix hit, and — when only
    optional components exist — at least one optional hit.
    """
    from decimal import ROUND_HALF_UP, Decimal
    toks = {n: _tokens(t) for n, t in corpus.items()}
    tf = {n: Counter(ts) for n, ts in toks.items()}
    dl = {n: len(ts) for n, ts in toks.items()}
    n_docs = len(corpus)
    avgdl = (sum(dl.values()) / n_docs if n_docs else 1.0) or 1.0
    n = max(n_docs, 1)

    # hit rows: (node, qterm, tf, grp)
    rows: list[tuple[str, str, int, str]] = []
    for grp, terms, prefixes, fuzzies, ranges in (
            ("req", spec["required"], spec["req_prefixes"],
             spec.get("req_fuzzy", []), spec.get("req_ranges", [])),
            ("opt", spec["optional"], spec["opt_prefixes"],
             spec.get("opt_fuzzy", []), spec.get("opt_ranges", []))):
        for t in sorted(set(terms)):
            for node in corpus:
                if tf[node][t]:
                    rows.append((node, t, tf[node][t], grp))
        # prefix / fuzzy / range each fold matching vocabulary terms into
        # ONE logical qterm with summed tf
        folded = ([(lambda term, p=p: term.startswith(p), p + "*")
                   for p in sorted(set(prefixes))]
                  + [(lambda term, t=t, fn=fn: _fuzzy_ok(term, t, fn),
                      f"{t}~{fn}") for t, fn in sorted(set(fuzzies))]
                  + [(lambda term, r=r: _range_ok(term, r), _range_label(r))
                     for r in sorted(set(ranges))])
        for pred, label in folded:
            for node in corpus:
                s = sum(c for term, c in tf[node].items() if pred(term))
                if s:
                    rows.append((node, label, s, grp))
    phrases = []
    for ph in spec["phrases"]:
        if ph not in phrases:                  # parse dedupes repetitions
            phrases.append(ph)
    for ph in phrases:
        m = len(ph)
        qt = '"' + " ".join(ph) + '"'
        for node in corpus:
            ts = toks[node]
            c = sum(1 for i in range(len(ts) - m + 1) if ts[i:i + m] == ph)
            if c:
                rows.append((node, qt, c, "req"))

    dfreq: Counter = Counter()
    for qt in {(node, qt) for node, qt, _, _ in rows}:
        dfreq[qt[1]] += 1

    n_required = (len(set(spec["required"])) + len(set(spec["req_prefixes"]))
                  + len(set(spec.get("req_fuzzy", [])))
                  + len(set(spec.get("req_ranges", [])))
                  + len(phrases))
    has_optional = bool(spec["optional"] or spec["opt_prefixes"]
                        or spec.get("opt_fuzzy") or spec.get("opt_ranges"))
    boosts = spec.get("boosts", {})

    agg: dict[str, dict] = {}
    for node, qt, t, grp in rows:
        a = agg.setdefault(node, {"score": Decimal(0), "req": set(),
                                  "opt": set()})
        if qt.startswith('"'):
            idf = math.log(1.0 + n)
        else:
            idf = math.log(1.0 + (n - dfreq[qt] + 0.5) / (dfreq[qt] + 0.5))
        part = (idf * t * (k1 + 1.0)
                / (t + k1 * (1.0 - b + b * dl[node] / avgdl))
                * boosts.get(qt, 1.0))
        a["score"] += Decimal(repr(part)).quantize(Decimal("0.000001"),
                                                   ROUND_HALF_UP)
        a[grp].add(qt)

    out = {}
    for node, a in agg.items():
        if len(a["req"]) != n_required:
            continue
        if n_required == 0 and has_optional and not a["opt"]:
            continue
        if any(tf[node][t] for t in spec["prohibited"]):
            continue
        if any(term.startswith(p) for p in spec["pro_prefixes"]
               for term in tf[node]):
            continue
        if any(_fuzzy_ok(term, t, fn)
               for t, fn in spec.get("pro_fuzzy", [])
               for term in tf[node]):
            continue
        if any(_range_ok(term, r) for r in spec.get("pro_ranges", [])
               for term in tf[node]):
            continue
        if any(any(toks[node][i:i + len(ph)] == ph
                   for i in range(len(toks[node]) - len(ph) + 1))
               for ph in spec.get("pro_phrases", [])):
            continue
        out[node] = float(a["score"])
    return out


def gen_corpus(rng: random.Random,
               vocab: list[str] = VOCAB) -> dict[str, str]:
    corpus = {}
    for i in range(rng.randint(6, 22)):
        n_tok = rng.randint(2, 18)
        corpus[f"urn:doc{i}"] = " ".join(rng.choices(vocab, k=n_tok))
    return corpus


def _mutate(rng: random.Random, word: str, edits: int) -> str:
    """Apply up to ``edits`` random single-character edits (substitute /
    insert / delete / adjacent swap) — a fuzzy query term near a real
    vocabulary word."""
    abc = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(edits):
        if len(word) < 2:
            word += rng.choice(abc)
            continue
        op = rng.randint(0, 3)
        i = rng.randrange(len(word))
        if op == 0:
            word = word[:i] + rng.choice(abc) + word[i + 1:]
        elif op == 1:
            word = word[:i] + rng.choice(abc) + word[i:]
        elif op == 2:
            word = word[:i] + word[i + 1:]
        else:
            i = min(i, len(word) - 2)
            word = word[:i] + word[i + 1] + word[i] + word[i + 2:]
    return word or rng.choice(abc)


def gen_query(rng: random.Random, corpus: dict[str, str],
              vocab: list[str] = VOCAB) -> tuple[dict, str]:
    """Structured query spec + the query string built from it (so the
    parser is under test too). Terms are sampled without replacement
    across groups — repeating the same term across sign groups is Lucene
    multi-clause territory the subset doesn't pin. Phrases are drawn from
    the corpus under test so they actually hit; fuzzy terms are mutated
    vocabulary words; range bounds are vocabulary-adjacent strings (or
    ``*``); boosts attach to random positive components."""
    pool = rng.sample(vocab + ABSENT, len(vocab) + len(ABSENT))

    def draw(k):
        return [pool.pop() for _ in range(min(k, len(pool)))]

    spec = {"required": draw(rng.randint(0, 2)),
            "optional": draw(rng.randint(0, 2)),
            "prohibited": draw(rng.randint(0, 1)),
            "req_prefixes": [], "opt_prefixes": [], "pro_prefixes": [],
            "req_fuzzy": [], "opt_fuzzy": [], "pro_fuzzy": [],
            "req_ranges": [], "opt_ranges": [], "pro_ranges": [],
            "phrases": [], "pro_phrases": [], "boosts": {}}
    for key in ("req_prefixes", "opt_prefixes", "pro_prefixes"):
        if rng.random() < 0.4:
            spec[key].append(rng.choice(vocab)[:rng.randint(3, 4)])
    for key in ("req_fuzzy", "opt_fuzzy", "pro_fuzzy"):
        if rng.random() < 0.35:
            n = rng.randint(1, 2)
            t = _mutate(rng, rng.choice(vocab), rng.randint(0, n))
            if (t, n) not in spec[key]:
                spec[key].append((t, n))
    for key in ("req_ranges", "opt_ranges", "pro_ranges"):
        if rng.random() < 0.3:
            lo, hi = sorted(rng.sample(vocab, 2))
            if rng.random() < 0.15:
                lo = "*"
            elif rng.random() < 0.15:
                hi = "*"
            spec[key].append((lo, hi, rng.random() < 0.7,
                              rng.random() < 0.7))
    if rng.random() < 0.5:
        src = _tokens(rng.choice(list(corpus.values())))
        if len(src) >= 2:
            m = rng.randint(2, min(3, len(src)))
            at = rng.randint(0, len(src) - m)
            spec["phrases"].append(src[at:at + m])
            if rng.random() < 0.15:            # duplicate-phrase corner
                spec["phrases"].append(src[at:at + m])
    if rng.random() < 0.2:
        src = _tokens(rng.choice(list(corpus.values())))
        if len(src) >= 2:
            at = rng.randint(0, len(src) - 2)
            spec["pro_phrases"].append(src[at:at + 2])
    if not (spec["required"] or spec["optional"] or spec["phrases"]
            or spec["req_prefixes"] or spec["opt_prefixes"]
            or spec["req_fuzzy"] or spec["opt_fuzzy"]
            or spec["req_ranges"] or spec["opt_ranges"]):
        spec["optional"] = [rng.choice(vocab)]

    def boosted(piece, label):
        # at most one boost per label: two same-label boosts would pit
        # the parser's last-in-string-order against this function's
        # construction order
        if label not in spec["boosts"] and rng.random() < 0.25:
            b = rng.choice(["2", "3", "0.5", "1.5"])
            spec["boosts"][label] = float(b)
            return piece + "^" + b
        return piece

    def rng_piece(r):
        lo, hi, ilo, ihi = r
        return (("[" if ilo else "{") + lo + " TO " + hi
                + ("]" if ihi else "}"))

    pieces = ([boosted('"%s"' % " ".join(p), '"%s"' % " ".join(p))
               for p in spec["phrases"]]
              + ['-"%s"' % " ".join(p) for p in spec["pro_phrases"]]
              + [boosted("+" + t, t) for t in spec["required"]]
              + ["-" + t for t in spec["prohibited"]]
              + [boosted(t, t) for t in spec["optional"]]
              + [boosted("+" + p + "*", p + "*")
                 for p in spec["req_prefixes"]]
              + ["-" + p + "*" for p in spec["pro_prefixes"]]
              + [boosted(p + "*", p + "*") for p in spec["opt_prefixes"]]
              + [boosted("+%s~%d" % tn, "%s~%d" % tn)
                 for tn in spec["req_fuzzy"]]
              + ["-%s~%d" % tn for tn in spec["pro_fuzzy"]]
              # exercise the ~ (default edits) spelling when n == 2
              + [boosted("%s~%s" % (t, "" if n == 2 and rng.random() < 0.5
                                    else n), "%s~%d" % (t, n))
                 for t, n in spec["opt_fuzzy"]]
              + [boosted("+" + rng_piece(r), rng_piece(r))
                 for r in spec["req_ranges"]]
              + ["-" + rng_piece(r) for r in spec["pro_ranges"]]
              + [boosted(rng_piece(r), rng_piece(r))
                 for r in spec["opt_ranges"]])
    rng.shuffle(pieces)
    if rng.random() < 0.3:
        # AND retargets plain terms/prefixes/fuzzy/ranges to required
        pieces.insert(rng.randint(0, len(pieces)), "AND")
        spec["required"] += spec["optional"]
        spec["req_prefixes"] += spec["opt_prefixes"]
        spec["req_fuzzy"] += spec["opt_fuzzy"]
        spec["req_ranges"] += spec["opt_ranges"]
        spec["optional"], spec["opt_prefixes"] = [], []
        spec["opt_fuzzy"], spec["opt_ranges"] = [], []
    elif rng.random() < 0.2:
        pieces.insert(rng.randint(0, len(pieces)), "OR")   # parser no-op
    return spec, " ".join(pieces)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fts_differential(spark, seed):
    from graphdb_free_mocha_sa_spark.operators.fts import (fts_match,
                                                           index_from_docs)
    rng = random.Random(seed)
    n_queries, n_corpora = 30, 3
    for c in range(n_corpora):
        corpus = gen_corpus(rng)
        idx = index_from_docs(spark, spark.createDataFrame(
            list(corpus.items()), "node string, text string"))
        for q in range(n_queries // n_corpora):
            spec, qstr = gen_query(rng, corpus)
            expect = ref_match(corpus, spec)
            got = {r["node"]: r["score"]
                   for r in fts_match(spark, idx, qstr).collect()}
            assert set(got) == set(expect), \
                f"seed={seed} c={c} q={q} query={qstr!r}: " \
                f"spark-only={set(got) - set(expect)} " \
                f"ref-only={set(expect) - set(got)}"
            for node in expect:
                assert abs(got[node] - expect[node]) < 1e-5, \
                    f"seed={seed} query={qstr!r} node={node}: " \
                    f"{got[node]} != {expect[node]}"


def test_fts_rebuild_reflects_new_docs(spark):
    """Index-rebuild staleness: a NEW index over an extended corpus must
    match the reference over the extended corpus (and nothing from the
    old snapshot leaks in)."""
    from graphdb_free_mocha_sa_spark.operators.fts import (fts_match,
                                                           index_from_docs)
    rng = random.Random(7)
    corpus = gen_corpus(rng)
    spec, qstr = gen_query(rng, corpus)
    corpus2 = dict(corpus)
    for i in range(5):
        corpus2[f"urn:new{i}"] = " ".join(rng.choices(VOCAB, k=6))
    idx2 = index_from_docs(spark, spark.createDataFrame(
        list(corpus2.items()), "node string, text string"))
    expect = ref_match(corpus2, spec)
    got = {r["node"]: r["score"]
           for r in fts_match(spark, idx2, qstr).collect()}
    assert set(got) == set(expect)


def test_fts_differential_through_engine_surface(spark):
    """One seed driven through the ENGINE's luc: magic-predicate surface
    (INSERT DATA corpus -> luc:createIndex -> BGP match + luc:score), so
    the translator integration — not just the kernel — is differentially
    checked against the same pure-Python oracle. Doc texts are stored as
    <urn:text> literals; build_fts_index concatenates each node's
    literal molecule, which for one literal per node equals the kernel
    corpus."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    rng = random.Random(101)
    corpus = gen_corpus(rng)
    eng = Engine(spark, QuadStore(spark))
    triples = " ".join(
        f'<{n}> <urn:text> "{t}" .' for n, t in corpus.items())
    eng.update("INSERT DATA { " + triples + " }")
    LUC = "PREFIX luc: <http://www.ontotext.com/owlim/lucene#>\n"
    eng.update(LUC + 'INSERT DATA { luc:fz luc:createIndex "true" }')
    for q in range(8):
        spec, qstr = gen_query(rng, corpus)
        expect = ref_match(corpus, spec)
        # generated queries contain no single quotes, so a single-quoted
        # SPARQL literal carries embedded phrase double-quotes verbatim
        rows = eng.query(LUC + f"""SELECT ?s ?sc WHERE {{
            ?s luc:fz '{qstr}' . ?s luc:score ?sc }}""") \
            .finalize({"s": "str", "sc": "num"}).collect()
        got = {r["s"]: r["sc"] for r in rows}
        assert set(got) == set(expect), \
            f"engine-surface q={q} query={qstr!r}: " \
            f"spark-only={set(got) - set(expect)} " \
            f"ref-only={set(expect) - set(got)}"
        for node in expect:
            assert abs(got[node] - expect[node]) < 1e-5, \
                f"q={q} {node}: {got[node]} != {expect[node]}"


# ------------------------------------------------- EnglishAnalyzer phase

#: inflection families (several raw forms per stem) + Lucene stop words,
#: so stemming and stop-removal are both load-bearing in every query
STEM_VOCAB = ["cooking", "cooked", "cooks", "cook", "sparkling",
              "sparkled", "relational", "relations", "engines", "engine",
              "indexing", "indexed", "queries", "query", "quickly",
              "quick", "motoring", "motor", "agreed", "hopeful",
              "the", "and", "of", "was", "this", "their"]


def _analyze_spec_for_ref(spec: dict) -> dict:
    """The documented EnglishAnalyzer query transformation, applied to the
    STRUCTURED spec (the engine applies it to the parsed query): term
    groups stop-filter + stem; phrases stop-filter + stem + re-dedupe;
    prefixes/fuzzy/ranges pass through unanalyzed (Lucene MultiTermQuery
    semantics); plain-term and phrase boost labels follow their component
    through stemming, a boost on a stop word drops with it."""
    import re as _re

    from graphdb_free_mocha_sa_spark.operators.porter import (EN_STOPWORDS,
                                                              porter_stem)

    def terms(ts):
        return [porter_stem(t) for t in ts if t not in EN_STOPWORDS]

    out = dict(spec)
    for g in ("required", "optional", "prohibited"):
        out[g] = terms(spec[g])
    for g in ("phrases", "pro_phrases"):
        out[g] = []
        for p in (terms(ph) for ph in spec.get(g, [])):
            if p and p not in out[g]:
                out[g].append(p)
    boosts = {}
    for label, bv in spec.get("boosts", {}).items():
        if label.startswith('"'):
            toks = terms(label.strip('"').split())
            if toks:
                boosts['"' + " ".join(toks) + '"'] = bv
        elif _re.fullmatch(r"[a-z0-9]+", label):
            if label not in EN_STOPWORDS:
                boosts[porter_stem(label)] = bv
        else:
            boosts[label] = bv
    out["boosts"] = boosts
    return out


@pytest.mark.parametrize("seed", [5, 19])
def test_fts_differential_english_analyzer(spark, seed):
    """r11 stemmed phase: the corpus is indexed with analyzer=english and
    the pure-Python oracle runs over the ANALYZED corpus with the
    ANALYZED spec — set-exact matches, scores to 1e-5, including queries
    whose positive components all dissolve into stop words (both sides
    must then report matches-nothing)."""
    from graphdb_free_mocha_sa_spark.operators.fts import (FtsError,
                                                           fts_match,
                                                           index_from_docs)
    from graphdb_free_mocha_sa_spark.operators.porter import english_analyze
    rng = random.Random(seed)
    for c in range(2):
        corpus = gen_corpus(rng, STEM_VOCAB)
        idx = index_from_docs(
            spark,
            spark.createDataFrame(list(corpus.items()),
                                  "node string, text string"),
            analyzer="english")
        analyzed = {n: " ".join(english_analyze(_tokens(t)))
                    for n, t in corpus.items()}
        for q in range(10):
            spec, qstr = gen_query(rng, corpus, STEM_VOCAB)
            tspec = _analyze_spec_for_ref(spec)
            if not (tspec["required"] or tspec["optional"]
                    or tspec["phrases"] or tspec["req_prefixes"]
                    or tspec["opt_prefixes"] or tspec["req_fuzzy"]
                    or tspec["opt_fuzzy"] or tspec["req_ranges"]
                    or tspec["opt_ranges"]):
                with pytest.raises(FtsError, match="matches nothing"):
                    fts_match(spark, idx, qstr).collect()
                continue
            expect = ref_match(analyzed, tspec)
            got = {r["node"]: r["score"]
                   for r in fts_match(spark, idx, qstr).collect()}
            assert set(got) == set(expect), \
                f"seed={seed} c={c} q={q} query={qstr!r}: " \
                f"spark-only={set(got) - set(expect)} " \
                f"ref-only={set(expect) - set(got)}"
            for node in expect:
                assert abs(got[node] - expect[node]) < 1e-5, \
                    f"seed={seed} query={qstr!r} node={node}: " \
                    f"{got[node]} != {expect[node]}"
