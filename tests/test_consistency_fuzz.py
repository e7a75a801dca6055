"""B42 consistency-checking differential fuzzer (r10, VERDICT r9 item 5).

Random TBoxes (subClassOf chains, disjointWith incl. self-disjoint,
complementOf) + random ABoxes (types, sameAs chains, differentFrom incl.
reflexive, owl:AllDifferent lists incl. duplicate members) are checked
twice:

* by the engine — ``materialize_inference()`` then
  ``consistency_violations`` over the closure, and
* by a naive pure-Python checker in this file that closes subClassOf /
  sameAs itself and applies the pD* inconsistency conditions directly.

Batching: each seed's 30 ontologies are IRI-namespaced per case and
loaded into ONE store; one closure + one check covers all 30, and every
violation row is attributed back to its case via the namespace prefix of
its ``x`` term. This keeps per-case differential signal (compared as the
SET OF RULES firing per case — which representative pair a rule reports
is implementation-defined, the rule set is not) while also proving the
checker produces no cross-ontology false positives. A second phase
replays random fact-update sequences through a
``check_inconsistencies=True`` engine and asserts the commit gate
matches the oracle AND that an aborted update leaves the (base, closure)
pair byte-identical to the pre-update snapshot.

Design review of this fuzzer already found two defects before its first
run (pinned in test_consistency.py): AllDifferent pairs formed by member
value dropped duplicate members (missing the a != a violation), and the
class-clash normalization dropped self-disjoint classes.
"""

from __future__ import annotations

import random
import re
from collections import defaultdict

import pytest

OWL = "http://www.w3.org/2002/07/owl#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDFT = RDF + "type"


def classes(ns: str) -> list[str]:
    return [f"urn:{ns}:C{i}" for i in range(5)]


def indivs(ns: str) -> list[str]:
    return [f"urn:{ns}:i{i}" for i in range(8)]


# ------------------------------------------------------------- the oracle

def oracle_rules(tbox: dict, facts: dict) -> set[str]:
    """Naive checker: which pD* inconsistency rules fire on the closed
    graph. tbox = {"sub": [(C, D)], "dw": [(C, D)], "comp": [(C, D)]};
    facts = {"type": [(i, C)], "same": [(a, b)], "dif": [(a, b)],
    "alldiff": [[members...]]}."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in facts["same"]:
        union(a, b)

    # subClassOf transitive closure
    supers: dict[str, set[str]] = defaultdict(set)
    for c, d in tbox["sub"]:
        supers[c].add(d)
    changed = True
    while changed:
        changed = False
        for c in list(supers):
            new = set()
            for d in supers[c]:
                new |= supers.get(d, set())
            if not new <= supers[c]:
                supers[c] |= new
                changed = True

    ctypes: dict[str, set[str]] = defaultdict(set)
    for i, c in facts["type"]:
        ctypes[find(i)] |= {c} | supers.get(c, set())

    fired: set[str] = set()
    for rule, prs in (("cax-dw", tbox["dw"]), ("owl-comp", tbox["comp"])):
        for c1, c2 in prs:
            for ts in ctypes.values():
                if c1 in ts and c2 in ts:     # c1 == c2 needs just one
                    fired.add(rule)
    difpairs = list(facts["dif"])
    for members in facts["alldiff"]:
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                difpairs.append((members[i], members[j]))
    if any(find(a) == find(b) for a, b in difpairs):
        fired.add("owl-dif")
    if any(OWL + "Nothing" in ts for ts in ctypes.values()):
        fired.add("owl-nothing")
    return fired


# ---------------------------------------------------------- the generator

def gen_tbox(rng: random.Random, ns: str) -> dict:
    cl = classes(ns)
    sub = []
    for _ in range(rng.randint(0, 3)):
        i, j = sorted(rng.sample(range(len(cl)), 2))        # acyclic
        sub.append((cl[i], cl[j]))
    if rng.random() < 0.15:                  # subclass of Nothing
        sub.append((rng.choice(cl), OWL + "Nothing"))
    dw = []
    for _ in range(rng.randint(0, 2)):
        if rng.random() < 0.1:
            c = rng.choice(cl)
            dw.append((c, c))                # self-disjoint
        else:
            dw.append(tuple(rng.sample(cl, 2)))
    comp = [tuple(rng.sample(cl, 2))] if rng.random() < 0.4 else []
    return {"sub": sub, "dw": dw, "comp": comp}


def gen_facts(rng: random.Random, ns: str) -> dict:
    cl, iv = classes(ns), indivs(ns)
    facts = {"type": [], "same": [], "dif": [], "alldiff": []}
    for _ in range(rng.randint(3, 9)):
        facts["type"].append((rng.choice(iv), rng.choice(cl)))
    if rng.random() < 0.1:
        facts["type"].append((rng.choice(iv), OWL + "Nothing"))
    for _ in range(rng.randint(0, 3)):
        facts["same"].append(tuple(rng.sample(iv, 2)))
    for _ in range(rng.randint(0, 2)):
        if rng.random() < 0.1:
            a = rng.choice(iv)
            facts["dif"].append((a, a))      # reflexive differentFrom
        else:
            facts["dif"].append(tuple(rng.sample(iv, 2)))
    if rng.random() < 0.35:
        members = rng.choices(iv, k=rng.randint(2, 4)) \
            if rng.random() < 0.3 else rng.sample(iv, rng.randint(2, 4))
        facts["alldiff"].append(members)
    return facts


_LIST_SEQ = [0]


def to_sparql(tbox: dict, facts: dict,
              ns: str = "t") -> tuple[list[str], list[str]]:
    """TBox triples + fact triples as INSERT DATA bodies (TBox first)."""
    t = []
    for c, d in tbox["sub"]:
        t.append(f"<{c}> <{RDFS}subClassOf> <{d}> .")
    for c, d in tbox["dw"]:
        t.append(f"<{c}> <{OWL}disjointWith> <{d}> .")
    for c, d in tbox["comp"]:
        t.append(f"<{c}> <{OWL}complementOf> <{d}> .")
    f = []
    for i, c in facts["type"]:
        f.append(f"<{i}> <{RDFT}> <{c}> .")
    for a, b in facts["same"]:
        f.append(f"<{a}> <{OWL}sameAs> <{b}> .")
    for a, b in facts["dif"]:
        f.append(f"<{a}> <{OWL}differentFrom> <{b}> .")
    for members in facts["alldiff"]:
        _LIST_SEQ[0] += 1
        g = _LIST_SEQ[0]
        f.append(f"<urn:{ns}:ad{g}> <{RDFT}> <{OWL}AllDifferent> .")
        f.append(f"<urn:{ns}:ad{g}> <{OWL}distinctMembers> "
                 f"<urn:{ns}:cell{g}_0> .")
        for k, m in enumerate(members):
            nxt = (f"<urn:{ns}:cell{g}_{k + 1}>" if k + 1 < len(members)
                   else f"<{RDF}nil>")
            f.append(f"<urn:{ns}:cell{g}_{k}> <{RDF}first> <{m}> .")
            f.append(f"<urn:{ns}:cell{g}_{k}> <{RDF}rest> {nxt} .")
    return t, f


def _engine(spark, **kw):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    return Engine(spark, QuadStore(spark), **kw)


# -------------------------------------------------------------- the tests

@pytest.mark.parametrize("seed", [3, 17, 29])
def test_consistency_differential(spark, seed):
    rng = random.Random(seed)
    cases = []
    t_all, f_all = [], []
    for case in range(30):
        ns = f"s{case}x"
        tbox, facts = gen_tbox(rng, ns), gen_facts(rng, ns)
        t, f = to_sparql(tbox, facts, ns)
        cases.append((ns, tbox, facts))
        t_all += t
        f_all += f
    eng = _engine(spark)
    eng.update("INSERT DATA { " + " ".join(t_all + f_all) + " }")
    eng.store.materialize_inference()
    got: dict[str, set] = defaultdict(set)
    for r in eng.check_consistency().collect():
        m = re.match(r"urn:(s\d+x):", r["x"])
        assert m, f"seed={seed}: unattributable violation {tuple(r)}"
        got[m.group(1)].add(r["rule"])
    for ns, tbox, facts in cases:
        expect = oracle_rules(tbox, facts)
        assert got.get(ns, set()) == expect, \
            f"seed={seed} case={ns}: engine={sorted(got.get(ns, set()))} " \
            f"oracle={sorted(expect)}\nTBox={tbox}\nfacts={facts}"


@pytest.mark.parametrize("seed", [5, 19])
def test_checked_update_gate_matches_oracle_and_rolls_back(spark, seed):
    """Random update sequences through the commit gate: every update the
    oracle calls inconsistent must abort AND leave the (base, closure)
    snapshot pair byte-identical; every consistent one must commit."""
    from graphdb_free_mocha_sa_spark.engine import InconsistencyError
    rng = random.Random(seed)
    for case in range(4):
        ns = f"g{case}"
        tbox = gen_tbox(rng, ns)
        if not (tbox["dw"] or tbox["comp"]):
            tbox["dw"].append(tuple(rng.sample(classes(ns), 2)))
        t, _ = to_sparql(tbox, {"type": [], "same": [], "dif": [],
                                "alldiff": []}, ns)
        eng = _engine(spark, check_inconsistencies=True)
        eng.update("INSERT DATA { " + " ".join(t) + " }")
        eng.store.materialize_inference()

        committed = {"type": [], "same": [], "dif": [], "alldiff": []}
        for step in range(3):
            delta = gen_facts(rng, ns)
            _, f = to_sparql({"sub": [], "dw": [], "comp": []}, delta, ns)
            trial = {k: committed[k] + delta[k] for k in committed}
            expect_bad = bool(oracle_rules(tbox, trial))
            before = sorted(map(tuple, eng.store.df.collect()))
            before_inf = sorted(map(tuple,
                                    eng.store.df_with_inference().collect()))
            if expect_bad:
                with pytest.raises(InconsistencyError):
                    eng.update("INSERT DATA { " + " ".join(f) + " }")
                after = sorted(map(tuple, eng.store.df.collect()))
                after_inf = sorted(
                    map(tuple, eng.store.df_with_inference().collect()))
                assert after == before and after_inf == before_inf, \
                    f"seed={seed} case={case} step={step}: rollback " \
                    f"did not restore the exact pre-update snapshot"
            else:
                eng.update("INSERT DATA { " + " ".join(f) + " }")
                committed = trial


@pytest.mark.parametrize("seed", [7])
def test_gate_delta_path_matches_oracle(spark, seed):
    """Gate-phase variant WITHOUT materialized inference and WITHOUT
    subclass TBox: type/differentFrom-only deltas ride the r10 O(delta)
    gate path, sameAs/AllDifferent deltas fall back to the full check —
    mixed sequences, same oracle, same rollback byte-identity
    assertion."""
    from graphdb_free_mocha_sa_spark.engine import InconsistencyError
    rng = random.Random(seed)
    for case in range(4):
        ns = f"d{case}"
        tbox = {"sub": [],
                "dw": [tuple(rng.sample(classes(ns), 2))],
                "comp": [tuple(rng.sample(classes(ns), 2))]
                if rng.random() < 0.5 else []}
        t, _ = to_sparql(tbox, {"type": [], "same": [], "dif": [],
                                "alldiff": []}, ns)
        eng = _engine(spark, check_inconsistencies=True)
        eng.update("INSERT DATA { " + " ".join(t) + " }")

        committed = {"type": [], "same": [], "dif": [], "alldiff": []}
        for step in range(3):
            delta = gen_facts(rng, ns)
            _, f = to_sparql({"sub": [], "dw": [], "comp": []}, delta, ns)
            trial = {k: committed[k] + delta[k] for k in committed}
            expect_bad = bool(oracle_rules(tbox, trial))
            before = sorted(map(tuple, eng.store.df.collect()))
            if expect_bad:
                with pytest.raises(InconsistencyError):
                    eng.update("INSERT DATA { " + " ".join(f) + " }")
                after = sorted(map(tuple, eng.store.df.collect()))
                assert after == before, \
                    f"seed={seed} case={case} step={step}: rollback " \
                    f"did not restore the pre-update snapshot"
            else:
                eng.update("INSERT DATA { " + " ".join(f) + " }")
                committed = trial


@pytest.mark.parametrize("seed", [13])
def test_gate_with_unchecked_mutations_matches_oracle(spark, seed):
    """r11 epoch-invariant phase: random UNCHECKED writes (a gate-less
    UpdateExecutor on the same store) interleave with checked updates.
    The oracle sees EVERYTHING in the store; the gate must abort a
    checked update iff the post-state violates — which after an
    unchecked mutation requires the one-time full-check fallback (the
    pre-fix delta branch would miss violations not involving the
    delta). Rollbacks must restore the pre-update snapshot exactly;
    unchecked damage itself persists (it never went through the gate)."""
    from graphdb_free_mocha_sa_spark.engine import InconsistencyError
    from graphdb_free_mocha_sa_spark.update import UpdateExecutor
    rng = random.Random(seed)
    for case in range(4):
        ns = f"u{case}"
        tbox = {"sub": [],
                "dw": [tuple(rng.sample(classes(ns), 2))],
                "comp": [tuple(rng.sample(classes(ns), 2))]
                if rng.random() < 0.5 else []}
        t, _ = to_sparql(tbox, {"type": [], "same": [], "dif": [],
                                "alldiff": []}, ns)
        eng = _engine(spark, check_inconsistencies=True)
        raw = UpdateExecutor(eng.store)          # the unchecked back door
        eng.update("INSERT DATA { " + " ".join(t) + " }")

        state = {"type": [], "same": [], "dif": [], "alldiff": []}
        for step in range(4):
            if step and rng.random() < 0.6:
                side = gen_facts(rng, ns)
                _, sf = to_sparql({"sub": [], "dw": [], "comp": []},
                                  side, ns)
                raw.execute("INSERT DATA { " + " ".join(sf) + " }")
                state = {k: state[k] + side[k] for k in state}
            delta = gen_facts(rng, ns)
            _, f = to_sparql({"sub": [], "dw": [], "comp": []}, delta, ns)
            trial = {k: state[k] + delta[k] for k in state}
            expect_bad = bool(oracle_rules(tbox, trial))
            before = sorted(map(tuple, eng.store.df.collect()))
            if expect_bad:
                with pytest.raises(InconsistencyError):
                    eng.update("INSERT DATA { " + " ".join(f) + " }")
                after = sorted(map(tuple, eng.store.df.collect()))
                assert after == before, \
                    f"seed={seed} case={case} step={step}: rollback " \
                    f"did not restore the pre-update snapshot"
            else:
                eng.update("INSERT DATA { " + " ".join(f) + " }")
                state = trial
