"""SPARQL 1.1 Update execution against a QuadStore (SURVEY B30-B36, A8).

Ground INSERT/DELETE DATA become micro-batch appends / anti-join deletes;
pattern updates (DELETE/INSERT WHERE) evaluate the WHERE clause through the
same translator as queries, instantiate the templates, and apply both sets in
one atomic snapshot swap (parity with the reference's transactional update
path, GraphDBSystemAdapter.java:227-229).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from graphdb_free_mocha_sa_spark.model import QUAD_COLS, local_quads_df
from graphdb_free_mocha_sa_spark.sparql import algebra as A
from graphdb_free_mocha_sa_spark.sparql.parser import parse_update
from graphdb_free_mocha_sa_spark.sparql.translator import (Translator,
                                                           term_parts_py,
                                                           _fam_tcol)
from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH, QuadStore
from graphdb_free_mocha_sa_spark.sparql.functions import TCol


def rewrite_insert_with(insert_query: str) -> str:
    """The reference's streaming-INSERT rewrite, reproduced behaviourally:
    ``INSERT ... WITH <g> ...`` → ``INSERT DATA { GRAPH <g> { ... } }`` so
    graphs auto-create on write (GraphDBSystemAdapter.java:192-195: strip
    leading INSERT, replace first WITH by "INSERT DATA { GRAPH", drop the
    13-char trailer, append " }")."""
    q = insert_query.replace("INSERT", "", 1).replace("WITH", "INSERT DATA { GRAPH", 1)
    return q[:-13] + " }"


def _ground_rows(data: A.QuadData, default_graph: str,
                 bnode_suffix: str | None = None) -> list[tuple]:
    """Quad-data rows; with ``bnode_suffix``, blank-node labels are
    renamed per OPERATION (SPARQL 1.1 Update §3.1.1: blank nodes in
    INSERT DATA are instantiated fresh — re-running the same request
    inserts NEW nodes, it never re-touches the previous ones; r9 w3c
    corpus find: the raw label collided across updates)."""
    def key(term):
        if bnode_suffix is not None and isinstance(term, A.BNode):
            return f"_:{term.label}__{bnode_suffix}"
        return term_parts_py(term)[0]

    rows = []
    for g, s, p, o in data.quads:
        skey = key(s)
        pkey = term_parts_py(p)[0]
        if bnode_suffix is not None and isinstance(o, A.BNode):
            o_lex, o_dt, o_lang, o_num, o_ts = key(o), None, None, None, None
        else:
            _, o_lex, o_dt, o_lang, o_num, o_ts = term_parts_py(o)
        rows.append((g or default_graph, skey, pkey, o_lex, o_dt, o_lang, o_num, o_ts))
    return rows


class UpdateExecutor:
    def __init__(self, store: QuadStore):
        self.store = store

    def execute(self, update_string: str) -> dict:
        """Execute the update; returns a gate summary (r10): which ground
        rows were inserted and whether every op was delta-analyzable —
        the engine's B42 commit gate uses it to pick the O(delta)
        consistency check over the full-store one (engine._gate_check).
        Callers that ignore the return value are unaffected."""
        # insert_only (r11 opt): True iff every op is ground INSERT DATA —
        # the engine's cached gate state (sameAs canon + disjoint pairs)
        # stays valid across such commits; any delete/clear/load could
        # remove a sameAs or disjointWith triple and must invalidate it.
        summary = {"delta_ok": True, "inserted_rows": [], "insert_only": True}
        ops = list(parse_update(update_string))  # syntax errors mutate nothing
        store = self.store
        # One request = one writer-gate span (reentrant — the engine's
        # checked-update path already holds it): ops from concurrent
        # requests never interleave, matching the reference's one-
        # transaction-per-request execution (GraphDBSystemAdapter
        # .java:227-229). FTS control state is staged per REQUEST (r11
        # advisor fix): a failing op rolls back earlier luc: mutations
        # from the same request — previously `luc:analyzer luc:setParam
        # ... . luc:idx luc:createIndex ...` in one INSERT DATA left the
        # param behind when createIndex raised, poisoning later builds.
        with store._writer_gate:
            snap = store.fts_state_snapshot()
            point = store.txn_rollback_point()
            try:
                for op in ops:
                    info = self._apply(op)
                    if info is None:
                        summary["delta_ok"] = False
                    elif info[0] == "insert":
                        summary["inserted_rows"].extend(info[1])
                    if not isinstance(op, A.InsertData):
                        summary["insert_only"] = False
            except Exception:
                # request-level atomicity (r11, SPARQL 1.1 Protocol: the
                # operations of one request are a single transaction —
                # the reference executes updates transactionally): data
                # applied by EARLIER ops of this failing request rolls
                # back with the FTS control state. The durable store's
                # rollback republishes its captured log pointer (one log
                # entry, no data rewrite) and the epoch-advance
                # invariant lives in txn_rollback; no-op when nothing
                # was applied.
                store.txn_rollback(point)
                if store.fts_state_changed(snap):
                    store.fts_state_restore(snap)
                raise
        return summary

    def _apply(self, op):
        spark = self.store.spark
        if isinstance(op, A.InsertData):
            import uuid
            rows = _ground_rows(op.data, DEFAULT_GRAPH,
                                bnode_suffix=uuid.uuid4().hex[:12])
            # luc: control triples (B43 FTS protocol — setParam/createIndex/
            # updateIndex) are CONSUMED, not stored: they configure/build the
            # index registry, mirroring the GraphDB Lucene magic predicates
            from graphdb_free_mocha_sa_spark.operators.fts import LUC_NS
            control = [r for r in rows if r[2].startswith(LUC_NS)]
            if control:
                rows = [r for r in rows if not r[2].startswith(LUC_NS)]
                for r in control:
                    self.store.fts_control(r[1], r[2], r[3])
                if not rows:
                    return ("insert", [])
            # LocalRelation leaf (model.local_quads_df): a pickled-RDD leaf
            # would launch Python workers on every later read job over the
            # store's union lineage (r7 served-path profiling)
            self.store.add_quads(local_quads_df(spark, rows))
            return ("insert", rows)
        elif isinstance(op, A.DeleteData):
            rows = _ground_rows(op.data, DEFAULT_GRAPH)
            self.store.delete_quads(local_quads_df(spark, rows))
            # deletes are gate-safe: violations are monotone in the triple
            # set, so removing triples can never create one
            return ("safe",)
        elif isinstance(op, A.Modify):
            self._modify(op)
            # a delete-only Modify is monotone-down like DeleteData; any
            # insert template needs the full check (instantiations are
            # data-dependent, not enumerable driver-side)
            return ("safe",) if not op.insert_template else None
        elif isinstance(op, A.ClearDrop):
            self.store.clear_graph(op.target)
            return ("safe",)
        elif isinstance(op, A.CreateGraph):
            # graphs auto-create (reference rewrite rationale, :192)
            return ("safe",)
        elif isinstance(op, A.LoadOp):
            from graphdb_free_mocha_sa_spark.sources.rdf import read_rdf_file
            try:
                quads = read_rdf_file(spark, op.source.replace("file://", ""),
                                      graph=op.graph or DEFAULT_GRAPH)
                # force the distributed read NOW: a parse error inside the
                # lazily-unioned store lineage would otherwise surface only
                # AFTER the update reported success, poisoning every later
                # query over the store (r7 advisor fix). The checkpoint also
                # pins the parsed quads so downstream queries never re-parse
                # the source file.
                quads = quads.localCheckpoint(eager=True)
                # reject reserved luc: predicates in loaded data (r10
                # advisor fix — same divergence story as templated inserts:
                # stored luc: triples would be unreachable behind the
                # magic-predicate surface). One bounded probe of the
                # already-checkpointed parse.
                from graphdb_free_mocha_sa_spark.operators.fts import (
                    LUC_NS, FtsError)
                if quads.filter(F.col("p").startswith(LUC_NS)).take(1):
                    raise FtsError(
                        f"LOAD source {op.source!r} contains reserved "
                        "luc:-namespace predicates; the FTS control "
                        "protocol is only valid via INSERT DATA")
                self.store.add_quads(quads)
            except Exception:
                if not op.silent:      # LOAD SILENT swallows failures (r6)
                    raise
            return None                # arbitrary loaded data: full check
        elif isinstance(op, A.CopyMoveAdd):
            self.store.copy_graph(op.op, op.src, op.dst)
            # gate-safe: COPY/MOVE/ADD only re-graph EXISTING (s, p, o)
            # content; the consistency conditions read the union of
            # graphs, which gains no new triple content
            return ("safe",)
        else:
            raise TypeError(f"unknown update op {op!r}")

    def _modify(self, op: A.Modify) -> None:
        using = getattr(op, "using", ()) or ()
        using_named = getattr(op, "using_named", ()) or ()
        tr = Translator(self.store.spark, self.store.df,
                        list(using) or None, list(using_named) or None,
                        fts_registry=getattr(self.store, "fts_indexes", None))
        tr.query_base = getattr(op, "base", None)
        where = op.where
        # USING overrides WITH for the WHERE pattern (SPARQL Update §3.1.3)
        if op.with_graph is not None and not (using or using_named):
            where = A.GraphPat(A.IRI(op.with_graph), where)
        bindings = tr.translate(where)

        def has_bnode(template) -> bool:
            return any(isinstance(t, A.BNode)
                       for _, tp in (template or ())
                       for t in (tp.s, tp.o))

        # SPARQL Update §3.1.3: blank nodes in an INSERT template are
        # instantiated FRESH per WHERE solution, coreferent across the
        # template triples of one solution (r6c probe fix: the label used
        # to insert as one shared constant bnode). One uuid() per solution
        # row, pinned by a lazy checkpoint so every template piece (and
        # the delete set) reads the SAME materialized salts.
        if has_bnode(op.insert_template):
            bindings = bindings.withColumn(
                "__bn_salt", F.expr("uuid()")).localCheckpoint(eager=False)

        def instantiate(template) -> Optional[DataFrame]:
            if not template:
                return None
            pieces = []
            for gspec, tp in template:
                cols = []
                if isinstance(gspec, A.Var):
                    # graph names are IRIs: an unbound or literal-bound
                    # graph var skips the quad (NULL → filter below)
                    gcol = F.when(F.col(gspec.name + "__dt").isNull(),
                                  F.col(gspec.name + "__lex"))
                else:
                    gcol = F.lit(gspec or op.with_graph or DEFAULT_GRAPH)
                cols.append(gcol.alias("g"))
                def fresh_bn(term) -> F.Column:
                    return F.concat(F.lit("_:" + term.label + "_"),
                                    F.md5(F.col("__bn_salt")))

                for term, pos in ((tp.s, "s"), (tp.p, "p")):
                    if isinstance(term, A.PLink):
                        term = A.IRI(term.iri)
                    if isinstance(term, A.Var):
                        # §3.1.3 (same rule as CONSTRUCT §16.2, r9 fuzzer
                        # find): a solution that would put a literal in
                        # subject/predicate position or a bnode in
                        # predicate position produces NO triple — NULL
                        # here feeds the isNotNull filter below
                        lex = F.col(term.name + "__lex")
                        dt = F.col(term.name + "__dt")
                        valid = dt.isNull() if pos == "s" \
                            else dt.isNull() & ~lex.startswith("_:")
                        cols.append(F.when(valid, lex).alias(pos))
                    elif isinstance(term, A.BNode) \
                            and "__bn_salt" in bindings.columns:
                        cols.append(fresh_bn(term).alias(pos))
                    else:
                        cols.append(F.lit(term_parts_py(term)[0]).alias(pos))
                o = tp.o
                if isinstance(o, A.Var):
                    fam = _fam_tcol(bindings, o.name)
                elif isinstance(o, A.BNode) \
                        and "__bn_salt" in bindings.columns:
                    bc = fresh_bn(o)
                    fam = TCol(lex=bc, key=bc)
                else:
                    fam = TCol.from_term(o)
                cols.extend([fam.lex.alias("o_lex"), fam.dt.alias("o_dt"),
                             fam.lang.alias("o_lang"), fam.num.alias("o_num"),
                             fam.ts.alias("o_ts")])
                pieces.append(bindings.select(*cols)
                              .where(F.col("g").isNotNull()
                                     & F.col("s").isNotNull()
                                     & F.col("p").isNotNull()
                                     & F.col("o_lex").isNotNull()))
            out = pieces[0]
            for piece in pieces[1:]:
                out = out.unionByName(piece)
            return out.dropDuplicates().select(*QUAD_COLS)

        delete_df = instantiate(op.delete_template)
        insert_df = instantiate(op.insert_template)
        # luc: control predicates are an INSERT DATA protocol, never data
        # (r10 advisor fix: a templated insert used to be able to STORE
        # luc:-namespace triples, which the BGP translator then hijacks as
        # magic predicates — stored data and the FTS surface diverged).
        # Constant predicates reject statically (free); a variable
        # predicate needs one bounded limit(1) probe of the instantiation.
        from graphdb_free_mocha_sa_spark.operators.fts import LUC_NS, FtsError
        for _, tp in (op.insert_template or ()):
            p = tp.p
            iri = getattr(p, "iri", None)
            if iri is not None and iri.startswith(LUC_NS):
                raise FtsError(
                    "luc: control predicates are only valid in INSERT DATA "
                    f"(the FTS magic-predicate protocol); got {iri!r} in an "
                    "INSERT ... WHERE template")
        if insert_df is not None and any(
                isinstance(tp.p, A.Var) for _, tp in op.insert_template):
            if insert_df.filter(F.col("p").startswith(LUC_NS)).take(1):
                raise FtsError(
                    "INSERT ... WHERE instantiated a luc:-namespace "
                    "predicate; luc: control triples are only valid in "
                    "INSERT DATA (the FTS magic-predicate protocol)")
        # atomic: compute both sets from the same snapshot, then swap once
        if delete_df is not None:
            self.store.delete_quads(delete_df)
        if insert_df is not None:
            self.store.add_quads(insert_df)
