"""Engine — the SPARQL front door (parity with the reference's task path).

``query`` dispatches on the parsed form (the reference dispatches updates vs
tuple queries textually at GraphDBSystemAdapter.java:223; we branch on the
AST — SURVEY A10), ``query_json`` reproduces the serialize-or-sentinel
behaviour of the SELECT executor (:246-258, A12/A13), ``update`` is the
prepareUpdate path (:228).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from graphdb_free_mocha_sa_spark.sparql import algebra as A
from graphdb_free_mocha_sa_spark.sparql.parser import parse_query
from graphdb_free_mocha_sa_spark.sparql.results import SENTINEL, ask_json, select_json
from graphdb_free_mocha_sa_spark.sparql.translator import Translator, finalize
from graphdb_free_mocha_sa_spark.store import QuadStore
from graphdb_free_mocha_sa_spark.update import UpdateExecutor


@dataclass
class SelectResult:
    df: DataFrame               # var-family layout
    variables: list[str]

    def finalize(self, spec: dict[str, str] | None = None) -> DataFrame:
        return finalize(self.df, spec or {v: "auto" for v in self.variables})


class Engine:
    def __init__(self, spark: SparkSession, store: QuadStore,
                 use_inference: bool = False):
        self.spark = spark
        self.store = store
        self.use_inference = use_inference
        self._updates = UpdateExecutor(store)

    def _quads(self) -> DataFrame:
        return self.store.df_with_inference() if self.use_inference else self.store.df

    def query(self, sparql: str):
        q = parse_query(sparql)
        tr = Translator(self.spark, self._quads(),
                        getattr(q, "dataset_default", None),
                        getattr(q, "dataset_named", None))
        if isinstance(q, A.SelectQuery):
            df = tr.translate_select(q)
            vs = [v for v in df.columns if "__" not in v]
            return SelectResult(df, vs)
        if isinstance(q, A.AskQuery):
            return tr.ask(q)
        if isinstance(q, A.ConstructQuery):
            return tr.construct(q)
        if isinstance(q, A.DescribeQuery):
            return self._describe(q, tr)
        raise TypeError(f"unsupported query form {q!r}")

    def _describe(self, q: A.DescribeQuery, tr: Translator) -> DataFrame:
        from pyspark.sql import functions as F
        quads = self._quads()
        if q.pattern is not None and any(isinstance(t, A.Var) for t in q.terms):
            bound = tr.translate(q.pattern)
            keys = None
            for t in q.terms:
                if isinstance(t, A.Var):
                    k = bound.select(F.col(t.name).alias("k")).dropDuplicates()
                    keys = k if keys is None else keys.unionByName(k).dropDuplicates()
            resources = keys
        else:
            rows = [(t.value,) for t in q.terms if isinstance(t, A.IRI)]
            resources = self.spark.createDataFrame(rows, "k string")
        out = quads.join(F.broadcast(resources),
                         (quads["s"] == F.col("k"))
                         | (quads["o_dt"].isNull() & (quads["o_lex"] == F.col("k"))))
        return out.drop("k").dropDuplicates(["s", "p", "o_lex", "o_dt", "o_lang"])

    def query_json(self, sparql: str) -> str:
        """Serialize-or-sentinel, mirroring GraphDBSystemAdapter.java:246-258."""
        try:
            res = self.query(sparql)
            if isinstance(res, bool):
                return ask_json(res)
            if isinstance(res, SelectResult):
                return select_json(res.df, res.variables)
            # CONSTRUCT/DESCRIBE: emit triples as a generic bindings table
            return select_json(res, None)
        except Exception:
            return SENTINEL

    def update(self, sparql: str) -> None:
        self._updates.execute(sparql)
