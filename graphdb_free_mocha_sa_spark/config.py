"""Repository-config bootstrap (SURVEY A18; reference: the adapter ships a
GraphDB repository template, ``repo-config.ttl``, whose ``owlim:*`` sail
parameters fix the engine's behaviour — ruleset, sameAs handling, entity-id
width, literal index).

Parsed with the package's own Turtle parser (nested bnode property lists —
the config's natural shape) and mapped onto the Spark engine's equivalent
switches:

===========================  =============================================
owlim parameter              Spark-engine effect
===========================  =============================================
``ruleset``                  ``owl-horst*`` → materialize OWL-Horst closure
                             and query with inference; ``empty`` → off
``disable-sameAs``           ``"false"`` → sameAs expansion on read
``entity-id-size``           any value → BIGINT dictionary-encoded joins
                             (the engine's ids are 64-bit)
``enable-literal-index``     informational — literal shadow columns
                             (``o_num``/``o_ts``) are always stored
``query-timeout``            0 = none (matches the reference default)
``check-for-inconsistencies`` ``"true"`` → B42 commit-time consistency
                             gate (violating updates roll back); the
                             template ships "false"
``repositoryID``             surfaced in the parsed dict
===========================  =============================================
"""

from __future__ import annotations

from pyspark.sql import SparkSession

OWLIM_NS = "http://www.ontotext.com/trree/owlim#"
REP_NS = "http://www.openrdf.org/config/repository#"


def parse_repo_config(path: str) -> dict[str, str]:
    """Flatten a GraphDB repository Turtle template to {param: value} —
    ``owlim:*`` keys keep their local names; repositoryID rides along."""
    from graphdb_free_mocha_sa_spark.sources.turtle import parse_turtle
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    params: dict[str, str] = {}
    for _s, p, (lex, _dt, _lang) in parse_turtle(text):
        if p.startswith(OWLIM_NS):
            params[p[len(OWLIM_NS):]] = lex
        elif p == REP_NS + "repositoryID":
            params["repositoryID"] = lex
    return params


def adapter_params(environ: dict | None = None) -> dict:
    """Benchmark-harness parameter ingestion (B53; reference:
    AbstractSystemAdapter1.init reads the serialized system-parameter RDF
    model from ``SYSTEM_PARAMETERS_MODEL`` and falls back to an EMPTY model
    with a warning, :115-128; queue names are scoped by the session id).

    Spark-first analogue: the parameter model arrives as Turtle text in the
    same env var and is flattened to ``{local-name: value}``; malformed or
    missing input yields an empty dict, never an error — matching the
    reference's fallback behaviour.
    """
    import os
    env = dict(os.environ if environ is None else environ)
    out: dict = {"session_id": env.get("HOBBIT_SESSION_ID", "")}
    model_text = env.get("SYSTEM_PARAMETERS_MODEL", "")
    params: dict[str, str] = {}
    if model_text.strip():
        try:
            from graphdb_free_mocha_sa_spark.sources.turtle import parse_turtle
            for _s, p, (lex, _dt, _lang) in parse_turtle(model_text):
                local = p.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
                params[local] = lex
        except Exception:
            params = {}            # reference: warn + empty model
    out["parameters"] = params
    out["queues"] = {
        "data": f"hobbit.datagen-system.{out['session_id']}",
        "task": f"hobbit.taskgen-system.{out['session_id']}",
        "result": f"hobbit.system-evalstore.{out['session_id']}",
    }
    return out


def engine_from_config(spark: SparkSession, config_path: str, store=None):
    """Build an :class:`Engine` honouring a repository config template —
    the Spark analogue of the reference's createNewRepository
    (GraphDBSystemAdapter.java reads the same template at bootstrap)."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore

    params = parse_repo_config(config_path)
    ruleset = params.get("ruleset", "empty").lower()
    use_inference = ruleset not in ("", "empty", "none")
    use_sameas = params.get("disable-sameAs", "false").strip() == "false"
    check = params.get("check-for-inconsistencies",
                       "false").strip().lower() == "true"
    store = store or QuadStore(spark)
    eng = Engine(spark, store, use_inference=use_inference,
                 encoded=True, use_sameas=use_sameas,
                 check_inconsistencies=check)
    eng.config = params
    return eng
