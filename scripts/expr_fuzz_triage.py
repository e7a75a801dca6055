"""Triage driver for tests/test_expr_fuzz.py: run the sweep, collect ALL
mismatches (instead of failing at the first), and print one line per
distinct failing expression shape. Dev tool, not part of the suite."""

from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

from tests import test_expr_fuzz as M  # noqa: E402


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [11, 22, 33]
    # get_spark: the engine's session (8g driver) — a bare 1g builder
    # session OOMs on the most adversarial nested-BIND plans
    from graphdb_free_mocha_sa_spark.session import get_spark
    spark = get_spark("expr-fuzz", master="local[8]",
                      shuffle_partitions=8)
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.model import local_quads_df
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH, QuadStore

    rows = [(DEFAULT_GRAPH, "urn:x:a", "urn:p", "urn:x:b",
             None, None, None, None)]
    eng = Engine(spark, QuadStore(spark, local_quads_df(spark, rows)),
                 encoded=False)
    fails = []
    for seed in seeds:
        rng = random.Random(seed)
        block, envs = M._values_block(rng)
        cases = [M.gen_expr(rng, rng.randint(1, 3)) for _ in range(96)]
        def run_chunk(chunk):
            binds = "\n".join(f"BIND({s} AS ?r{k})"
                              for k, (s, _) in enumerate(chunk))
            rs = " ".join(f"?r{k}" for k in range(len(chunk)))
            q = (f"PREFIX xsd: <{M.XSD}>\n"
                 f"SELECT ?i {rs} WHERE {{ VALUES (?i ?a ?b ?c) "
                 f"{{ {block} }} {binds} }}")
            try:
                collected = eng.query(q).df.collect()
            except Exception as e:  # noqa: BLE001
                if len(chunk) == 1:
                    fails.append(("QUERY-FAIL", chunk[0][0],
                                  repr(e)[:300]))
                    return
                for case in chunk:
                    run_chunk([case])
                return
            for row in collected:
                i = int(row["i__lex"])
                env = envs[i]
                for k, (s, f) in enumerate(chunk):
                    ref = f(env)
                    got = M._extract(row, f"r{k}")
                    try:
                        M.compare(got, ref, s)
                    except AssertionError:
                        fails.append(
                            (s, {v: env.get(v) for v in M.VARS},
                             f"engine={got} ref={ref}"))

        import gc
        for lo in range(0, len(cases), M.BATCH):
            run_chunk(cases[lo:lo + M.BATCH])
            gc.collect()   # drop py4j refs to the last query's plan trees
    seen = set()
    for s, env, msg in fails:
        key = s
        if key in seen:
            continue
        seen.add(key)
        print(f"EXPR: {s}\n  ENV: {env}\n  {msg}\n")
    print(f"total mismatch rows: {len(fails)}; distinct exprs: {len(seen)}")


if __name__ == "__main__":
    main()
