"""30x constant-density scale probe (r7, VERDICT r6 item 6).

The 10x probe (scale_probe.py) synthesizes key-offset VERBATIM copies, which
multiplies duplicate *density* along with volume — so ext_dedup_minhash's
candidate-pair stage must grow superlinearly by construction and its ratio
conflates two effects. This probe holds density constant: every copy k
suffixes every word token with ``_k``, making texts cross-copy DISTINCT
(cross-copy Jaccard 0, within-copy near-dup structure preserved), then
measures the two ops the r6 verdict named superlinear:

- ext_dedup_minhash — at constant density the banding candidate set scales
  with volume, so the warm ratio should approach ~1x per 1x (work/core
  constant at fixed cores means ratio ~= copies; report ratio/copies).
- ext_lm_score — word-suffixing ALSO multiplies distinct unigram/bigram
  types by ``copies`` (every copy has its own vocabulary), the adversarial
  worst case for self-trained LM scoring: count tables grow linearly with
  volume instead of Heaps-law sublinearly. Compare with the 10x verbatim
  probe (vocabulary CONSTANT across copies) to separate the two regimes.
- ext_line_dedup / ext_quality_gopher ride along as linear references
  (suffixed lines are cross-copy distinct, so line-dedup density is
  constant too; gopher is map-only).

Results land in ``<cache_root>/scale_probe_density_results.json`` and are
summarized in BASELINE.md. Usage: python scripts/scale_probe_density.py
[sf0.1_dir] [copies]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = 30
OFF = 100_000_000

PROBES = ["ext_dedup_minhash", "ext_lm_score", "ext_line_dedup",
          "ext_quality_gopher"]


def synth_dir(sf_dir: str, copies: int) -> str:
    from graphdb_free_mocha_sa_spark import cache as C
    fp = C.fixture_fingerprint(sf_dir, ["documents"])
    return os.path.join(C.cache_root(), f"docs{copies}xdistinct-{fp}")


def generate(sf_dir: str, out_dir: str, copies: int) -> None:
    """copies key-offset DISTINCT-text copies of documents.parquet: copy k
    suffixes every word with _k (copy 0 keeps the original text), so
    duplicate density is constant across scales."""
    import duckdb
    os.makedirs(out_dir + ".tmp", exist_ok=True)
    src = os.path.join(sf_dir, "documents.parquet")
    con = duckdb.connect()
    con.sql(rf"""COPY (
        SELECT doc_id + k * {OFF} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE regexp_replace(text, '(\w+)',
                                        '\1_' || k::VARCHAR, 'g')
               END AS text,
               lang, source, n_chars
        FROM read_parquet('{src}')
        CROSS JOIN (SELECT unnest(range({copies})) AS k) t
        ) TO '{out_dir}.tmp/documents.parquet' (FORMAT PARQUET)""")
    os.rename(out_dir + ".tmp", out_dir)


def run_probes(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    out: dict[str, float] = {}
    for name in PROBES:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    from graphdb_free_mocha_sa_spark import cache as C
    from graphdb_free_mocha_sa_spark.session import get_spark

    big = synth_dir(sf_dir, copies)
    if not os.path.isdir(big):
        t0 = time.time()
        generate(sf_dir, big, copies)
        print(f"generated {copies}x distinct-text documents at {big} "
              f"in {time.time()-t0:.1f}s", file=sys.stderr)

    spark = get_spark(app_name="scale-probe-density")
    spark.sparkContext.setLogLevel("ERROR")
    # cold + warm per scale, same protocol as scale_probe.py: warm ratios
    # carry the scaling claim, cold attributes cache/JIT asymmetry
    small_cold = run_probes(spark, sf_dir)
    small = run_probes(spark, sf_dir)
    large_cold = run_probes(spark, big)
    large = run_probes(spark, big)
    ratio = {k: round(large[k] / small[k], 2) for k in small if small[k] > 0}
    result = {
        "probe": f"{copies}x_constant_density",
        "copies": copies,
        "sf_small": sf_dir,
        "sf_large": big,
        "small_cold": small_cold,
        "small": small,
        "large_cold": large_cold,
        "large": large,
        "ratio": ratio,
        "ratio_per_copy": {k: round(v / copies, 3) for k, v in ratio.items()},
        "measured_unix": int(time.time()),
    }
    path = os.path.join(C.cache_root(), "scale_probe_density_results.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
