"""Regenerate CONFORMANCE.md from the hand-transcribed W3C corpus.

Usage: python scripts/conformance_report.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import SparkSession

    from tests.test_w3c_conformance import KNOWN_DEVIATIONS
    from tests.w3c.harness import all_families, run_case

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("conformance").getOrCreate())

    fams = all_families()
    lines = [
        "# CONFORMANCE — hand-transcribed W3C SPARQL 1.1 corpus",
        "",
        "The container has no network access, so the public `w3c/rdf-tests`",
        "suite cannot be fetched. The corpus under `tests/w3c/cases_*.py` is",
        "hand-transcribed from two author-independent public sources instead:",
        "normative examples in the SPARQL 1.1 Query Recommendation (labeled",
        "`spec §N.N`, reproduced exactly — data, query, and result tables),",
        "and tests of the rdf-tests sparql11 suite reproduced from memory",
        "(labeled `rdf-tests <family>/<name> (transcribed)` — the",
        "semantics-defining shape, not byte-identical files). Each case",
        "carries its provenance label; `tests/test_w3c_conformance.py` is the",
        "pytest gate over the same corpus (deviations are strict xfails).",
        "",
        "| family | pass | fail | deviations |",
        "|---|---|---|---|",
    ]
    details = []
    total_pass = total_fail = 0
    with tempfile.TemporaryDirectory() as td:
        for fam in sorted(fams):
            p = f = 0
            for i, case in enumerate(fams[fam]):
                sub = Path(td) / fam / str(i)
                sub.mkdir(parents=True)
                ok, detail = run_case(spark, case, sub)
                dev = (fam, case["name"]) in KNOWN_DEVIATIONS
                if ok:
                    p += 1
                else:
                    f += 1
                    reason = KNOWN_DEVIATIONS.get(
                        (fam, case["name"]), detail[:200])
                    details.append(
                        f"- `{fam}:{case['name']}` [{case['source']}]"
                        f"{' (known deviation)' if dev else ''} — {reason}")
            devn = sum(1 for (ff, _) in KNOWN_DEVIATIONS if ff == fam)
            lines.append(f"| {fam} | {p} | {f} | {devn} |")
            total_pass += p
            total_fail += f
    lines.append(f"| **total** | **{total_pass}** | **{total_fail}** | "
                 f"**{len(KNOWN_DEVIATIONS)}** |")
    if details:
        lines += ["", "## Failures / deviations", ""] + details
    lines.append("")
    Path(__file__).resolve().parent.parent.joinpath(
        "CONFORMANCE.md").write_text("\n".join(lines))
    print(f"pass={total_pass} fail={total_fail}")


if __name__ == "__main__":
    main()
