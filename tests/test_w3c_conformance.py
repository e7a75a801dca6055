"""Conformance gate over the hand-transcribed W3C corpus (tests/w3c/).

Every case must pass unless listed in KNOWN_DEVIATIONS with a reason —
those are expected-failures (strict: fixing one flips the test red until
the entry is removed, keeping the scoreboard honest).

`scripts/conformance_report.py` runs the same corpus and regenerates
CONFORMANCE.md.
"""

from __future__ import annotations

import pytest

from tests.w3c.harness import all_families, run_case

#: (family, case-name) -> reason. Mirrored into CONFORMANCE.md.
KNOWN_DEVIATIONS: dict[tuple[str, str], str] = {
}

_PARAMS = [
    pytest.param(fam, case, id=f"{fam}:{case['name']}")
    for fam, cases in sorted(all_families().items())
    for case in cases
]


@pytest.mark.parametrize("fam,case", _PARAMS)
def test_w3c(fam, case, spark, tmp_path):
    ok, detail = run_case(spark, case, tmp_path)
    key = (fam, case["name"])
    if key in KNOWN_DEVIATIONS:
        if ok:
            pytest.fail(f"deviation {key} now passes — remove it from "
                        "KNOWN_DEVIATIONS")
        pytest.xfail(KNOWN_DEVIATIONS[key])
    assert ok, f"[{case['source']}] {detail}"
