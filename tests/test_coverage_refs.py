"""COVERAGE.md is the audit map from SURVEY §2 to the live query registry —
a row citing a query that no longer exists (e.g. after a driver-window
rotation renames qNN <-> rNN slots) silently breaks the judge's trail.
This check pins every qNN/rNN citation in the LIVE sections (everything
before the first historical "## Round-" changelog, whose names were
accurate at the time they were written) to a registered query.
"""

from __future__ import annotations

import os
import re

from fantasy_premier_league_spark.queries import all_queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_citations_resolve():
    text = open(os.path.join(_REPO, "COVERAGE.md"), encoding="utf-8").read()
    live = text.split("\n## Round-")[0]
    cited = set(re.findall(r"\b([qr]\d{2})\b", live))
    assert cited, "no citations found — parsing broke"
    prefixes = {name.split("_")[0] for name in all_queries()}
    missing = sorted(c for c in cited if c not in prefixes)
    assert not missing, (
        f"COVERAGE.md live sections cite queries not in the registry: {missing} "
        "(stale after a rotation? update the row to the current slot name)"
    )
