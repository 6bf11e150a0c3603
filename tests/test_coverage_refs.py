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


def test_rotation_covers_registry():
    """Driver-window churn insurance (VERDICT r10 item 8, broadened from
    llm-pipeline-tagged to ALL queries): every registered query must have
    a green driver CORRECTNESS row in some round (under its canonical name
    or a pNN_ rotation alias), be in the current round's ROTATED window, or
    be named in COVERAGE.md's rotation-ledger next-round plan — so the
    hard signal can never silently skip part of the inventory again."""
    import glob
    import json

    import __spark_entry__ as E

    verified = set()
    for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        for k, v in json.load(open(f)).items():
            if isinstance(v, dict) and v.get("rows_match") and v.get("schema_match"):
                verified.add(re.sub(r"^p\d{2}_", "", k))

    text = open(os.path.join(_REPO, "COVERAGE.md"), encoding="utf-8").read()
    m = re.search(r"## Driver-window rotation.*?(?=\n## )", text, re.S)
    assert m, "rotation ledger section missing from COVERAGE.md"
    ledger = m.group(0)

    registry = set(all_queries())
    windowed = set(E.ROTATED)
    uncovered = sorted(
        n for n in registry if n not in verified and n not in windowed and n not in ledger
    )
    assert not uncovered, (
        f"queries with no driver row, not in the current window, and absent "
        f"from the rotation plan: {uncovered}"
    )
