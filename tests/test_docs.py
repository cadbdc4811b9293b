"""Docs-can't-drift gates (r10, VERDICT r9 #4): COVERAGE.md's state
block is generated from the registry by tools/coverage_state.py; this
test fails whenever the registry changes without re-emitting it."""

from __future__ import annotations

import os
import re


def test_coverage_state_block_current():
    from tools.coverage_state import BEGIN, END, REPO, render_block

    with open(os.path.join(REPO, "COVERAGE.md")) as fh:
        doc = fh.read()
    m = re.search(re.escape(BEGIN) + r".*?" + re.escape(END), doc, re.DOTALL)
    assert m, "COVERAGE.md lost its generated STATE block markers"
    assert m.group(0) == render_block(), (
        "COVERAGE.md state block is stale — run `python tools/coverage_state.py`"
    )


def test_registry_count_matches_doc():
    """The headline claim in the generated block — total query count and
    zero-rows-only — re-derived here so a registry regression (a query
    losing its oracle) is caught even if someone regenerates the doc."""
    from data_warehouse_data_mining_spark.registry import all_queries

    qs = all_queries()
    missing_oracle = sorted(n for n, q in qs.items() if q.oracle is None)
    assert not missing_oracle, (
        f"queries without oracles (every claim needs the hash gate): "
        f"{missing_oracle}"
    )
    assert len(qs) >= 377, f"registry shrank: {len(qs)}"
