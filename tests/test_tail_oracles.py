"""Continuous verification for the gate queries PAST the external
driver's 50-entry evaluation window (ADVICE r3): the driver only
hash-checks the first 50 entries of ``queries()``, so every query after
the boundary is re-verified here against its DuckDB oracle at sf0.001 on
every pytest run — no query silently rots just because it fell outside
the official window.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
WINDOW = 50


def test_tail_queries_match_oracles(spark):
    from tools.check_oracles import run_checks

    names = list(entrymod.queries())
    tail = set(names[WINDOW:])
    assert tail, "no tail queries — window covers everything"
    failures = run_checks(SF_DIR, only=tail, spark=spark)
    assert failures == []
