"""Repo-wide broadcast-budget audit (r9 verdict task 2, exploration tool).

Walks every registered query's STATIC physical plan under
autoBroadcastJoinThreshold=-1 + AQE off — in that regime every
BroadcastExchange is hint-forced — extracts each broadcast subtree from the
simple-mode explain text, and classifies its payload against the structural
boundedness rules shared with tests/test_broadcast_budget.py. Prints every
query with an UNCLASSIFIED broadcast so the whitelist can be curated from
evidence, not guesses.

Usage: python tools_broadcast_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stockmarket_bigdata_project_spark import registry
from stockmarket_bigdata_project_spark.session import get_spark
from tests.broadcast_budget import classify_plan


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(registry.all_queries())

    spark = get_spark(app_name="bcast-audit", shuffle_partitions=8)
    Q = registry.all_queries()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    n_bad = 0
    for name in names:
        try:
            df = Q[name](spark, sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain()
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}")
            n_bad += 1
            continue
        verdicts = classify_plan(name, plan)
        bad = [(s, v) for (s, v) in verdicts if v is None]
        tags = sorted({v for (_, v) in verdicts if v is not None})
        print(f"{'BAD ' if bad else 'ok  '}{name}: {len(verdicts)} bcast {tags}")
        if bad:
            n_bad += 1
            for s, _ in bad:
                print("  ---- unclassified subtree ----")
                for ln in s.split("\n")[:12]:
                    print("  " + ln[:150])
    print("TOTAL unclassified-query count:", n_bad)


if __name__ == "__main__":
    main()
