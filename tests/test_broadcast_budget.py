"""Repo-wide broadcast-budget lint (r9 verdict task 2).

Walks EVERY registered query's static physical plan under
autoBroadcastJoinThreshold=-1 + AQE disabled — the regime where every
BroadcastExchange is hint-forced — and asserts each broadcast input
subtree classifies as a bounded relation under tests/broadcast_budget.py's
structural rules (1-row/calendar/enum aggregates, limits, constant-size
dimension and corpus-independent index tables, id-prefix sets, the capped
hot set, one documented per-query exception — band_join_order_tiers'
literal tier table). The forced-hint-on-growing-relation bug class was
found four rounds running (r8: 2 sites, r9: 6 sites, r10 lint bring-up:
2 more — cohort_retention, large_volume_customers; r10 verdict: the ~21
SF-scaling dim-table hints r11 removed); this is the structural gate that
keeps it from recurring, the analog of test_oracle_portability for the
HUGEINT class.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from tests.broadcast_budget import classify_plan


def test_every_registered_query_broadcast_is_bounded(spark, sf_dir):
    from stockmarket_bigdata_project_spark import registry
    from stockmarket_bigdata_project_spark.llmdata.dedup import (
        clear_staged_memo,
    )

    # fresh plans: a staged relation cached under broadcast-enabled confs
    # would splice a frozen AQE final plan (with legitimate runtime
    # broadcasts) into the explain text and fail the lint spuriously
    clear_staged_memo()

    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    failures: list[str] = []
    try:
        for name, fn in registry.all_queries().items():
            try:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    fn(spark, sf_dir).explain()
                plan = buf.getvalue()
            except Exception as e:  # noqa: BLE001
                failures.append(f"{name}: plan construction failed: {e!r}")
                continue
            for subtree, verdict in classify_plan(name, plan):
                if verdict is None:
                    failures.append(
                        f"{name}: unclassified broadcast payload\n{subtree}"
                    )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        clear_staged_memo()  # relations staged under lint confs: rebuild
    assert not failures, "\n\n".join(failures[:10]) + (
        f"\n... {len(failures)} total" if len(failures) > 10 else ""
    )
