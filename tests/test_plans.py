"""Plan-shape audits for the sampling layer: the scale claims in
PERFORMANCE.md (map-side-only sampling, single-shuffle sharding) asserted
against the actual physical plans, so a refactor that silently adds an
exchange fails here, not at 100 TB."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from stockmarket_bigdata_project_spark.llmdata.sampling import (
    hash_sample_docs,
    hash_split_docs,
    token_budget_shards,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_hash_sampling_is_map_side_only(spark, sf_dir):
    for fn in (hash_sample_docs, hash_split_docs):
        plan = _plan(fn(spark, sf_dir))
        assert "Exchange" not in plan, plan  # pure scan→filter/project


def test_shard_packing_single_shuffle(spark, sf_dir):
    plan = _plan(token_budget_shards(spark, sf_dir))
    # one hash-partitioning exchange (by source) for the window — and no
    # single-partition global sort, which would serialize the corpus
    assert plan.count("Exchange") == 2, plan  # tree line + its detail block
    assert "hashpartitioning(source" in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" not in plan, plan
