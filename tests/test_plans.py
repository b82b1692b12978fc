"""Physical-plan shape guards: the properties that keep the engine fast at
100 TB must hold in the optimized plan, not just in intent (SURVEY §4).

Checked via explain('formatted') text — brittle-ish but catches regressions
like a lost column-pruning or an accidental shuffle in the scale path.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def seqs(spark, sequences_path):
    return spark.read.parquet(sequences_path)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def _n_exchanges(plan: str) -> int:
    # count detail-section headers only ("(5) Exchange"), not tree echoes
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


def test_rollup_scale_path_has_no_exchange(spark, seqs):
    from tsrollup.rollup import rollup_sequences

    plan = _plan(rollup_sequences(seqs))
    assert "Exchange" not in plan, plan  # zero shuffle on the scale path
    assert "MapInPandas" in plan


def test_rollup_scan_prunes_columns(spark, seqs):
    from tsrollup.rollup import rollup_sequences

    plan = _plan(rollup_sequences(seqs.drop("gap_mask")))
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "tokens" in scan and "doc_id" in scan and "source" in scan
    assert "n_tok" not in scan  # unused column never leaves the parquet scan


def test_tier_reagg_is_single_shuffle_partial_agg(spark, seqs):
    from tsrollup.rollup import reaggregate_tier, rollup_sequences

    base = rollup_sequences(seqs, tiers={"1m": 1})
    plan = _plan(reaggregate_tier(base, "1h", 60))
    assert _n_exchanges(plan) == 1, plan  # one shuffle, on the group keys
    # partial aggregation before the exchange (map-side combine)
    pre, post = plan.split("Exchange", 1)
    assert "HashAggregate" in pre or "ObjectHashAggregate" in pre, plan


def test_pricing_summary_pushes_partial_agg(spark):
    import __spark_entry__ as entrymod

    df = entrymod.q_pricing_summary(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert _n_exchanges(plan) == 1
    assert "HashAggregate" in plan.split("Exchange", 1)[0]


def test_revenue_join_broadcasts_dims(spark):
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.q_revenue_by_nation(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(docs.filter("doc_id < 200").select("doc_id"))
    assert "PushedFilters: [" in plan
    assert "LessThan" in plan or "lt(" in plan.lower()


def test_per_source_stats_is_two_phase(spark, seqs):
    from tsrollup.rollup import per_source_stats, rollup_sequences

    plan = _plan(per_source_stats(rollup_sequences(seqs, tiers={"1m": 1})))
    # exactly two shuffles: (source, tier, salt) then (source, tier) — the
    # salt phase is what spreads a Zipf-heavy source over many reducers
    assert _n_exchanges(plan) == 2, plan
    pre = plan.split("Exchange", 1)[0]
    assert "HashAggregate" in pre  # map-side combine before the salt shuffle
