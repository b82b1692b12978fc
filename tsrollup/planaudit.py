"""Shared physical-plan introspection: ONE copy of the formatted-explain
incantation and ONE exchange classification, consumed by both the PLANS.md
audit (tools/explain_audit.py) and the plan-shape tests (tests/test_plans.py,
tests/test_dedup.py).

Previously each consumer carried its own copy — and the two exchange
classifiers matched by opposite polarity (guard-by-name vs data-by-exclusion),
so a Spark-upgrade taxonomy change applied to one file but not the other would
make PLANS.md and the tests silently disagree about what counts as a shuffle
(round-5 review finding). Here the split is computed once and both numbers
come from the same partition of the same list.
"""

from __future__ import annotations

import re


def formatted_plan(df) -> str:
    """The ``explain('formatted')`` text via the same JVM entry point
    ``DataFrame.explain`` uses. ``PythonSQLUtils`` is a private PySpark API —
    when an upgrade moves it, this is the only line to update."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def count_op(plan: str, op: str) -> int:
    """Occurrences of a physical operator in the plan's detail sections
    ("(5) Exchange" lines — not tree echoes)."""
    return len(re.findall(rf"^\(\d+\) {op}", plan, re.M))


def split_exchanges(plan: str) -> tuple[int, int]:
    """``(data, guard)`` exchange counts from the detail sections.

    guard — the small-scan guard's widening repartitions ONLY
    (``io.scan_min_parallel``: fires when a fixture table arrives in fewer
    splits than cores, structurally absent at production split counts).
    The guard spreads round-robin or by hash on the table's unique key;
    either way the exchange carries the ``REPARTITION_BY_NUM`` origin tag
    (an explicit ``repartition(n, ...)``), which no planner-inserted
    shuffle carries — matched by that tag, never by exclusion.

    data — every other exchange: hash, range AND SinglePartition (a global
    agg/sort is a real data-dependent shuffle and must stay counted).
    """
    details = re.split(r"^\(\d+\) ", plan, flags=re.M)
    ex = [d for d in details if d.startswith("Exchange")]
    guard = sum(1 for d in ex
                if "RoundRobinPartitioning" in d or "REPARTITION_BY_NUM" in d)
    return len(ex) - guard, guard


def n_data_exchanges(plan: str) -> int:
    """Data-dependent exchanges (see ``split_exchanges``)."""
    return split_exchanges(plan)[0]
