"""Explicit skew handling (north rule: "explicit salting/AQE for
skewed codec partitions").

The clips table's ``codec`` key is pathologically skewed (≥80%
``pcm_s16le`` — FIXTURES.md F1); at 10^12 rows a plain
``groupBy(codec)`` puts ~80% of the table through one reducer. Two
mitigations, composable:

- AQE (enabled by ``build_session``): handles skewed JOIN splits
  automatically (``spark.sql.adaptive.skewJoin``).
- :func:`salted_agg` here: two-phase aggregation for skewed groupBy
  keys — phase 1 aggregates on (key, salt) so the hot key fans out
  across ``n_salts`` reducers with map-side partial aggregation, phase
  2 merges the per-salt partials. Algebraic aggregators only
  (sum/count/min/max/avg — avg decomposes into sum+count).

Note Spark's hash aggregate already does map-side partial aggregation
for these, which usually absorbs groupBy skew when the OUTPUT
cardinality is small; salting matters when per-key state is large
(collect_list-style) or with ``applyInPandas`` per-group UDAFs where no
partial aggregation exists. ``salted_apply_in_pandas`` covers that
case.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"

# phase-1 partial, phase-2 merge, finalizer
_ALGEBRAIC = {
    "sum": (F.sum, F.sum, None),
    "count": (lambda c: F.count(F.lit(1)), F.sum, None),
    "min": (F.min, F.min, None),
    "max": (F.max, F.max, None),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    fields: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted groupBy.

    ``fields`` maps output name → (source column, agg) with agg ∈
    {sum, count, min, max, avg}. Results are identical to a plain
    ``groupBy(keys).agg(...)``; the physical plan differs: the hot key
    is spread over ``n_salts`` phase-1 reducers.
    """
    p1_exprs: list[Column] = []
    p2_exprs: list[Column] = []
    finalize: list[Column] = [F.col(k) for k in keys]
    for out, (src, agg) in fields.items():
        if agg == "avg":
            p1_exprs += [F.sum(src).alias(f"__s_{out}"), F.count(src).alias(f"__c_{out}")]
            p2_exprs += [F.sum(f"__s_{out}").alias(f"__s_{out}"), F.sum(f"__c_{out}").alias(f"__c_{out}")]
            finalize.append((F.col(f"__s_{out}") / F.col(f"__c_{out}")).alias(out))
        elif agg in _ALGEBRAIC:
            partial, merge, _ = _ALGEBRAIC[agg]
            p1_exprs.append(partial(F.col(src)).alias(out))
            p2_exprs.append(merge(F.col(out)).alias(out))
            finalize.append(F.col(out))
        else:
            raise ValueError(f"salted_agg supports algebraic aggregators only, got {agg!r}")
    salted = df.withColumn(_SALT, (F.rand(seed=7) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, _SALT).agg(*p1_exprs)
    phase2 = phase1.groupBy(*keys).agg(*p2_exprs)
    return phase2.select(*finalize)


def salted_apply_in_pandas(
    df: DataFrame,
    keys: list[str],
    partial_fn: Callable,
    partial_schema: str,
    merge_fn: Callable,
    merge_schema: str,
    n_salts: int = 16,
) -> DataFrame:
    """Salted two-phase ``applyInPandas`` for custom UDAFs (where Spark
    has no map-side combine): ``partial_fn`` runs per (key, salt) group,
    ``merge_fn`` combines the partials per key."""
    salted = df.withColumn(_SALT, (F.rand(seed=7) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, _SALT).applyInPandas(partial_fn, schema=partial_schema)
    return phase1.groupBy(*keys).applyInPandas(merge_fn, schema=merge_schema)


def explain_shuffle_keys(df: DataFrame) -> str:
    """Debug helper: the physical plan's exchange lines (for asserting a
    salt actually changed the partitioning)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "\n".join(line for line in plan.splitlines() if "Exchange" in line)
