"""Deterministic sampling + document packing for training-data
pipelines.

Both are designed for the 100 TB case and for EXACT cross-engine
verification: randomness comes from md5 over the row key (not
``rand()``), so the same row always makes the same decision on any
cluster size, re-run, or engine — reproducible data recipes, stable
A/B slices, and a DuckDB oracle that matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U32 = float(1 << 32)


def _hash_unit(key: Column, salt: str) -> Column:
    """Deterministic uniform in [0, 1): first 8 hex chars of
    md5(key ':' salt) as a 32-bit integer, scaled."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f":{salt}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_U32)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by a hash of
    ``key_col`` — no shuffle, no ``rand()``: the filter is a pure
    projection-level predicate (pushes past scans), the SAME rows
    survive on every run/engine, and disjoint salts give independent
    slices (train/val splits that never leak)."""
    return df.filter(_hash_unit(F.col(key_col), salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible analog of
    ``df.sampleBy``): e.g. keep 100% of 'en', 30% of 'de', drop the
    rest. The per-stratum rate is a small literal map — no join, no
    shuffle; strata absent from ``fractions`` get
    ``default_fraction``."""
    rate = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(frac))).otherwise(rate)
    return df.filter(_hash_unit(F.col(key_col), salt) < rate)


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    partitions: int | None = None,
) -> DataFrame:
    """Assign each document to a training SHARD by contiguous token
    budget: documents ordered by ``id_col`` fill shard 0 until its
    cumulative token count crosses ``budget``, then shard 1, ... —
    i.e. ``shard = floor(exclusive_running_total / budget)``.

    SCALE SHAPE — a global ``ORDER BY`` window with no partition key
    executes as ONE task in Spark; this instead runs the classic
    distributed prefix-sum: range-partition by id, per-partition
    running totals via a partition-local window, then one tiny
    driver-side pass over the per-partition totals (#partitions rows,
    not #rows) to compute each partition's global offset, folded back
    in as a literal map. The result is independent of the partition
    count; the DuckDB oracle is the plain single-window SQL.

    Returns (id, tokens, shard)."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.select(F.col(id_col).alias("id"), F.col(token_col).cast("bigint").alias("tokens"))
        .repartitionByRange(n, F.col("id"))
        .withColumn("__pid", F.spark_partition_id())
    )
    ranged = ranged.localCheckpoint(eager=True)  # pin partitioning: the
    # pid column must agree between the totals pass and the window pass
    totals = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid").agg(F.sum("tokens").alias("t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):  # repartitionByRange orders ranges by pid
        offsets[pid] = acc
        acc += totals[pid]
    if not offsets:  # empty input
        return ranged.select("id", "tokens", F.lit(None).cast("bigint").alias("shard"))
    offset_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy("id")
    running = F.sum("tokens").over(w)  # inclusive within the partition
    exclusive = offset_map[F.col("__pid")] + running - F.col("tokens")
    return ranged.select(
        "id",
        "tokens",
        F.floor(exclusive / F.lit(int(budget))).cast("bigint").alias("shard"),
    )
