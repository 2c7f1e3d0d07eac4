"""The distributed two-phase prefix shape shared by every operator
that needs a GLOBAL order-dependent quantity (dense rank, running
offset, stream position) without a global sort:

1. range-partition the frame on the ordering key(s) — partitions then
   compose in global order, and ``spark_partition_id()`` is the
   partition's position in that order;
2. compute the quantity LOCALLY within each partition (row_number /
   running sum over a ``_pid``-partitioned window — parallel,
   partition-sized state);
3. aggregate ONE row per partition (per group), exclusive-prefix-sum
   those few rows, and broadcast-join the result back as the base
   offset: global = base + local.

The only non-parallel stage left is the prefix sum over #partitions
(x #groups) rows. Two invariants this module centralizes:

- the ranged frame MUST be persisted (``cache.track``) before its
  consumers branch: ``repartitionByRange`` samples boundaries, so
  evaluating it twice risks inconsistent ``_pid`` assignments between
  the local and base sides;
- the ungrouped prefix window needs a NON-FOLDABLE constant partition
  key (``substring(_pid, 1, 0)``) — a literal would be folded away by
  the optimizer and Spark rejects a parallel window with no partition
  spec (see windows.conv_offsets, where this shape first landed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ml4logs_spark import cache


def ranged(df: DataFrame, range_cols: list[str], n_parts: int) -> DataFrame:
    """Phase 0: range-partition on the global ordering key and stamp
    ``_pid``. Returns a TRACKED persisted frame (release via
    cache.release_all() / cache.scope()) — callers always branch it.

    The INPUT is tracked-persisted too: ``repartitionByRange`` samples
    its child in a separate pass to fit the range boundaries, so an
    unpersisted input evaluates twice per call (for the latency
    percentiles that was a full corpus window pass run once for the
    sample and once for the real partitioning — guide §1.2/§2.4).
    Every caller passes a slim projection (ordering keys + one value
    column), which is exactly the lightweight frame the guide's
    decide-with-small-rows pattern materializes."""
    df = cache.track(df)
    return cache.track(
        df.repartitionByRange(n_parts, *range_cols)
        .withColumn("_pid", F.spark_partition_id())
    )


def bases(
    ranged_df: DataFrame,
    agg: Column,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Phase 2: per-partition (per-group) totals of ``agg`` with an
    exclusive prefix sum over ``_pid`` — the base offset each partition
    adds to its local quantity. Output is (_pid, *group_cols, _base),
    #partitions x #groups rows, meant to ride back as a broadcast.

    With ``group_cols`` the prefix window partitions by the group (a
    window over #partitions rows PER GROUP); without, it runs on the
    deliberate single partition of #partitions rows."""
    counts = ranged_df.groupBy("_pid", *group_cols).agg(agg.alias("_n"))
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy("_pid")
    else:
        w = Window.partitionBy(
            F.substring(F.col("_pid").cast("string"), 1, 0)
        ).orderBy("_pid")
    w = w.rowsBetween(Window.unboundedPreceding, -1)
    return counts.withColumn(
        "_base", F.coalesce(F.sum("_n").over(w), F.lit(0))
    ).select("_pid", *group_cols, "_base")
