"""Enrich stage: broadcast hash joins against role/tool dimensions.

The reference's only join mechanism is an in-memory dict lookup
(/root/reference/src/ml4logs/features/parser/ibm_drain.py:49-53, 67);
its distributed equivalent is a broadcast hash join — the small side
ships to every executor, the fact table never shuffles.

``tool`` is nullable (non-tool turns); the join is LEFT so those rows
survive with null enrich payload, mirroring the reference's
``cluster_mapping.get`` returning None rather than dropping lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(turns: DataFrame, role_dim: DataFrame, tool_dim: DataFrame) -> DataFrame:
    """Attach role_group/route_weight and tool_family/is_sensitive."""
    return (
        turns.join(F.broadcast(role_dim), "role", "left")
        .join(F.broadcast(tool_dim), "tool", "left")
    )


def filter_known_convs(turns: DataFrame, labels: DataFrame) -> DataFrame:
    """Semi-join filter: keep turns of labeled conversations only.

    Analog of the reference dropping labels whose BlockId is absent from
    the data (/root/reference/src/ml4logs/data/hdfs.py:61-62), flipped to
    the fact side; ghost conv_ids in labels never materialize.
    """
    return turns.join(labels.select("conv_id"), "conv_id", "left_semi")
