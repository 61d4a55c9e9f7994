"""Shared lineage-truncation helper for iterative catalog queries.

Iterative DataFrame loops (BFS relaxation, value iteration, power
iteration) reference each round's result more than once, so leaving the
loop lazy embeds the upstream plan 2^rounds times — checkpointing per
round is mandatory (measured 361 s -> ~25 s for the sf0.1 BFS).

``localCheckpoint()`` is the right default on local[N] (executor ==
driver JVM) but pins block-manager storage on a real cluster: a lost
executor loses the checkpointed partitions and fails the whole job.
``iteration_checkpointer`` therefore consults the session conf
``spark_graft.checkpoint_dir`` — when set, rounds use reliable
``checkpoint()`` into that (HDFS/S3-able) directory instead, the same
switch ``operators.dedup.connected_components`` exposes as a parameter.

reference: the reference engine has no iterative relational operators;
this helper exists for the Spark-first loop queries (q397/q423/q430/q441).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

CHECKPOINT_DIR_CONF = "spark_graft.checkpoint_dir"


def iteration_checkpointer(
    spark: SparkSession,
) -> Callable[[DataFrame], DataFrame]:
    """Return the per-round lineage-truncation function for loop queries.

    Reliable ``checkpoint()`` into ``spark_graft.checkpoint_dir`` when the
    conf is set (cluster-safe: survives executor loss), else
    ``localCheckpoint()`` (local-mode default; no extra job, no FS I/O).
    Both cut lineage eagerly, so the loop's plan stays one-round deep.
    """
    try:
        ckpt_dir = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    except Exception:
        ckpt_dir = None
    if ckpt_dir:
        spark.sparkContext.setCheckpointDir(ckpt_dir)
        return lambda df: df.checkpoint()
    return lambda df: df.localCheckpoint()
