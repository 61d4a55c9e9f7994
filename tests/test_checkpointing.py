"""Conf-driven reliable checkpointing for iterative loop queries.

``spark_graft.checkpoint_dir`` is the one switch that moves every
iterative catalog query (q397 BFS, q423/q430 value iteration, q441
power iteration) and ``connected_components`` from executor-pinned
``localCheckpoint()`` to reliable ``checkpoint()`` — the cluster-safe
mode where a lost executor doesn't lose the loop's state.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from noaa_ais_glue_lakehouse_spark.operators.checkpointing import (
    CHECKPOINT_DIR_CONF,
    iteration_checkpointer,
)
from noaa_ais_glue_lakehouse_spark.operators.dedup import connected_components


def _clear_conf(spark):
    try:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
    except Exception:
        pass


def test_default_is_local_checkpoint(spark):
    _clear_conf(spark)
    ckpt = iteration_checkpointer(spark)
    df = ckpt(spark.range(5))
    assert df.count() == 5
    # both checkpoint modes cut lineage: the plan bottoms out at a
    # materialized RDD scan instead of the original Range node
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan


def test_conf_switches_to_reliable_checkpoint(spark, tmp_path):
    ckpt_dir = str(tmp_path / "reliable_ckpt")
    spark.conf.set(CHECKPOINT_DIR_CONF, ckpt_dir)
    try:
        ckpt = iteration_checkpointer(spark)
        df = ckpt(spark.range(10).withColumn("v", F.col("id") * 2))
        assert df.count() == 10
        # reliable checkpoint materializes RDD blocks into the directory
        found = []
        for root, _dirs, files in os.walk(ckpt_dir):
            found.extend(files)
        assert found, "reliable checkpoint wrote no files into the conf dir"
    finally:
        _clear_conf(spark)


def test_iterative_loop_same_result_both_modes(spark, tmp_path):
    """A BFS-shaped loop returns identical rows under both checkpoint modes."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )

    def run_loop():
        ckpt = iteration_checkpointer(spark)
        e = ckpt(
            edges.unionByName(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        )
        dist = e.select("src").distinct().filter(F.col("src") == 0).select(
            F.col("src").alias("node"), F.lit(0).alias("hop")
        )
        for _ in range(3):
            relaxed = dist.join(e, dist.node == e.src).select(
                F.col("dst").alias("node"), (F.col("hop") + 1).alias("hop")
            )
            dist = ckpt(
                dist.unionByName(relaxed).groupBy("node").agg(
                    F.min("hop").alias("hop")
                )
            )
        return sorted(tuple(r) for r in dist.collect())

    _clear_conf(spark)
    local_rows = run_loop()
    spark.conf.set(CHECKPOINT_DIR_CONF, str(tmp_path / "loop_ckpt"))
    try:
        reliable_rows = run_loop()
    finally:
        _clear_conf(spark)
    assert local_rows == reliable_rows == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_connected_components_consults_conf(spark, tmp_path):
    ckpt_dir = str(tmp_path / "cc_ckpt")
    spark.conf.set(CHECKPOINT_DIR_CONF, ckpt_dir)
    try:
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"]
        )
        out = connected_components(pairs)
        got = {(r["id"], r["component"]) for r in out.collect()}
        assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}
        found = []
        for root, _dirs, files in os.walk(ckpt_dir):
            found.extend(files)
        assert found, "connected_components ignored spark_graft.checkpoint_dir"
    finally:
        _clear_conf(spark)
