"""RollingCheckpoint: blocks of old generations are actually freed
(the bug class: DataFrame.rdd.unpersist() is a no-op on a derived RDD
— the JVM-side checkpointed RDD must be unpersisted), while the
immediately-previous generation stays live for convergence joins."""

from pyspark.sql import functions as F

from linkgraph.rolling import RollingCheckpoint


def _n_persistent(spark) -> int:
    return len(list(spark.sparkContext._jsc.getPersistentRDDs().keySet()))


def test_rolling_checkpoint_frees_old_generations(spark):
    base = _n_persistent(spark)
    roll = RollingCheckpoint()
    df = spark.range(100).select(
        F.col("id").alias("vid"), F.lit(1.0).alias("rank")
    )
    prev = None
    for _ in range(6):
        new = roll(df.select("vid", (F.col("rank") + 1).alias("rank")))
        if prev is not None:
            # the parent generation must remain joinable after rolling
            assert new.join(prev, "vid").count() == 100
        prev = df if prev is None else new
        df = new
    # at most parent + current are pinned; everything older is freed
    assert _n_persistent(spark) - base <= 2


def test_rolling_checkpoint_values_survive(spark):
    roll = RollingCheckpoint()
    df = spark.range(10).select(F.col("id").alias("v"))
    for _ in range(4):
        df = roll(df.select((F.col("v") + 1).alias("v")))
    assert df.agg(F.sum("v")).first()[0] == sum(range(10)) + 40
