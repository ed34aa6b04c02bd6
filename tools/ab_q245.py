"""Interleaved A/B for the q245 single-exchange rewrite (r10).

old  = r09 shape: tot/ptot/local as three independent vals subtrees
       (static plan: 2 lineitem scans, 3 final v-aggregates, extra
       BroadcastNestedLoopJoin for the grand totals).
new  = r10 shape: one explicit pid repartition feeds window + 16-group
       totals; offsets broadcast carries oa/ob AND na/nb.

Usage: python tools/ab_measure.py tools.ab_q245:build [rounds]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from stock_data_pipeline_spark.queries._p1_parity_corpus import load_table
from stock_data_pipeline_spark.queries._p4_rankings_linkage import (
    _dec,
    q245_ks_test,
)


def _old(spark, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    tagged = li.select(
        (_dec("l_extendedprice") * 100).cast("long").alias("v"),
        (F.col("l_returnflag") == "R").cast("long").alias("is_r"),
    )
    vals = tagged.groupBy("v").agg(
        F.sum("is_r").cast("long").alias("ca"),
        F.sum(1 - F.col("is_r")).cast("long").alias("cb"),
    )
    tot = vals.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    pid = ((F.col("v") - F.pmod(F.col("v"), F.lit(1048576))) / 1048576).cast("long")
    ranged = vals.withColumn("pid", pid)
    w_in = (
        Window.partitionBy("pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "v", "pid",
        F.sum("ca").over(w_in).alias("la"),
        F.sum("cb").over(w_in).alias("lb"),
    )
    ptot = ranged.groupBy("pid").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    w_pid = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = ptot.select(
        "pid",
        F.coalesce(F.sum("ta").over(w_pid), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("tb").over(w_pid), F.lit(0)).alias("ob"),
    )
    cum = local.join(F.broadcast(offsets), "pid").select(
        "v",
        (F.col("oa") + F.col("la")).alias("cum_a"),
        (F.col("ob") + F.col("lb")).alias("cum_b"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        (
            F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
            .cast("decimal(38,0)")
            * 16777216
            + (16777215 - F.col("v"))
        ).alias("enc"),
        "na",
        "nb",
    )
    enc_max = F.max("enc")
    d_scaled = (
        enc_max - F.pmod(enc_max, F.lit(16777216).cast("decimal(38,0)"))
    ) / 16777216
    return scored.groupBy(
        F.col("na").alias("n_returned"), F.col("nb").alias("n_kept")
    ).agg(
        d_scaled.cast("long").alias("d_scaled"),
        (F.lit(16777215) - F.pmod(enc_max, F.lit(16777216).cast("decimal(38,0)")))
        .cast("long")
        .alias("at_value_cents"),
        (
            d_scaled.cast("double")
            / (F.first("na").cast("double") * F.first("nb").cast("double"))
        ).alias("ks_d"),
    )


def build(spark, sf_dir: str):
    def run_old():
        _old(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run_new():
        q245_ks_test(spark, sf_dir).write.format("noop").mode("overwrite").save()

    return {"old": run_old, "new": run_new}
