"""A/B variants for the q25/q66 multi-consumer materialization fix.

old  = df-ordered prefix pipeline WITHOUT the docs boundary (the only
       exchange below docs is _spread's, so explode+distinct+dfreq-join
       +collect_list+sort re-run once per consumer) and union _bidir.
new  = the shipped code: explicit docs repartition + explode _bidir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_pipeline_spark.llm import dedup
from stock_data_pipeline_spark.llm.dedup import _spread, _tokenized, ngrams_from_tokens
from stock_data_pipeline_spark.catalog import load_table


def _prefix_pairs_old(
    df: DataFrame, id_col: str, text_col: str, n: int, threshold: float
) -> DataFrame:
    df = _tokenized(_spread(df, id_col), id_col, text_col)
    shingles = df.select(
        F.col(id_col),
        F.explode(
            F.transform(ngrams_from_tokens(F.col("__tk"), n), lambda s: F.xxhash64(s))
        ).alias("shingle"),
    ).distinct()
    dfreq = shingles.groupBy("shingle").agg(F.count("*").alias("df_"))
    ranked = shingles.join(dfreq, "shingle")
    docs = (
        ranked.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("df_", "shingle"))).alias("__sorted"))
        .withColumn("shingle_arr", F.transform("__sorted", lambda s: s["shingle"]))
        .withColumn("sz", F.size("shingle_arr"))
        .withColumn(
            "prefix",
            F.slice(
                "shingle_arr",
                1,
                (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int"),
            ),
        )
        .select(id_col, "shingle_arr", "sz", "prefix")
        # NOTE: no repartition here — the old shape
    )
    pre = docs.select(id_col, "sz", F.explode("prefix").alias("shingle"))
    a = pre.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "shingle")
    b = pre.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "shingle")
    cands = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_b") >= F.ceil(F.lit(threshold) * F.col("sz_a")))
            & (F.col("sz_a") >= F.ceil(F.lit(threshold) * F.col("sz_b")))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    da = docs.select(
        F.col(id_col).alias("id_a"), F.col("shingle_arr").alias("arr_a"), F.col("sz").alias("sz_a")
    )
    db = docs.select(
        F.col(id_col).alias("id_b"), F.col("shingle_arr").alias("arr_b"), F.col("sz").alias("sz_b")
    )
    return (
        cands.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def q25_variants(spark: SparkSession, sf_dir: str):
    doc = load_table(spark, sf_dir, "documents")

    def run_old():
        _prefix_pairs_old(doc, "doc_id", "text", 3, 0.8).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_new():
        dedup.ngram_jaccard_pairs_prefix(
            doc, "doc_id", "text", n=3, threshold=0.8
        ).write.format("noop").mode("overwrite").save()

    return {"old": run_old, "new": run_new}


def _prefix_pairs_v(
    df: DataFrame, id_col: str, text_col: str, n: int, threshold: float,
    notnull: bool = False, repart: str = "none", localck: bool = False,
) -> DataFrame:
    if notnull:
        df = df.filter(F.col(id_col).isNotNull())
    df = _tokenized(_spread(df, id_col), id_col, text_col)
    shingles = df.select(
        F.col(id_col),
        F.explode(
            F.transform(ngrams_from_tokens(F.col("__tk"), n), lambda s: F.xxhash64(s))
        ).alias("shingle"),
    ).distinct()
    dfreq = shingles.groupBy("shingle").agg(F.count("*").alias("df_"))
    ranked = shingles.join(dfreq, "shingle")
    docs = (
        ranked.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("df_", "shingle"))).alias("__sorted"))
        .withColumn("shingle_arr", F.transform("__sorted", lambda s: s["shingle"]))
        .withColumn("sz", F.size("shingle_arr"))
        .withColumn(
            "prefix",
            F.slice(
                "shingle_arr",
                1,
                (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int"),
            ),
        )
        .select(id_col, "shingle_arr", "sz", "prefix")
    )
    if repart == "num":
        par = df.sparkSession.sparkContext.defaultParallelism
        docs = docs.repartition(2 * par, id_col)
    if localck:
        docs = docs.localCheckpoint(eager=False)
    pre = docs.select(id_col, "sz", F.explode("prefix").alias("shingle"))
    a = pre.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "shingle")
    b = pre.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "shingle")
    cands = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_b") >= F.ceil(F.lit(threshold) * F.col("sz_a")))
            & (F.col("sz_a") >= F.ceil(F.lit(threshold) * F.col("sz_b")))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    da = docs.select(
        F.col(id_col).alias("id_a"), F.col("shingle_arr").alias("arr_a"), F.col("sz").alias("sz_a")
    )
    db = docs.select(
        F.col(id_col).alias("id_b"), F.col("shingle_arr").alias("arr_b"), F.col("sz").alias("sz_b")
    )
    return (
        cands.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def q25_variants2(spark: SparkSession, sf_dir: str):
    doc = load_table(spark, sf_dir, "documents")

    def mk(**kw):
        def run():
            _prefix_pairs_v(doc, "doc_id", "text", 3, 0.8, **kw).write.format(
                "noop"
            ).mode("overwrite").save()
        return run

    return {
        "plain": mk(),
        "rnum": mk(notnull=True, repart="num"),
        "lck": mk(localck=True),
    }


def q25_order_variants(spark: SparkSession, sf_dir: str):
    doc = load_table(spark, sf_dir, "documents")

    def mk(order):
        def run():
            dedup.ngram_jaccard_pairs_prefix(
                doc, "doc_id", "text", n=3, threshold=0.8, order=order
            ).write.format("noop").mode("overwrite").save()
        return run

    return {"df": mk("df"), "hash": mk("hash")}


def _prefix_pairs_post(
    df: DataFrame, id_col: str, text_col: str, n: int, threshold: float,
    docs_boundary: bool = False,
) -> DataFrame:
    """Variant: materialize the postings (id, shingle) behind one
    explicit exchange so the dfreq branch and the docs branch runtime-
    reuse the tokenize+ngram+hash+explode+distinct stage instead of
    re-deriving it."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    df = df.filter(F.col(id_col).isNotNull())
    tok = _tokenized(_spread(df, id_col), id_col, text_col)
    shingles = (
        tok.select(
            F.col(id_col),
            F.explode(
                F.transform(ngrams_from_tokens(F.col("__tk"), n), lambda s: F.xxhash64(s))
            ).alias("shingle"),
        )
        .distinct()
        .repartition(2 * par, id_col, "shingle")
    )
    dfreq = shingles.groupBy("shingle").agg(F.count("*").alias("df_"))
    ranked = shingles.join(dfreq, "shingle")
    docs = (
        ranked.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("df_", "shingle"))).alias("__sorted"))
        .withColumn("shingle_arr", F.transform("__sorted", lambda s: s["shingle"]))
        .withColumn("sz", F.size("shingle_arr"))
        .withColumn(
            "prefix",
            F.slice(
                "shingle_arr",
                1,
                (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int"),
            ),
        )
        .select(id_col, "shingle_arr", "sz", "prefix")
    )
    if docs_boundary:
        docs = docs.repartition(2 * par, id_col)
    pre = docs.select(id_col, "sz", F.explode("prefix").alias("shingle"))
    a = pre.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "shingle")
    b = pre.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "shingle")
    cands = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_b") >= F.ceil(F.lit(threshold) * F.col("sz_a")))
            & (F.col("sz_a") >= F.ceil(F.lit(threshold) * F.col("sz_b")))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    da = docs.select(
        F.col(id_col).alias("id_a"), F.col("shingle_arr").alias("arr_a"), F.col("sz").alias("sz_a")
    )
    db = docs.select(
        F.col(id_col).alias("id_b"), F.col("shingle_arr").alias("arr_b"), F.col("sz").alias("sz_b")
    )
    return (
        cands.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def q25_post_variants(spark: SparkSession, sf_dir: str):
    doc = load_table(spark, sf_dir, "documents")

    def mk(fn, **kw):
        def run():
            fn(doc, "doc_id", "text", 3, 0.8, **kw).write.format("noop").mode(
                "overwrite"
            ).save()
        return run

    return {
        "plain": mk(_prefix_pairs_v),
        "post": mk(_prefix_pairs_post),
        "post+docs": mk(_prefix_pairs_post, docs_boundary=True),
    }
