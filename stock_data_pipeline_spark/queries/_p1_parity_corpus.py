"""Query registry: every implemented operator from SURVEY.md §2 (plus
the LLM-pipeline extensions) expressed over the shared test tables,
each paired with an ANSI-SQL oracle DuckDB can run on the same parquet.

Oracle-matching discipline (why these queries look the way they do):
- dates/timestamps are emitted as formatted strings (engine-neutral);
- double *aggregates* are rounded to 2dp (summation order differs
  between engines at the ulp level; per-row arithmetic is NOT rounded
  because identical operands → identical IEEE results);
- integer outputs are cast to long/BIGINT on both sides;
- float folds (cosine, fingerprint) run left-to-right with an exact
  seed so both engines produce bit-identical doubles.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_data_pipeline_spark.catalog import load_events, load_table
from stock_data_pipeline_spark.functions.scalars import (
    business_day_adjust,
    convert_shares_outstanding,
    dollar_volume,
    make_ticker_sql_compatible,
    make_ticker_yfinance_compatible,
)
from stock_data_pipeline_spark.llm import dedup, multimodal, similarity, text
from stock_data_pipeline_spark.operators import indicators
from stock_data_pipeline_spark.operators.calendar import densify_dates
from stock_data_pipeline_spark.operators.incremental import enforce_primary_key
from stock_data_pipeline_spark.operators.merge import coalesce_merge
from stock_data_pipeline_spark.operators.pivoting import pivot_wide, unpivot_long
from stock_data_pipeline_spark.operators.setops import membership_diff
from stock_data_pipeline_spark.operators.topn import top_n_per_group
from stock_data_pipeline_spark.operators.windows import (
    lag_pct_change,
    pct_vs_first,
    simple_moving_average,
)
from stock_data_pipeline_spark.streaming.events import (
    sliding_window_agg,
    tumbling_window_agg,
)


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # None → driver records rows-only check
    headline: bool = False  # include in bench.py
    survey_ref: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, headline: bool = False, survey_ref: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, headline=headline, survey_ref=survey_ref)
        return fn

    return deco


def _d(col: str) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd")


def _duck_cos(av: str, bv: str) -> str:
    """Cosine in DuckDB with the exact fold order of similarity.cosine:
    dot left-to-right, then sqrt(norm a) * sqrt(norm b) — identical
    IEEE sequence, bit-identical doubles (proven by q28)."""
    return f"""list_reduce(list_transform(generate_series(1, len({av})),
                   i -> CAST({av}[i] AS DOUBLE) * CAST({bv}[i] AS DOUBLE)), (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(generate_series(1, len({av})),
                     i -> CAST({av}[i] AS DOUBLE) * CAST({av}[i] AS DOUBLE)), (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(generate_series(1, len({bv})),
                     i -> CAST({bv}[i] AS DOUBLE) * CAST({bv}[i] AS DOUBLE)), (a, b) -> a + b)))"""


def _dec(col) -> F.Column:
    """Money columns are 2-dp values stored as doubles; casting to
    DECIMAL(18,2) is lossless here and makes sums exact and
    order-independent — the only way a Spark aggregate can hash-match an
    independent engine bit-for-bit (double summation order differs at
    the ulp level and ROUND() can't always hide it: a sum can land on
    opposite sides of a rounding boundary)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Flagship: J1 — 3-way join + weighted aggregate (sector calculated price)
# ---------------------------------------------------------------------------

@register(
    "q01_sector_calculated_price",
    oracle="""
    WITH mcap AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS date,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))
                 AS market_cap
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    ), outst AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS date,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS outstanding
        FROM orders GROUP BY 1
    )
    SELECT m.date AS date,
           CAST(m.market_cap AS DOUBLE) / CAST(o.outstanding AS DOUBLE) AS calc_price
    FROM mcap m JOIN outst o ON m.date = o.date
    """,
    headline=True,
    survey_ref="J1/EP3 sector.py:87-110",
)
def q01_sector_calculated_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship J1 analog: per-date weighted price Σ(price×qty)/Σ(outstanding).

    Scale shape (r08, SCALE.md §16): lineitem pre-aggregates to ORDER
    grain before the orders join — exact decimal sums are associative
    and l_orderkey is orders' PK, so Σ over the join ≡ Σ of per-order
    Σs, bit-identically. The shuffle probe caught the naive
    join-then-agg shape moving ~60× its input once the orders side
    outgrew the broadcast threshold (sf1→sf2 exponent 6.59: the
    broadcast→SMJ transition exchanges data-sized lineitem); after the
    rewrite the only lineitem-sized work is the map-side partial agg,
    the exchange carries order-grain rows, and the join reuses that
    hashpartitioning. The partial agg also collapses a zipf-hot
    orderkey per mapper, so the SKEW_r08 q90-shape straggler never
    forms. The per-date divisor aggregate is tiny and joins broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("order_mcap")
    )
    mcap = (
        per_order.join(
            o.select("o_orderkey", "o_orderdate"),
            per_order.l_orderkey == o.o_orderkey,
        )
        .groupBy(_d("o_orderdate").alias("date"))
        .agg(F.sum("order_mcap").alias("market_cap"))
    )
    outst = o.groupBy(_d("o_orderdate").alias("date")).agg(
        F.sum(_dec("o_totalprice")).alias("outstanding")
    )
    return mcap.join(F.broadcast(outst), "date").select(
        "date",
        (F.col("market_cap").cast("double") / F.col("outstanding").cast("double")).alias("calc_price"),
    )


# ---------------------------------------------------------------------------
# Aggregations (G) — TPC-H Q1-style pricing summary
# ---------------------------------------------------------------------------

@register(
    "q02_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    survey_ref="G2 weighted aggregates; sector.py:91-95",
)
def q02_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(disc_price * (1 + _dec("l_tax"))).cast("double").alias("sum_charge"),
        (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Incremental load (F1/G1)
# ---------------------------------------------------------------------------

@register(
    "q03_incremental_load_filter",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >
          (SELECT CAST(MAX(l_shipdate) AS DATE) - 90 FROM lineitem)
    GROUP BY 1
    """,
    headline=True,
    survey_ref="F1 functions.py:23-39, G1 ticker.py:26-31",
)
def q03_incremental_load_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `date > MAX(date)` delta-load predicate as one lazy
    DAG: max-date probe → broadcast scalar → filter → daily rollup.
    With a date-partitioned table the filter prunes partitions."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = li.agg(F.date_sub(F.to_date(F.max("l_shipdate")), 90).alias("__cutoff"))
    return (
        li.join(F.broadcast(cutoff))
        .filter(F.to_date("l_shipdate") > F.col("__cutoff"))
        .groupBy(_d("l_shipdate").alias("ship_date"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).cast("double").alias("revenue"),
        )
    )


@register(
    "q04_latest_shipdate",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           strftime(MAX(l_shipdate), '%Y-%m-%d') AS latest_ship,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY 1, 2
    """,
    survey_ref="G1 MAX(date) probe; S2 functions.py:69-73",
)
def q04_latest_shipdate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _d(F.max("l_shipdate")).alias("latest_ship"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-N (F7, S1–S3)
# ---------------------------------------------------------------------------

@register(
    "q05_topn_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 5
    """,
    headline=True,
    survey_ref="F7/S3 tail-N sectors.py:176-177",
)
def q05_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    return top_n_per_group(
        joined,
        ["c_mktsegment"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        5,
        rank_name="rn",
    )


# ---------------------------------------------------------------------------
# Window functions (W1–W4)
# ---------------------------------------------------------------------------

@register(
    "q06_sma",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CASE WHEN ROW_NUMBER() OVER w >= 7
                THEN CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 7.0
           END AS sma7
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    headline=True,
    survey_ref="W1 SMA load_yfinance_data.py:143-145",
)
def q06_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row SMA with pandas rolling(n).mean() NULL-head semantics
    (operators.windows.simple_moving_average on a decimal-cast value so
    the windowed mean is exact — see _dec)."""
    o = load_table(spark, sf_dir, "orders").withColumn("tp_dec", _dec("o_totalprice"))
    out = simple_moving_average(
        o, "tp_dec", 7, ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")], out_name="sma7",
        exact_sum_div=True,
    )
    return out.select("o_custkey", "o_orderkey", "sma7")


@register(
    "q07_lag_pct_change",
    oracle="""
    SELECT o_custkey, o_orderkey,
           (o_totalprice - LAG(o_totalprice) OVER w) / LAG(o_totalprice) OVER w * 100.0 AS gap_pct
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    survey_ref="W2 gap load_yfinance_data.py:154-158",
)
def q07_lag_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    out = lag_pct_change(
        o, "o_totalprice", ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")], out_name="gap_pct",
    )
    return out.select("o_custkey", "o_orderkey", "gap_pct")


@register(
    "q08_intraday_change",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_extendedprice * (1 - l_discount) * (1 + l_tax) - l_extendedprice)
             / l_extendedprice * 100.0 AS chg_pct
    FROM lineitem
    """,
    survey_ref="W3 on-peak load_yfinance_data.py:160-164",
)
def q08_intraday_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ((net - F.col("l_extendedprice")) / F.col("l_extendedprice") * F.lit(100.0)).alias("chg_pct"),
    )


@register(
    "q09_pct_vs_first",
    oracle="""
    SELECT o_custkey, o_orderkey,
           (o_totalprice - FIRST_VALUE(o_totalprice) OVER w)
             / FIRST_VALUE(o_totalprice) OVER w * 100.0 AS pct_vs_start
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    survey_ref="W4/G4 sectors.py:176-181",
)
def q09_pct_vs_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    out = pct_vs_first(
        o, "o_totalprice", ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")], out_name="pct_vs_start",
    )
    return out.select("o_custkey", "o_orderkey", "pct_vs_start")


# ---------------------------------------------------------------------------
# Pivot / unpivot (G3)
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q10_pivot_event_values",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS date,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click') AS DOUBLE) AS click,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'error') AS DOUBLE) AS error,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS signup,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'view') AS DOUBLE) AS view
    FROM events GROUP BY 1
    """,
    survey_ref="G3 pivot sector.py:167",
)
def q10_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot with an explicit value list (fixed output schema,
    no extra distinct-keys pass — the at-scale form)."""
    ev = (
        load_events(spark, sf_dir)
        .withColumn("date", _d("ts"))
        .withColumn("value", _dec("value"))
    )
    wide = pivot_wide(ev, "date", "event_type", "value", values=EVENT_TYPES, agg="sum")
    return wide.select("date", *[F.col(t).cast("double").alias(t) for t in EVENT_TYPES])


@register(
    "q11_unpivot_part",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
    """,
    survey_ref="G3 inverse; wide→long for canonical layout",
)
def q11_unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_size").cast("double").alias("p_size"), "p_retailprice"
    )
    return unpivot_long(p, ["p_partkey"], ["p_size", "p_retailprice"], "metric", "val")


# ---------------------------------------------------------------------------
# Set operations (I)
# ---------------------------------------------------------------------------

@register(
    "q12_membership_diff",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
    survey_ref="I membership diff sector.py:170-171, main.py:135-137",
)
def q12_membership_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-set diff from the reference done as a data-level anti-join."""
    o = load_table(spark, sf_dir, "orders")
    cur = o.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    nxt = o.filter(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("custkey"))
    added, _removed = membership_diff(cur, nxt, ["custkey"])
    return added


# ---------------------------------------------------------------------------
# Primary-key enforcement (D4) + UPDATE-where-NULL merge (F5/J1)
# ---------------------------------------------------------------------------

@register(
    "q13_pk_dedupe",
    oracle="""
    SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           MAX(o_orderkey) AS o_orderkey
    FROM orders GROUP BY 1, 2
    """,
    survey_ref="D4 ADD PRIMARY KEY postgresql_connection.py:38-40",
)
def q13_pk_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-invariant enforcement: one row per (custkey, order-date),
    deterministically keeping the max orderkey."""
    o = load_table(spark, sf_dir, "orders").withColumn("order_date", _d("o_orderdate"))
    deduped = enforce_primary_key(o, ["o_custkey", "order_date"], order_by=["o_orderkey"])
    return deduped.select("o_custkey", "order_date", "o_orderkey")


@register(
    "q14_coalesce_merge",
    oracle="""
    WITH target AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS calc_price
        FROM orders
    ), updates AS (
        SELECT l_orderkey AS o_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS calc_price
        FROM lineitem GROUP BY 1
    )
    SELECT t.o_orderkey, COALESCE(t.calc_price, u.calc_price) AS calc_price
    FROM target t LEFT JOIN updates u ON t.o_orderkey = u.o_orderkey
    """,
    survey_ref="F5/J1 UPDATE-where-NULL sector.py:98",
)
def q14_coalesce_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's fill-only-NULL UPDATE as an idempotent coalesce-merge."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    target = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).alias("calc_price"),
    )
    updates = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).cast("double").alias("calc_price")
    )
    return coalesce_merge(target, updates, ["o_orderkey"], ["calc_price"])


# ---------------------------------------------------------------------------
# Union (A2/J2) — long-form multi-source concat
# ---------------------------------------------------------------------------

@register(
    "q15_union_long",
    oracle="""
    SELECT 'order' AS src, strftime(o_orderdate, '%Y-%m-%d') AS evt_date,
           o_totalprice AS val
    FROM orders
    UNION ALL
    SELECT 'line' AS src, strftime(l_shipdate, '%Y-%m-%d') AS evt_date,
           l_extendedprice AS val
    FROM lineitem
    """,
    survey_ref="A2/J2 axis=1 concat load_yfinance_data.py:122-128 → long union",
)
def q15_union_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("order").alias("src"), _d("o_orderdate").alias("evt_date"),
        F.col("o_totalprice").alias("val"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("line").alias("src"), _d("l_shipdate").alias("evt_date"),
        F.col("l_extendedprice").alias("val"),
    )
    return o.unionByName(li)


# ---------------------------------------------------------------------------
# Scalar functions (X1–X3, X8, X10, X12)
# ---------------------------------------------------------------------------

@register(
    "q16_string_normalize",
    oracle="""
    SELECT p_partkey,
           p_brand || '.' || CAST(p_size AS VARCHAR) AS raw,
           lower(replace(p_brand || '.' || CAST(p_size AS VARCHAR), '.', '_')) AS sql_name,
           regexp_replace(p_brand || '.' || CAST(p_size AS VARCHAR), '[._]', '-', 'g') AS yf_name
    FROM part
    """,
    survey_ref="X1/X2 functions.py:144-149",
)
def q16_string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    raw = F.concat(F.col("p_brand"), F.lit("."), F.col("p_size").cast("string"))
    return p.select(
        "p_partkey",
        raw.alias("raw"),
        make_ticker_sql_compatible(raw).alias("sql_name"),
        make_ticker_yfinance_compatible(raw).alias("yf_name"),
    )


@register(
    "q17_magnitude_parse",
    oracle="""
    WITH raw AS (
        SELECT p_partkey,
               CAST(p_size AS VARCHAR) || '.25 ' ||
                 (CASE WHEN p_partkey % 2 = 0 THEN 'M' ELSE 'B' END) AS mag_str
        FROM part
    )
    SELECT p_partkey, mag_str,
           CAST(CASE upper(regexp_extract(mag_str, '([\\d,.]+)\\s*([MB])', 2))
                WHEN 'M' THEN CAST(regexp_replace(regexp_extract(mag_str, '([\\d,.]+)\\s*([MB])', 1), '[,\\s]', '', 'g') AS DOUBLE) * 1000000.0
                WHEN 'B' THEN CAST(regexp_replace(regexp_extract(mag_str, '([\\d,.]+)\\s*([MB])', 1), '[,\\s]', '', 'g') AS DOUBLE) * 1000000000.0
           END AS BIGINT) AS shares
    FROM raw
    """,
    survey_ref="X3 convert_shares_outstanding sectors.py:122-132",
)
def q17_magnitude_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse scraped '<n>.25 M'/'B' magnitude strings (synthesized from
    part so the parser is exercised on fixture data; .25 keeps the
    double arithmetic exact for both engines)."""
    p = load_table(spark, sf_dir, "part")
    mag = F.concat(
        F.col("p_size").cast("string"),
        F.lit(".25 "),
        F.when(F.col("p_partkey") % 2 == 0, F.lit("M")).otherwise(F.lit("B")),
    )
    return p.select(
        "p_partkey",
        mag.alias("mag_str"),
        convert_shares_outstanding(mag).alias("shares"),
    )


@register(
    "q18_business_day",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS raw_date,
           strftime(CAST(o_orderdate AS DATE) -
               CASE isodow(o_orderdate) WHEN 6 THEN 1 WHEN 7 THEN 2 WHEN 1 THEN 3 ELSE 1 END,
             '%Y-%m-%d') AS prev_business_day
    FROM orders
    """,
    survey_ref="X8 get_todays_date functions.py:107-117",
)
def q18_business_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        _d("o_orderdate").alias("raw_date"),
        F.date_format(business_day_adjust(F.to_date("o_orderdate")), "yyyy-MM-dd").alias(
            "prev_business_day"
        ),
    )


@register(
    "q19_calendar_densify",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS lo, CAST(MAX(o_orderdate) AS DATE) AS hi
        FROM orders
    ), spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM bounds
    ), cnts AS (
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n FROM orders GROUP BY 1
    )
    SELECT strftime(s.d, '%Y-%m-%d') AS date, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
    FROM spine s LEFT JOIN cnts c ON s.d = c.d
    """,
    survey_ref="X10 date_range densify sectors.py:206-210",
)
def q19_calendar_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spine = densify_dates(o, "o_orderdate", alias="d")
    cnts = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(F.count("*").alias("n"))
    return (
        spine.join(cnts, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("date"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
        )
    )


@register(
    "q20_dollar_volume",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_extendedprice * (1 - l_discount) + l_extendedprice) / 2.0 * l_quantity
             AS dollar_volume
    FROM lineitem
    """,
    survey_ref="X12 row-wise apply → native expr load_yfinance_data.py:147-152",
)
def q20_dollar_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's only UDF-shaped op (df.apply, row-at-a-time) —
    in Spark a plain codegen'd column expression, no UDF."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dollar_volume(
            open_col=F.col("l_extendedprice"),
            close_col=F.col("l_extendedprice") * (1 - F.col("l_discount")),
            volume_col=F.col("l_quantity"),
        ).alias("dollar_volume"),
    )

# ---------------------------------------------------------------------------
# Streaming-semantics queries (batch-equivalent plans; the readStream twins
# live in stock_data_pipeline_spark.streaming.events)
# ---------------------------------------------------------------------------

@register(
    "q21_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    headline=True,
    survey_ref="§2-K extension: tumbling window over events.ts",
)
def q21_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    out = tumbling_window_agg(ev, "1 hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register(
    "q22_sliding_window",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
        SELECT e.*, unnest([
            time_bucket(INTERVAL 30 MINUTE, ts),
            time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
        ]) AS ws
        FROM events e
    )
    GROUP BY 1, 2
    """,
    survey_ref="§2-K extension: sliding window (1h width, 30m slide)",
)
def q22_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    out = sliding_window_agg(ev, "1 hour", "30 minutes")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register(
    "q23_sessionize",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, event_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sess GROUP BY 1, 2
    """,
    headline=True,
    survey_ref="§2-K extension: gap sessionization (30 min)",
)
def q23_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization on exact microsecond arithmetic (unit-
    normalized integer µs; both engines see identical values)."""
    from stock_data_pipeline_spark.catalog import load_events_us

    raw = load_events_us(spark, sf_dir).select(
        "user_id", "event_id", F.col("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = 1800 * 1000 * 1000
    marked = raw.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(
            F.expr("timestamp_micros(min(ts_us))").cast("timestamp_ntz"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("session_start"),
        F.date_format(
            F.expr("timestamp_micros(max(ts_us))").cast("timestamp_ntz"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("session_end"),
    )


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: dedup
# ---------------------------------------------------------------------------

@register(
    "q24_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY text
    """,
    survey_ref="extension: exact dedup (hash-groupBy on content)",
)
def q24_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return (
        doc.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
    )


@register(
    "q25_jaccard_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
            FROM toks
        )
    ), sz AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b USING (sh)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.8
    """,
    headline=True,
    survey_ref="extension: n-gram Jaccard near-dup (AllPairs prefix filtering)",
)
def q25_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs at word-trigram Jaccard ≥ 0.8. Trigram
    shingles keep the space sparse (low document frequency per shingle)
    so the candidate join stays near-linear; the Spark plan adds
    lossless prefix filtering on top (the oracle brute-forces the same
    answer — result equality is what's checked, not plan equality)."""
    doc = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs_prefix(doc, "doc_id", "text", n=3, threshold=0.8)


def _minhash_xx_oracle(n: int = 3, num_perm: int = 64, bands: int = 16) -> str:
    """Generate the DuckDB oracle for the xxhash64 MinHash-LSH fast
    twin (q26): same shingles, Spark's exact xxhash64>>33 shingle hash
    (functions/xx64.xx64_sql_string_u31 — a generated single-expression
    SQL port verified bit-exact against Spark), same permutation
    constants and minima. One semantic note: Spark's band key is
    ``murmur3(slice)`` while the oracle joins on the slice VALUES
    themselves — identical candidate sets unless murmur3 collides on
    distinct slices (the MATCH at both gate scales certifies no
    collision there; at corpus scale a collision adds ~N²·2⁻³²
    spurious candidates, which downstream exact verification
    removes)."""
    from stock_data_pipeline_spark.functions.xx64 import xx64_sql_string_u31
    from stock_data_pipeline_spark.llm.dedup import _MERSENNE_31, _perm_constants

    r = num_perm // bands
    consts = _perm_constants(num_perm)
    min_cols = ",\n               ".join(
        f"MIN((h * {a} + {b}) % {_MERSENNE_31}) AS h{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_selects = []
    for bidx in range(bands):
        key = " || ',' || ".join(
            f"CAST(h{j} AS VARCHAR)" for j in range(bidx * r, bidx * r + r)
        )
        band_selects.append(
            f"SELECT doc_id, {bidx} AS band_idx, {key} AS band_key FROM sig"
        )
    bands_sql = "\n            UNION ALL ".join(band_selects)
    ngram = " || ' ' || ".join(f"tk[i+{k}]" for k in range(n)).replace("tk[i+0]", "tk[i]")
    return f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, greatest(len(tk) - {n - 1}, 0)),
                                         i -> {ngram})) AS sh
            FROM toks
        )
    ), shh AS (
        SELECT doc_id, {xx64_sql_string_u31("sh")} AS h
        FROM sh
    ), sig AS (
        SELECT doc_id,
               {min_cols}
        FROM shh GROUP BY doc_id
    ), bands AS (
        {bands_sql}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    """


def _simhash_xx_oracle(max_hamming: int = 3, bits: int = 64) -> str:
    """Generate the DuckDB oracle for the xxhash64 SimHash fast twin
    (q27): vote *i* is bit *i* of Spark's exact xxhash64(token)
    (generated single-expression SQL, unsigned HUGEINT form — bit i =
    (u // 2^i) % 2, which equals Spark's arithmetic-shift-and-mask on
    the signed value for every i). Fingerprints ride as two 32-bit
    halves like the portable twin's oracle (DuckDB BIGINT << throws on
    1<<63)."""
    from stock_data_pipeline_spark.functions.xx64 import xx64_sql_string

    vote_cols = ",\n               ".join(
        f"SUM(CASE WHEN (h // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(bits)
    )
    lo = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))
    hi = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << (j - 32)} ELSE 0 END)" for j in range(32, 64))
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
        FROM documents
    ), th AS (
        SELECT doc_id, {xx64_sql_string("tok")} AS h
        FROM toks
    ), sig AS (
        SELECT doc_id,
               {vote_cols}
        FROM th GROUP BY doc_id
    ), fp AS (
        SELECT doc_id, CAST({lo} AS BIGINT) AS lo, CAST({hi} AS BIGINT) AS hi FROM sig
    ), blocks AS (
        SELECT doc_id, 0 AS block_idx, lo % 65536 AS bv FROM fp
        UNION ALL SELECT doc_id, 1, lo // 65536 FROM fp
        UNION ALL SELECT doc_id, 2, hi % 65536 FROM fp
        UNION ALL SELECT doc_id, 3, hi // 65536 FROM fp
    ), cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM blocks a JOIN blocks b ON a.block_idx = b.block_idx AND a.bv = b.bv
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT id_a, id_b, hamming FROM (
        SELECT cand.id_a, cand.id_b,
               CAST(bit_count(xor(fa.lo, fb.lo)) + bit_count(xor(fa.hi, fb.hi)) AS INTEGER) AS hamming
        FROM cand
        JOIN fp fa ON fa.doc_id = cand.id_a
        JOIN fp fb ON fb.doc_id = cand.id_b
    ) WHERE hamming <= {max_hamming}
    """


def _ann_lsh_oracle(
    num_planes: int = 3, num_tables: int = 10, dim: int = 64, k: int = 10,
    ws: list | None = None,
) -> str:
    """Generate the DuckDB oracle for hyperplane-LSH ANN: identical
    dyadic weight literals are embedded here and in the Spark plan, so
    signature bits, buckets, candidates, and rerank scores all
    reproduce exactly. The bucket is Σ sign-bit·2^(planes−1−p) — the
    same integer Spark's acc*2+bit fold computes. ``ws`` defaults to
    the portable splitmix weights (q74); q29 passes the
    xxhash64-derived weights (similarity.xxhash_plane_weights — the
    exact values Spark's hashed ``_plane_weight`` path computes,
    pre-evaluated through the bit-exact Python xxhash64 port), giving
    the fast twin the same full value oracle (r06 VERDICT item 4)."""
    from stock_data_pipeline_spark.llm.similarity import portable_plane_weights

    if ws is None:
        ws = portable_plane_weights(num_tables, num_planes, dim)
    rows = []
    for t in range(num_tables):
        for p in range(num_planes):
            lst = ", ".join(repr(w) for w in ws[t][p])
            rows.append(f"({t}, {1 << (num_planes - 1 - p)}, [{lst}])")
    values = ",\n            ".join(rows)

    def bucketed(side: str, idc: str, vc: str) -> str:
        return f"""
        SELECT {idc}, table_idx,
               SUM(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(generate_series(1, {dim}), i -> wv[i] * CAST({vc}[i] AS DOUBLE))),
                       (a, b) -> a + b) >= 0 THEN pw ELSE 0 END) AS bucket
        FROM {side} CROSS JOIN w GROUP BY 1, 2"""

    return f"""
    WITH w(table_idx, pw, wv) AS (
        VALUES {values}
    ), c AS (
        SELECT vec_id AS match_id, embedding AS cv FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
    ), cb AS ({bucketed("c", "match_id", "cv")}
    ), qb AS ({bucketed("q", "query_id", "qv")}
    ), cand AS (
        SELECT DISTINCT query_id, match_id
        FROM cb JOIN qb ON cb.table_idx = qb.table_idx AND cb.bucket = qb.bucket
        WHERE query_id <> match_id
    ), scored AS (
        SELECT query_id, match_id,
               {_duck_cos("qv", "cv")} AS score
        FROM cand JOIN q USING (query_id) JOIN c USING (match_id)
    )
    SELECT query_id, match_id, score, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, match_id ASC) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "q26_minhash_lsh",
    # full value oracle since r07: Spark's xxhash64 is reproduced as a
    # generated single-expression DuckDB port (functions/xx64.py) — no
    # UDF registration, runs on the driver's bare connection
    oracle=_minhash_xx_oracle(n=3, num_perm=64, bands=16),
    headline=True,
    survey_ref="extension: MinHash+LSH near-dup candidates (xxhash64 "
    "fast path; value-oracled via the SQL xxhash64 port since r07)",
)
def q26_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(doc, "doc_id", "text", n=3, num_perm=64, bands=16)


@register(
    "q27_simhash_pairs",
    oracle=_simhash_xx_oracle(max_hamming=3),  # full value oracle since
    # r07 via the SQL xxhash64 port; q73 remains the portable-hash twin
    survey_ref="extension: SimHash near-dup (hamming ≤ 3; xxhash64 "
    "fast path, value-oracled since r07)",
)
def q27_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(doc, "doc_id", "text", max_hamming=3, blocks=4)


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: similarity search
# ---------------------------------------------------------------------------

@register(
    "q28_ann_cosine_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
    ), c AS (
        SELECT vec_id AS match_id, embedding AS cv FROM embeddings
    ), scored AS (
        SELECT query_id, match_id,
               list_reduce(list_transform(generate_series(1, len(qv)),
                   i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(generate_series(1, len(qv)),
                     i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(generate_series(1, len(cv)),
                     i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)), (a, b) -> a + b)))
               AS score
        FROM c, q
        WHERE query_id <> match_id
    )
    SELECT query_id, match_id, score, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, match_id ASC) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
    headline=True,
    survey_ref="extension: brute-force cosine top-k (exact ANN baseline)",
)
def q28_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk(emb, queries, k=10)


@register(
    "q29_ann_lsh_topk",
    # full value oracle since r07: the hashed plane weights are a pure
    # function of (table, plane, dim) indices, pre-evaluated through
    # the bit-exact Python xxhash64 port and inlined as dyadic literals
    # (exactly the q74 oracle shape with the fast path's weights);
    # recall vs q28's exact top-k additionally asserted in tests
    oracle=_ann_lsh_oracle(
        num_planes=3, num_tables=10, dim=64, k=10,
        ws=similarity.xxhash_plane_weights(10, 3, 64),
    ),
    survey_ref="extension: hyperplane-LSH ANN (the 100 TB scale path; "
    "value-oracled since r07 via pre-evaluated xxhash64 weights)",
)
def q29_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN. Parameters calibrated to this fixture's weak
    neighbor structure (median top-10 cosine ≈ 0.29 → θ≈73°): 3 planes
    × 10 tables ≈ 0.9 expected recall. On a real corpus with tighter
    neighbors, raise num_planes with corpus size (log₂(n/bucket_target))
    and drop tables."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ann_lsh_topk(emb, queries, k=10, num_planes=3, num_tables=10)


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: text analysis
# ---------------------------------------------------------------------------

def _duck_tokens(expr: str = "text") -> str:
    return f"list_filter(string_split_regex({expr}, '\\s+'), t -> t <> '')"


_LANG_HIT = "len(list_filter({tk}, t -> list_contains({lst}, lower(t))))"


def _lang_oracle() -> str:
    from stock_data_pipeline_spark.llm.text import LANG_MARKERS

    tk = _duck_tokens()
    hits = {
        lang: _LANG_HIT.format(tk=tk, lst=str(markers).replace("'", "'"))
        for lang, markers in LANG_MARKERS.items()
    }
    hit_cols = ",\n               ".join(f"{h} AS {lang}_hits" for lang, h in hits.items())
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"{lang}_hits" for lang in langs) + ")"
    whens = " ".join(f"WHEN {lang}_hits = {best} THEN '{lang}'" for lang in langs)
    return f"""
    WITH scored AS (
        SELECT doc_id, lang, {hit_cols}
        FROM documents
    )
    SELECT doc_id, lang, CASE WHEN {best} = 0 THEN 'und' {whens} END AS lang_pred
    FROM scored
    """


@register(
    "q30_lang_id",
    oracle=_lang_oracle(),
    survey_ref="extension: language-ID (marker-token heuristic)",
)
def q30_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return doc.select("doc_id", "lang", text.lang_id("text").alias("lang_pred"))


@register(
    "q31_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_duck_tokens()}) AS BIGINT) AS n_tokens,
           0.4 * least(CAST(len({_duck_tokens()}) AS DOUBLE) / 100.0, 1.0)
           + 0.3 * (CAST(len(list_filter({_duck_tokens()}, t -> list_contains(
                 ['the','and','of','to','a','in','is','it','that','for','on','with','as','at','by'],
                 lower(t)))) AS DOUBLE)
               / CAST(greatest(len({_duck_tokens()}), 1) AS DOUBLE))
           + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / CAST(greatest(length(text), 1) AS DOUBLE)) AS quality
    FROM documents
    """,
    survey_ref="extension: quality scoring (length/punct/stopword ratios)",
)
def q31_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        text.token_count("text").cast("long").alias("n_tokens"),
        text.quality_score("text").alias("quality"),
    )


@register(
    "q32_token_stats",
    oracle=f"""
    SELECT doc_id, n_chars,
           CAST(len({_duck_tokens()}) AS BIGINT) AS n_tokens,
           CAST(list_reduce(list_prepend(0, list_transform({_duck_tokens()}, t -> length(t))),
                            (a, b) -> a + b) AS DOUBLE)
             / CAST(greatest(len({_duck_tokens()}), 1) AS DOUBLE) AS avg_token_len
    FROM documents
    """,
    survey_ref="extension: token counting",
)
def q32_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    toks = text.tokens("text")
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, b: a + b
    )
    return doc.select(
        "doc_id",
        "n_chars",
        text.token_count("text").cast("long").alias("n_tokens"),
        (
            total_len.cast("double")
            / F.greatest(text.token_count("text"), F.lit(1)).cast("double")
        ).alias("avg_token_len"),
    )


@register(
    "q33_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, length(text)),
                              i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
    FROM documents
    """,
    survey_ref="extension: document fingerprinting (rolling hash)",
)
def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return doc.select("doc_id", text.fingerprint("text").alias("fingerprint"))


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: multimodal plumbing
# ---------------------------------------------------------------------------

@register(
    "q34_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS checksum
    FROM documents
    """,
    survey_ref="extension: binary payload + typed metadata columns",
)
def q34_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(doc)
    return media.select("doc_id", "n_bytes", "checksum")


@register(
    "q35_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_reduce(list_prepend(0,
                    list_transform(generate_series(1, length(text), 8),
                                   i -> ord(substr(text, i, 1)))),
                (a, b) -> a + b) % 997 AS DOUBLE) AS f0
    FROM documents
    """,
    survey_ref="extension: mapInPandas decode/feature-extract plumbing "
    "(stub decode is deterministic byte math, so even the Pandas-UDF "
    "path gets a hash-checked oracle)",
)
def q35_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(doc)
    feats = multimodal.decode_image_features(media)
    return feats.select(
        "doc_id", "n_bytes", F.element_at("feature", 1).alias("f0")
    )



# ---------------------------------------------------------------------------
# Coverage batch 2: calendar gate, deterministic pivot, rank family,
# as-of join, rollup, anti-join, exact percentile (SURVEY §2 X9/G3/+breadth)
# ---------------------------------------------------------------------------

@register(
    "q36_market_day_filter",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS date,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE isodow(o_orderdate) NOT IN (6, 7)
    GROUP BY 1
    """,
    survey_ref="X9 market-day gate functions.py:61-66 → calendar dim semi-join",
)
def q36_market_day_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference gates its whole run on 'is today a market day'
    (pandas_market_calendars). Engine form: broadcast semi-join against
    a calendar dimension — here weekdays over the data's own range,
    derived lazily (no driver-side bounds probe: the min/max agg is a
    1-row plan feeding ``sequence``)."""
    from stock_data_pipeline_spark.operators.calendar import (
        market_day_filter,
        market_days_from_bounds,
    )

    o = load_table(spark, sf_dir, "orders").withColumn("date", F.to_date("o_orderdate"))
    cal = market_days_from_bounds(o, "date")
    return (
        market_day_filter(o, cal, "date")
        .groupBy(F.date_format("date", "yyyy-MM-dd").alias("date"))
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q37_pivot_min_acctbal",
    oracle="""
    SELECT c_nationkey,
           MIN(c_acctbal) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS automobile,
           MIN(c_acctbal) FILTER (WHERE c_mktsegment = 'BUILDING') AS building,
           MIN(c_acctbal) FILTER (WHERE c_mktsegment = 'FURNITURE') AS furniture,
           MIN(c_acctbal) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS household,
           MIN(c_acctbal) FILTER (WHERE c_mktsegment = 'MACHINERY') AS machinery
    FROM customer GROUP BY 1
    """,
    survey_ref="G3 pivot (deterministic agg; pandas pivot needs unique cells)",
)
def q37_pivot_min_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    c = load_table(spark, sf_dir, "customer")
    wide = pivot_wide(c, "c_nationkey", "c_mktsegment", "c_acctbal", values=segs, agg="min")
    return wide.select(
        "c_nationkey", *[F.col(s).alias(s.lower()) for s in segs]
    )


@register(
    "q38_rank_family",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
    survey_ref="window-function breadth beyond the reference (rank/dense_rank/ntile)",
)
def q38_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q39_asof_join",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           v.value AS last_view_value
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    headline=True,
    survey_ref="as-of join: operator Spark lacks, composed from union+window (no UDF)",
)
def q39_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quotes-to-trades analog: each purchase picks up the value of the
    same user's latest prior (or simultaneous) view."""
    from stock_data_pipeline_spark.operators.asof import asof_join

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("last_view_value")
    )
    out = asof_join(purchases, views, ["user_id"], "ts", "ts", ["last_view_value"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "last_view_value",
    )


@register(
    "q40_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    survey_ref="aggregation breadth: rollup/grouping sets (not in reference)",
)
def q40_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "q41_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1997
    )
    """,
    survey_ref="I set-ops: anti-join (customers with no 1997 orders)",
)
def q41_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "q42_exact_median",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price
    FROM lineitem GROUP BY 1
    """,
    survey_ref="aggregation breadth: exact percentiles (approx twin: percentile_approx)",
)
def q42_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_extendedprice", 0.25).alias("p25_price"),
        F.percentile("l_extendedprice", 0.75).alias("p75_price"),
    )


@register(
    "q43_scrape_parse",
    oracle="""
    WITH scraped AS (
        SELECT r_name AS sector,
               CAST(r_regionkey * 100 AS VARCHAR) || '.5 ' ||
                 (CASE WHEN r_regionkey % 2 = 0 THEN 'M' ELSE 'B' END) AS cell
        FROM region
    )
    SELECT sector,
           regexp_extract(cell, '([\\d,.]+)\\s*([MB])', 1) AS amount,
           regexp_extract(cell, '([\\d,.]+)\\s*([MB])', 2) AS magnitude
    FROM scraped
    """,
    survey_ref="A8/X4 scrape parse sector.py:187-207 (regex extract halves)",
)
def q43_scrape_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parse step of the ssga scrape as a column expression — the
    HTTP GET stays at the edge (io.parse_shares_outstanding_html wraps
    the same regex for edge-fetched rows)."""
    from stock_data_pipeline_spark.io import SHARES_OUTSTANDING_PATTERN

    r = load_table(spark, sf_dir, "region")
    cell = F.concat(
        (F.col("r_regionkey") * 100).cast("string"),
        F.lit(".5 "),
        F.when(F.col("r_regionkey") % 2 == 0, F.lit("M")).otherwise(F.lit("B")),
    )
    return r.select(
        F.col("r_name").alias("sector"),
        F.regexp_extract(cell, SHARES_OUTSTANDING_PATTERN, 1).alias("amount"),
        F.regexp_extract(cell, SHARES_OUTSTANDING_PATTERN, 2).alias("magnitude"),
    )



# ---------------------------------------------------------------------------
# Coverage batch 3: cube, semi-join, distinct aggs, ordered string agg,
# RANGE window frames, dedup-corpus materialization
# ---------------------------------------------------------------------------

@register(
    "q44_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    survey_ref="aggregation breadth: cube (all grouping-set combinations)",
)
def q44_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
    )


@register(
    "q45_semi_join",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (
        SELECT 1 FROM customer
        WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING'
    )
    """,
    survey_ref="join breadth: left-semi (EXISTS) — broadcastable filter side",
)
def q45_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "q46_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem GROUP BY 1
    """,
    survey_ref="aggregation breadth: multi distinct-agg (expand-based plan)",
)
def q46_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_items"),
    )


@register(
    "q47_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY 1
    """,
    survey_ref="aggregation breadth: ordered string agg (deterministic via sort)",
)
def q47_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is unordered — sort_array makes the concatenation
    deterministic (the only way a distributed string_agg can be
    reproducible)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "q48_range_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
                RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
    FROM orders
    """,
    survey_ref="window breadth: RANGE frame (30-day trailing spend; ROWS frames are W1)",
)
def q48_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer. RANGE frames bound by *value*
    (here epoch-day), not row count — orders on the same day share one
    frame, unlike a ROWS frame."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "day", F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-29, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("spend_30d"),
    )


@register(
    "q49_dedup_corpus",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
            FROM toks
        )
    ), sz AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b USING (sh)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.8
    )
    SELECT d.doc_id, d.lang FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.id_b = d.doc_id)
    """,
    survey_ref="extension: dedup-corpus materialization (keep canonical doc per dup cluster)",
)
def q49_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual product operation near-dup detection exists for:
    materialize the corpus minus near-duplicates, keeping the lowest
    doc_id of each pair as canonical. Anti-join against the pair set —
    no extra shuffle beyond the pair computation itself."""
    doc = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_prefix(doc, "doc_id", "text", n=3, threshold=0.8)
    dupes = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return doc.join(dupes, "doc_id", "left_anti").select("doc_id", "lang")



@register(
    "q50_token_frequency",
    oracle="""
    WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS token
        FROM documents
    ), freq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY 1
    )
    SELECT token, freq, CAST(rn AS INTEGER) AS rank FROM (
        SELECT token, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rn
        FROM freq
    ) WHERE rn <= 100
    """,
    survey_ref="extension: corpus vocabulary statistics (token frequency top-100)",
)
def q50_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency, top-100 with deterministic ties.
    One explode + one groupBy; the top-k runs as orderBy().limit() —
    Spark's TakeOrderedAndProject (per-partition heaps, no global sort,
    no single-partition window even when the vocabulary is millions of
    tokens) — then ranks are assigned over just the ≤100 survivors."""
    doc = load_table(spark, sf_dir, "documents")
    freq = (
        doc.select(F.explode(text.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    top = freq.orderBy(F.col("freq").desc(), F.col("token").asc()).limit(100)
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w)).select("token", "freq", "rank")


@register(
    "q51_length_histogram",
    oracle="""
    SELECT CAST(n_chars // 100 * 100 AS BIGINT) AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
    survey_ref="extension: corpus length histogram (training-data size profile)",
)
def q51_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return doc.groupBy(
        (F.floor(F.col("n_chars") / 100) * 100).cast("long").alias("bucket_lo")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )



@register(
    "q52_upsert",
    oracle="""
    WITH updates AS (
        SELECT l_orderkey AS o_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS val
        FROM lineitem GROUP BY 1
    )
    SELECT o_orderkey, val FROM updates
    UNION ALL
    SELECT o_orderkey, o_totalprice AS val FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey)
    """,
    survey_ref="B1/B2 append/replace semantics → MERGE-style upsert (anti-join + union)",
)
def q52_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE upsert: per-order lineitem revenue replaces the stored
    total; orders with no lineitems keep their old value."""
    from stock_data_pipeline_spark.operators.merge import upsert

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    existing = o.select("o_orderkey", F.col("o_totalprice").alias("val"))
    updates = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).cast("double").alias("val")
    )
    return upsert(existing, updates, ["o_orderkey"])


def _ivf_oracle(
    nlist: int = 16,
    nprobe: int = 6,
    k: int = 10,
    query_pred: str = "vec_id < 5",
) -> str:
    """DuckDB oracle for IVF-flat ANN — the whole pipeline is
    deterministic (first-nlist centroids, exact cosine folds,
    tie-broken ranks), so every stage is mechanical ANSI SQL.
    ``query_pred`` selects the query batch; the oracle is physical-
    shape-blind, so it also oracles the salted/bucketed probe variant
    (q395) — the salt provably never changes the candidate set."""
    return f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS centv FROM embeddings
        ORDER BY vec_id LIMIT {nlist}
    ), c AS (
        SELECT vec_id AS match_id, embedding AS cv FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE {query_pred}
    ), ca AS (
        SELECT match_id, cv, list_id FROM (
            SELECT match_id, cv, cent_id AS list_id,
                   ROW_NUMBER() OVER (PARTITION BY match_id
                                      ORDER BY cs DESC, cent_id ASC) AS rn
            FROM (SELECT match_id, cv, cent_id,
                         {_duck_cos("cv", "centv")} AS cs
                  FROM c CROSS JOIN cents)
        ) WHERE rn = 1
    ), qa AS (
        SELECT query_id, qv, list_id FROM (
            SELECT query_id, qv, cent_id AS list_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cs DESC, cent_id ASC) AS rn
            FROM (SELECT query_id, qv, cent_id,
                         {_duck_cos("qv", "centv")} AS cs
                  FROM q CROSS JOIN cents)
        ) WHERE rn <= {nprobe}
    ), scored AS (
        SELECT query_id, match_id,
               {_duck_cos("qv", "cv")} AS score
        FROM ca JOIN qa USING (list_id)
        WHERE query_id <> match_id
    )
    SELECT query_id, match_id, score, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, match_id ASC) AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "q53_ann_ivf_topk",
    headline=True,
    oracle=_ivf_oracle(nlist=16, nprobe=6, k=10),
    survey_ref="extension: IVF-flat ANN (inverted lists; the other scale "
    "path next to LSH) — fully deterministic, so it carries a complete "
    "value oracle; recall vs exact q28 additionally asserted in tests",
)
def q53_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.ivf_flat_topk(emb, queries, k=10, nlist=16, nprobe=6)



def _minhash_oracle(
    n: int = 3, num_perm: int = 64, bands: int = 16, star: bool = False
) -> str:
    """Generate the DuckDB oracle for portable-hash MinHash-LSH: the
    same shingles, polynomial shingle hash, permutation constants, and
    band folds as the Spark plan — all exact integer arithmetic, so the
    candidate set is value-verifiable end to end. ``star=True`` swaps
    the all-pairs bucket self-join for the bucket-star reduction
    (every member × the bucket MIN — q397's candidate-linear shape);
    the default tail is byte-identical to the pre-star generator, so
    q54's committed oracle text is unchanged."""
    from stock_data_pipeline_spark.llm.dedup import _MERSENNE_31, _perm_constants

    r = num_perm // bands
    consts = _perm_constants(num_perm)
    min_cols = ",\n               ".join(
        f"MIN((h * {a} + {b}) % {_MERSENNE_31}) AS h{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_selects = []
    for bidx in range(bands):
        expr = "CAST(0 AS BIGINT)"
        for j in range(bidx * r, bidx * r + r):
            expr = f"(({expr} * 31 + h{j}) % 1000000007)"
        band_selects.append(
            f"SELECT doc_id, {bidx} AS band_idx, {expr} AS band_hash FROM sig"
        )
    bands_sql = "\n            UNION ALL ".join(band_selects)
    ngram = " || ' ' || ".join(f"tk[i+{k}]" for k in range(n)).replace("tk[i+0]", "tk[i]")
    if star:
        tail = """SELECT min_id AS id_a, doc_id AS id_b FROM (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band_idx, band_hash) AS min_id
        FROM bands
    ) WHERE doc_id <> min_id
    GROUP BY 1, 2"""
    else:
        tail = """SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2"""
    return f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, greatest(len(tk) - {n - 1}, 0)),
                                         i -> {ngram})) AS sh
            FROM toks
        )
    ), shh AS (
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, length(sh)),
                                  i -> CAST(ord(substr(sh, i, 1)) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007) AS h
        FROM sh
    ), sig AS (
        SELECT doc_id,
               {min_cols}
        FROM shh GROUP BY doc_id
    ), bands AS (
        {bands_sql}
    )
    {tail}
    """


@register(
    "q54_minhash_lsh_verified",
    oracle=_minhash_oracle(n=3, num_perm=64, bands=16),
    headline=True,  # keeps the verification-twin path perf-visible
    # (r02: 8.6 s → r04: ~2.4 s sf0.1 idle after the 4x chunked
    # portable hash, commit f836e3f)
    survey_ref="extension: MinHash+LSH with a FULL value oracle — portable "
    "polynomial shingle hash + integer band folds reproduce every "
    "intermediate in ANSI SQL (q26 is the faster xxhash64 twin)",
)
def q54_minhash_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        doc, "doc_id", "text", n=3, num_perm=64, bands=16, portable_hash=True
    )


# ---------------------------------------------------------------------------
# Batch 4: resample bars, set ops, deterministic sampling, window nav,
# gap detection, grouping sets
# ---------------------------------------------------------------------------

@register(
    "q55_monthly_ohlc",
    oracle="""
    WITH base AS (
        SELECT user_id, strftime(date_trunc('month', ts), '%Y-%m') AS month,
               value,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('month', ts)
                                  ORDER BY ts, event_id) AS rna,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('month', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rnd
        FROM events
    )
    SELECT user_id, month,
           MAX(CASE WHEN rna = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rnd = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM base GROUP BY 1, 2
    """,
    survey_ref="W1/G family extension: resample a tick series to monthly OHLC "
    "bars (the reference's OHLCV daily grain, ticker.py:23-24, one level up)",
)
def q55_monthly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample (user, ts, value) ticks to monthly OHLC bars.

    open/close are picked by row_number over (ts, event_id) — a total
    order, so deterministic; high/low/count/sum are plain aggregates.
    One shuffle on (user_id, month); both window passes and the final
    aggregate share it (same partitioning keys).
    """
    ev = load_events(spark, sf_dir)
    base = ev.select(
        "user_id", F.date_trunc("month", "ts").alias("m"), "ts", "event_id", "value"
    )
    wa = Window.partitionBy("user_id", "m").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wd = Window.partitionBy("user_id", "m").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    marked = base.withColumn("rna", F.row_number().over(wa)).withColumn(
        "rnd", F.row_number().over(wd)
    )
    return (
        marked.groupBy("user_id", F.date_format("m", "yyyy-MM").alias("month"))
        .agg(
            F.max(F.when(F.col("rna") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias("close"),
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


@register(
    "q58_set_ops",
    oracle="""
    SELECT 'both' AS cohort, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    )
    UNION ALL
    SELECT 'only_1996' AS cohort, o_custkey FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    )
    """,
    survey_ref="§2-I set operations: row-level INTERSECT / EXCEPT (the "
    "reference's membership diffs, main.py:135-147, as data-level set ops)",
)
def q58_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer retention cohorts via INTERSECT / EXCEPT.

    Both set ops hash-partition on the full row (here one column), so
    the two branches share scan + shuffle shape; at scale they compile
    to aggregate-based semi/anti joins.
    """
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    both = y96.intersect(y97).select(F.lit("both").alias("cohort"), "o_custkey")
    only = y96.subtract(y97).select(F.lit("only_1996").alias("cohort"), "o_custkey")
    return both.unionByName(only)


@register(
    "q59_deterministic_sample",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS date, o_totalprice
    FROM orders
    WHERE (o_orderkey * 2654435761) % 4294967296 < 214748365
    """,
    survey_ref="extension: deterministic hash sampling (training-data "
    "pipelines need reproducible subsets; engine-portable multiplicative "
    "hash, not sample()/rand())",
)
def q59_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~5% reproducible sample: Knuth multiplicative hash of the key mod
    2^32 under a fixed cut. No rand() (not reproducible across engines,
    retries, or partitionings); the filter pushes to the scan and the
    sample is stable under re-partitioning — the property training-data
    splits (train/val/test) actually need.
    """
    o = load_table(spark, sf_dir, "orders")
    mixed = F.pmod(F.col("o_orderkey") * F.lit(2654435761), F.lit(4294967296))
    return o.filter(mixed < 214748365).select(
        "o_orderkey", _d("o_orderdate").alias("date"), "o_totalprice"
    )


@register(
    "q60_window_nav",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS date,
           FIRST_VALUE(o_totalprice) OVER wf AS first_price,
           LAST_VALUE(o_totalprice) OVER wf AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER wf AS second_price,
           LEAD(strftime(o_orderdate, '%Y-%m-%d'), 1) OVER w AS next_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    survey_ref="§2-G window nav family: first/last/nth_value + lead "
    "(G4's first-of-window scalar generalized; sectors.py:178)",
)
def q60_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation functions over a per-customer order timeline. All four
    are value copies (no arithmetic) over a total order — exact across
    engines. One shuffle on o_custkey serves every window."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        _d("o_orderdate").alias("date"),
        F.first("o_totalprice").over(wf).alias("first_price"),
        F.last("o_totalprice").over(wf).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
        F.lead(_d("o_orderdate"), 1).over(w).alias("next_date"),
    )


@register(
    "q61_gap_detection",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_us
        FROM events
    )
    SELECT user_id, ts_us, next_us,
           (next_us - ts_us) // 60000000 AS gap_min
    FROM seq
    WHERE next_us IS NOT NULL AND (next_us - ts_us) // 60000000 >= 120
    """,
    survey_ref="§2-G extension: sequence-gap detection (missing trading "
    "days / dead sensors; lead + integer µs arithmetic, no calendar "
    "boundary-count ambiguity)",
)
def q61_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps ≥ 2h between consecutive events per user. Exact integer µs
    math on the unit-normalized ts, same trick as q23 — both engines
    see identical values, no timestamp-diff semantics drift (DuckDB
    date_diff counts boundary crossings, Spark counts elapsed units;
    µs subtraction sidesteps both)."""
    from stock_data_pipeline_spark.catalog import load_events_us

    raw = load_events_us(spark, sf_dir).select(
        "user_id", "event_id", F.col("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = raw.withColumn("next_us", F.lead("ts_us").over(w)).withColumn(
        "gap_min", F.expr("(next_us - ts_us) div 60000000")
    )
    return seq.filter(F.col("next_us").isNotNull() & (F.col("gap_min") >= 120)).select(
        "user_id", "ts_us", "next_us", "gap_min"
    )


@register(
    "q62_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    survey_ref="§2-F extension: explicit GROUPING SETS (cube q44 / rollup "
    "q40 complete the grouping-analytics family); SQL entry point — the "
    "engine's DataFrame and SQL surfaces share Catalyst",
)
def q62_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (same Catalyst plan as
    the DataFrame API — one Expand + one aggregate, a single shuffle).
    The three null-patterns (ls-null / rf-null / both-null) are disjoint,
    so no grouping-id column is needed to disambiguate rows."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Batch 5: TF-IDF-style relevance, exact correlation, vector norms,
# chunking, redaction, dup clusters
# ---------------------------------------------------------------------------

@register(
    "q56_tfidf",
    headline=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
        GROUP BY 1, 2
    ), dfreq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS dfreq FROM tf GROUP BY 1
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, tok AS term,
               CAST(tf * n_docs AS DOUBLE) / CAST(dfreq AS DOUBLE) AS score
        FROM tf JOIN dfreq USING (tok), n
    )
    SELECT doc_id, term, score, rnk FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, term ASC) AS BIGINT) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
    survey_ref="extension: TF-IDF term relevance per document (text "
    "analysis family; rarity factor N/df kept ln-free so the score is a "
    "single exact int-ratio division — bit-identical across engines)",
)
def q56_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per document, scored tf × N/df.

    Shuffle shape: one groupBy (doc, term), one groupBy (term) for
    document frequency (partial-agged), broadcast of the corpus-count
    scalar, and a per-doc window for top-3. The df table is the skew
    hazard at 100 TB (stopword rows) — but it is bounded by vocabulary,
    not corpus, size.
    """
    doc = load_table(spark, sf_dir, "documents")
    tf = (
        doc.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    ndocs = doc.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("dfreq").cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "score", "rnk")
    )


@register(
    "q57_corr_decimal",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sx,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sy,
               SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
                   * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sxy,
               SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
                   * CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sxx,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS syy
        FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag,
           (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE) - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
             AS corr_qty_price
    FROM s
    """,
    survey_ref="§2-F extension: Pearson correlation with exact integer "
    "moment sums (cents as BIGINT) — order-independent, hash-matchable; "
    "built-in corr() drifts at the ulp level between engines",
)
def q57_corr_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation of quantity vs extended price per return flag.

    The five moment sums are exact integer arithmetic (2-dp money →
    cents) accumulated in DECIMAL(38,0) — order-independent under any
    partitioning AND overflow-safe far past sf1000 (cents² sums in
    BIGINT run out of headroom around sf1 under ANSI mode; DuckDB's
    BIGINT sum widens to HUGEINT, so only the Spark side would throw).
    Only the final closed-form expression runs in floating point, on
    identical exact-integer operands in both engines (decimal/HUGEINT →
    double and each IEEE op are correctly rounded → bit-identical).
    """
    li = load_table(spark, sf_dir, "lineitem")
    xd = (_dec("l_quantity") * 100).cast("decimal(18,0)")
    yd = (_dec("l_extendedprice") * 100).cast("decimal(18,0)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"),          # decimal(28,0)
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),    # product decimal(37,0) → sum decimal(38,0)
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(d("n") * d("sxx") - d("sx") * d("sx")) * F.sqrt(
        d("n") * d("syy") - d("sy") * d("sy")
    )
    return s.select("l_returnflag", (num / den).alias("corr_qty_price"))


@register(
    "q63_vector_norms",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a, b) -> a + b)) AS l2_norm
    FROM embeddings
    """,
    survey_ref="extension: vector L2 norms (embedding hygiene checks — "
    "zero/degenerate vectors poison cosine ANN); exact left-fold doubles",
)
def q63_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm over the embedding column — narrow, zero
    shuffle, whole-stage codegen; the fold is left-to-right from an
    exact 0.0 seed so both engines produce bit-identical doubles
    (sqrt is IEEE correctly-rounded)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.sqrt(sq_sum).alias("l2_norm"),
    )


@register(
    "q64_chunking",
    headline=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), sized AS (
        SELECT doc_id, tk, len(tk) AS n_tok FROM toks WHERE len(tk) > 0
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(least(50, n_tok - i * 40) AS BIGINT) AS n_chunk_tokens,
           array_to_string(tk[i * 40 + 1 : least(i * 40 + 50, n_tok)], ' ') AS chunk_text
    FROM (SELECT doc_id, tk, n_tok,
                 unnest(generate_series(0, CAST((n_tok - 1) // 40 AS INTEGER))) AS i
          FROM sized)
    """,
    survey_ref="extension: overlapping token-window chunking (50-token "
    "chunks, stride 40) — the canonical LLM-training preprocessing step",
)
def q64_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into 50-token chunks with 10-token overlap.

    Row-local: tokenize once, then posexplode a transformed index range —
    no shuffle at all; output rows ≈ tokens/40 per doc. At 100 TB this
    is a pure map stage that pipelines into whatever sink follows.
    """
    doc = load_table(spark, sf_dir, "documents")
    sized = (
        doc.select("doc_id", text.tokens(F.col("text")).alias("tk"))
        .withColumn("n_tok", F.size("tk"))
        .filter(F.col("n_tok") > 0)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), F.floor((F.col("n_tok") - 1) / 40).cast("int")),
        lambda i: F.array_join(F.slice("tk", i * 40 + 1, F.lit(50)), " "),
    )
    return sized.select(
        "doc_id",
        "n_tok",
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long"),
        F.least(F.lit(50), F.col("n_tok") - F.col("chunk_idx") * 40)
        .cast("long")
        .alias("n_chunk_tokens"),
        "chunk_text",
    )


@register(
    "q65_redact",
    oracle="""
    SELECT doc_id,
           regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_redactions
    FROM documents
    """,
    survey_ref="extension: pattern redaction / text cleaning (PII-style "
    "scrub as a narrow map; regexp_replace + regexp_count)",
)
def q65_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact digit runs from document text and count the redactions —
    the text-cleaning shape of a PII scrub (the real pattern set is a
    config concern, the plan is the same narrow map; zero shuffle)."""
    doc = load_table(spark, sf_dir, "documents")
    return doc.select(
        "doc_id",
        F.regexp_replace("text", "[0-9]+", "<NUM>").alias("redacted"),
        F.regexp_count("text", F.lit("[0-9]+")).cast("long").alias("n_redactions"),
    )


@register(
    "q66_dup_clusters",
    headline=True,
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
            FROM toks
        )
    ), sz AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
    ), pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
            FROM sh a JOIN sh b USING (sh)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        ) i
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.8
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b AS u, id_a AS v FROM pairs
    ), reach AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS vertex, LEAST(u, MIN(v)) AS cluster_id
    FROM reach GROUP BY u
    """,
    survey_ref="extension: near-dup cluster assignment — connected "
    "components by iterative min-label propagation (Spark) vs recursive "
    "CTE transitive closure (oracle); the keep-one-per-cluster step of "
    "corpus dedup",
)
def q66_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group near-dup pairs (trigram Jaccard ≥ 0.8) into clusters: each
    doc in any pair gets the component-minimum doc_id as cluster id.
    The Spark side is a genuinely iterative algorithm — propagate +
    pointer-jump rounds (O(log diameter)), disk-checkpointed between
    rounds so neither lineage nor executor memory grows with iteration
    count — exactly the shape Spark handles that single-pass SQL
    cannot; the oracle reproduces it with a recursive CTE. The
    convergence loop necessarily runs Spark jobs while "building" this
    query — the registry's one documented exception to action-free
    plan construction."""
    doc = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_prefix(doc, "doc_id", "text", n=3, threshold=0.8)
    return dedup.connected_components(pairs.select("id_a", "id_b"))


# ---------------------------------------------------------------------------
# Batch 6: technical indicators (operators.indicators) — the reference's
# chart family (sectors.py:167-204, 5/10/20/50-day windows) extended to
# the standard stock-pipeline indicator set, each with an exact oracle.
# ---------------------------------------------------------------------------

@register(
    "q67_vwap",
    oracle="""
    WITH c AS (
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
               CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc
        FROM lineitem
    )
    SELECT ship_month, l_returnflag,
           CAST(SUM(pc * qc) AS DOUBLE) / CAST(SUM(qc) AS DOUBLE) / 100.0 AS vwap,
           CAST(SUM(qc) AS DOUBLE) / 100.0 AS total_qty
    FROM c GROUP BY 1, 2
    """,
    survey_ref="G2 weighted sum (sector.py:91-95) as classic VWAP: exact "
    "int64 moment sums, one division per group in double",
)
def q67_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly VWAP per return flag. Both sums are exact cents — partial
    (map-side) aggregation is order-independent, so the plan is a single
    hash-agg shuffle on (month, flag) regardless of parallelism."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        "l_returnflag",
        "l_extendedprice",
        "l_quantity",
    )
    return indicators.vwap(li, ["ship_month", "l_returnflag"], "l_extendedprice", "l_quantity")


@register(
    "q68_ema",
    headline=True,
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(o_totalprice AS DOUBLE) AS p,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ), rec AS (
        SELECT o_custkey, o_orderkey, order_date, rn, p AS ema
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.o_custkey, s.o_orderkey, s.order_date, s.rn,
               0.25 * s.p + 0.75 * r.ema
        FROM rec r JOIN seq s ON s.o_custkey = r.o_custkey AND s.rn = r.rn + 1
    )
    SELECT o_custkey, o_orderkey, order_date, ema FROM rec
    """,
    survey_ref="W1 SMA family (functions.py rolling windows) extended to "
    "the sequential EMA recurrence: O(n)-per-key applyInPandas scan "
    "(indicators.ema_linear) vs recursive-CTE oracle, bit-identical "
    "doubles (exact α=0.25); the all-JVM collect_list fold remains the "
    "small-series strategy behind the same dispatcher",
)
def q68_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA (α=0.25) of order totals per customer, ordered by (date, key).

    Sequential recurrences are the one window shape plain SQL lacks.
    Ships the scale-safe linear strategy (orders-per-customer grows
    with data size, so no small-series bound can be asserted): one
    shuffle on o_custkey, then an O(n) per-key Arrow scan replaying
    the identical IEEE op sequence the recursive-CTE oracle executes —
    the match stays bit-exact, and a hot key costs linear, not
    quadratic, work."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", _d("o_orderdate").alias("order_date"), "o_totalprice"
    )
    out = indicators.ema(o, ["o_custkey"], ["order_date", "o_orderkey"], "o_totalprice")
    return out.select("o_custkey", "o_orderkey", "order_date", "ema")


@register(
    "q69_drawdown",
    headline=True,
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           MAX(CAST(o_totalprice AS DOUBLE)) OVER w AS peak,
           (CAST(o_totalprice AS DOUBLE) - MAX(CAST(o_totalprice AS DOUBLE)) OVER w)
             / MAX(CAST(o_totalprice AS DOUBLE)) OVER w AS drawdown_pct
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING)
    """,
    survey_ref="extension of W4 pct-vs-first (sectors.py percent charts): "
    "running-peak drawdown — cumulative MAX is exact, division on "
    "identical doubles",
)
def q69_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown-from-running-peak per customer order series."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", _d("o_orderdate").alias("order_date"), "o_totalprice"
    )
    out = indicators.drawdown(o, ["o_custkey"], ["order_date", "o_orderkey"], "o_totalprice")
    return out.select("o_custkey", "o_orderkey", "order_date", "peak", "drawdown_pct")


@register(
    "q70_bollinger",
    oracle="""
    WITH c AS (
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
        FROM orders
    ), m AS (
        SELECT o_custkey, o_orderkey, order_date,
               CAST(COUNT(xc) OVER w AS DOUBLE) AS cnt,
               CAST(SUM(xc) OVER w AS DOUBLE) AS sx,
               -- via VARCHAR: DuckDB's int128→double truncates at rare
               -- near-ties where cents² sums need >53 bits; strtod is
               -- correctly rounded (matches Spark's decimal→double)
               CAST(CAST(SUM(xc * xc) OVER w AS VARCHAR) AS DOUBLE) AS sxx
        FROM c
        WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT o_custkey, o_orderkey, order_date,
           sx / cnt / 100.0 AS bb_mid,
           sx / cnt / 100.0 + 2.0 * sqrt(CASE WHEN cnt >= 2
               THEN (cnt * sxx - sx * sx) / (cnt * (cnt - 1.0)) / 10000.0 END) AS bb_upper,
           sx / cnt / 100.0 - 2.0 * sqrt(CASE WHEN cnt >= 2
               THEN (cnt * sxx - sx * sx) / (cnt * (cnt - 1.0)) / 10000.0 END) AS bb_lower
    FROM m
    """,
    survey_ref="W1 SMA + dispersion: Bollinger bands from exact integer "
    "window moments (q57 technique in a moving frame); NULL until ≥2 rows",
)
def q70_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row Bollinger bands over each customer's order-total series."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", _d("o_orderdate").alias("order_date"), "o_totalprice"
    )
    out = indicators.bollinger(
        o, ["o_custkey"], ["order_date", "o_orderkey"], "o_totalprice", n=5
    )
    return out.select(
        "o_custkey", "o_orderkey", "order_date", "bb_mid", "bb_upper", "bb_lower"
    )


@register(
    "q71_rsi",
    oracle="""
    WITH c AS (
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS xc
        FROM orders
    ), d AS (
        SELECT *, xc - LAG(xc) OVER (PARTITION BY o_custkey
                                     ORDER BY order_date, o_orderkey) AS diff
        FROM c
    ), g AS (
        SELECT o_custkey, o_orderkey, order_date,
               SUM(CASE WHEN diff IS NULL THEN NULL
                        ELSE GREATEST(diff, 0) END) OVER w AS sg,
               SUM(CASE WHEN diff IS NULL THEN NULL
                        ELSE GREATEST(0 - diff, 0) END) OVER w AS sl
        FROM d
        WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date, o_orderkey
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT o_custkey, o_orderkey, order_date,
           CASE WHEN sl = 0 THEN 100.0
                ELSE 100.0 - 100.0 / (1.0 + CAST(sg AS DOUBLE) / CAST(sl AS DOUBLE))
           END AS rsi
    FROM g
    """,
    survey_ref="W2 lag-delta (lag_pct_change) composed into Cutler's RSI: "
    "exact cent deltas, window sums in int64, one double ratio at the end",
)
def q71_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row RSI over each customer's order-total series (100 = no
    losses in frame, NULL until a prior row exists)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", _d("o_orderdate").alias("order_date"), "o_totalprice"
    )
    out = indicators.rsi(o, ["o_custkey"], ["order_date", "o_orderkey"], "o_totalprice", n=5)
    return out.select("o_custkey", "o_orderkey", "order_date", "rsi")


def _simhash_oracle(max_hamming: int = 3, bits: int = 64) -> str:
    """Generate the DuckDB oracle for portable-hash SimHash pairs: the
    same tokens, polynomial token hash, universal-family parity votes,
    bit sums, 16-bit block candidates, and hamming distance as the
    Spark plan (dedup.simhash_pairs(portable_hash=True)) — all exact
    integer arithmetic. The 64-bit fingerprint is carried as two 32-bit
    halves because DuckDB's BIGINT left-shift throws on 1<<63."""
    from stock_data_pipeline_spark.llm.dedup import _MERSENNE_31, _perm_constants

    consts = _perm_constants(bits)
    vote_cols = ",\n               ".join(
        f"SUM(CASE WHEN ((h * {a} + {b}) % {_MERSENNE_31}) % 2 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i, (a, b) in enumerate(consts)
    )
    lo = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))
    hi = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << (j - 32)} ELSE 0 END)" for j in range(32, 64))
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
        FROM documents
    ), th AS (
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, length(tok)),
                                  i -> CAST(ord(substr(tok, i, 1)) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007) AS h
        FROM toks
    ), sig AS (
        SELECT doc_id,
               {vote_cols}
        FROM th GROUP BY doc_id
    ), fp AS (
        SELECT doc_id, CAST({lo} AS BIGINT) AS lo, CAST({hi} AS BIGINT) AS hi FROM sig
    ), blocks AS (
        SELECT doc_id, 0 AS block_idx, lo % 65536 AS bv FROM fp
        UNION ALL SELECT doc_id, 1, lo // 65536 FROM fp
        UNION ALL SELECT doc_id, 2, hi % 65536 FROM fp
        UNION ALL SELECT doc_id, 3, hi // 65536 FROM fp
    ), cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM blocks a JOIN blocks b ON a.block_idx = b.block_idx AND a.bv = b.bv
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT id_a, id_b, hamming FROM (
        SELECT cand.id_a, cand.id_b,
               CAST(bit_count(xor(fa.lo, fb.lo)) + bit_count(xor(fa.hi, fb.hi)) AS INTEGER) AS hamming
        FROM cand
        JOIN fp fa ON fa.doc_id = cand.id_a
        JOIN fp fb ON fb.doc_id = cand.id_b
    ) WHERE hamming <= {max_hamming}
    """


@register(
    "q73_simhash_verified",
    oracle=_simhash_oracle(max_hamming=3),
    survey_ref="extension: SimHash near-dup with a FULL value oracle — "
    "portable polynomial token hash + universal-family parity votes "
    "reproduce fingerprints, blocks, and hamming in ANSI SQL "
    "(q27 is the faster xxhash64 twin)",
)
def q73_simhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(
        doc, "doc_id", "text", max_hamming=3, blocks=4, portable_hash=True
    )


@register(
    "q74_ann_lsh_verified",
    oracle=_ann_lsh_oracle(num_planes=3, num_tables=10, dim=64, k=10),
    survey_ref="extension: hyperplane-LSH ANN with a FULL value oracle — "
    "the same literal dyadic plane weights embedded in both plans make "
    "buckets and rerank scores bit-reproducible (q29 is the "
    "hashed-weights twin; recall-vs-exact asserted in tests)",
)
def q74_ann_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    return similarity.ann_lsh_topk(
        emb, qs, k=10, num_planes=3, num_tables=10,
        portable_weights=similarity.portable_plane_weights(10, 3, 64),
    )


@register(
    "q72_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE (doc_id * 2654435761) % 4294967296 <
          CASE WHEN lang = 'en' THEN 429496730 ELSE 2147483648 END
    """,
    survey_ref="extension: stratified deterministic sampling — per-class "
    "rates (en 10%, rest 50%) rebalance a skewed corpus reproducibly; "
    "the q59 multiplicative hash with a per-stratum cut",
)
def q72_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing stratified sample of the documents corpus:
    the majority class (en) keeps ~10%, minority languages keep ~50% —
    the standard class-balance step before training-data tokenization.

    Same multiplicative-hash determinism as q59 (stable under retries,
    re-partitioning, and engine choice — what rand()/sample() can't
    give); the per-stratum cut is a single CASE, so the whole predicate
    pushes into the scan and no shuffle happens at all. At doc_id
    beyond ~2^32 swap the multiply for xxhash64 (q26/q33 pattern) to
    stay in int64 range under ANSI.
    """
    d = load_table(spark, sf_dir, "documents")
    mixed = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296))
    cut = F.when(F.col("lang") == "en", F.lit(429496730)).otherwise(F.lit(2147483648))
    return d.filter(mixed < cut).select("doc_id", "lang", "source")


@register(
    "q75_bpe_pair_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), prs AS (
        SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
                      i -> {'lt': tk[i], 'rt': tk[i + 1]})) AS p
        FROM toks WHERE len(tk) > 1
    ), cnt AS (
        SELECT p.lt AS left_tok, p.rt AS right_tok,
               CAST(COUNT(*) AS BIGINT) AS pair_count
        FROM prs GROUP BY 1, 2
    )
    SELECT left_tok, right_tok, pair_count, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC,
                       left_tok ASC, right_tok ASC) AS INTEGER) AS rank
        FROM cnt
    ) WHERE rank <= 40
    """,
    survey_ref="extension: adjacent-token-pair frequencies — the counting "
    "step of one BPE/WordPiece merge iteration over the corpus",
)
def q75_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent adjacent token pairs — the statistic a BPE trainer
    computes every merge round (vocabulary induction over the corpus).

    Pairs are built row-locally (transform over the token index range —
    no self-join on position, no shuffle before the count); the top-k
    is orderBy().limit() = TakeOrderedAndProject (per-partition heaps,
    no global sort) exactly like q50, then ranks are assigned over the
    ≤40 survivors. At 100 TB the only shuffle is the pair-count
    aggregate, map-side combined on (left, right).
    """
    doc = load_table(spark, sf_dir, "documents")
    tk = doc.select(text.tokens(F.col("text")).alias("tk")).filter(F.size("tk") > 1)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("tk") - 1),
        lambda i: F.struct(
            F.element_at("tk", i).alias("lt"), F.element_at("tk", i + 1).alias("rt")
        ),
    )
    cnt = (
        tk.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lt").alias("left_tok"), F.col("p.rt").alias("right_tok"))
        .agg(F.count("*").alias("pair_count"))
    )
    top = cnt.orderBy(
        F.col("pair_count").desc(), F.col("left_tok").asc(), F.col("right_tok").asc()
    ).limit(40)
    w = Window.orderBy(
        F.col("pair_count").desc(), F.col("left_tok").asc(), F.col("right_tok").asc()
    )
    return top.withColumn("rank", F.row_number().over(w))


@register(
    "q76_sequence_packing",
    oracle="""
    WITH sized AS (
        SELECT source, doc_id,
               CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
                    AS BIGINT) AS n_tok
        FROM documents
    )
    SELECT source, doc_id, n_tok,
           CAST((run - n_tok) // 2048 AS BIGINT) AS pack_id,
           CAST((run - n_tok) % 2048 AS BIGINT) AS pack_offset
    FROM (
        SELECT source, doc_id, n_tok,
               CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
                    AS BIGINT) AS run
        FROM sized
    )
    """,
    survey_ref="extension: sequence packing — deterministic assignment of "
    "documents into fixed 2048-token training contexts",
)
def q76_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed 2048-token training contexts: each doc
    gets the context id and intra-context offset where its tokens start,
    filling contexts contiguously in doc order (docs may straddle a
    boundary — the standard pre-tokenization packing layout).

    Pure integer math over one running sum — the plan is integer-only
    end-to-end (``div``, not float ``/``; hardened after r03's
    unreproduced driver hash fail so no float op remains to suspect).
    The window partitions by ``source`` (packing is per-shard, as a
    real pipeline packs per input shard so shards stay independently
    reshufflable) — so there is no global single-partition window;
    scale-out is the number of sources.
    """
    doc = load_table(spark, sf_dir, "documents")
    sized = doc.select(
        "source", "doc_id", F.size(text.tokens(F.col("text"))).cast("long").alias("n_tok")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    run = F.sum("n_tok").over(w)
    start = (run - F.col("n_tok")).alias("start")
    return sized.select("source", "doc_id", "n_tok", start).select(
        "source",
        "doc_id",
        "n_tok",
        F.expr("start div 2048").alias("pack_id"),
        F.pmod(F.col("start"), F.lit(2048)).cast("long").alias("pack_offset"),
    )


def _contamination_oracle(n: int = 8, min_overlap: float = 0.5) -> str:
    """DuckDB oracle for q77: identical word-8-gram construction and
    polynomial shingle hash (base 31 mod 1e9+7 over the characters of
    the space-joined shingle) as the Spark plan, then the same
    distinct-hash overlap count and integer→double division."""
    return f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - {n} + 1),
                       i -> array_to_string(tk[i:i+{n}-1], ' '))) AS s
        FROM toks WHERE len(tk) >= {n}
    ), hashed AS (
        SELECT DISTINCT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, length(s)),
                                  i -> CAST(ord(substr(s, i, 1)) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007) AS h
        FROM sh
    ), bench AS (
        SELECT doc_id AS bench_id, h FROM hashed WHERE doc_id % 50 = 0
    ), corpus AS (
        SELECT doc_id, h FROM hashed WHERE doc_id % 50 <> 0
    ), totals AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM corpus GROUP BY 1
    ), overlap AS (
        SELECT corpus.doc_id, bench.bench_id, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM corpus JOIN bench USING (h) GROUP BY 1, 2
    )
    SELECT doc_id, bench_id, n_common, n_shingles,
           CAST(n_common AS DOUBLE) / n_shingles AS overlap_frac
    FROM overlap JOIN totals USING (doc_id)
    WHERE CAST(n_common AS DOUBLE) / n_shingles >= {min_overlap}
    """


@register(
    "q77_contamination",
    oracle=_contamination_oracle(n=8, min_overlap=0.5),
    survey_ref="extension: benchmark-contamination detection — distinct "
    "word-8-gram overlap of every corpus doc against a benchmark set, "
    "flagging docs whose shingles are mostly contained in a benchmark doc",
)
def q77_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag corpus documents contaminated by a benchmark set (here: the
    doc_id % 50 == 0 slice standing in for an eval benchmark): for each
    (corpus doc, benchmark doc) pair sharing ≥50% of the corpus doc's
    distinct word-8-grams, emit the overlap.

    Candidates come from an equi-join on the 8-gram hash — shuffle ∝
    postings (shingle occurrences), never corpus × benchmark; the
    benchmark side of a real run is small and broadcasts. The portable
    polynomial hash keeps the whole pipeline value-verifiable; swap for
    xxhash64 at production scale (q25/q54 pattern).
    """
    from stock_data_pipeline_spark.llm.dedup import portable_ngram_hashes, _spread

    doc = load_table(spark, sf_dir, "documents")
    tk = _spread(doc, "doc_id").select(
        "doc_id", text.tokens(F.col("text")).alias("tk")
    ).filter(F.size("tk") >= 8)
    # composed per-token hashing (r09) — same values as the string
    # shape, ~3× less char-level work; see portable_ngram_hashes
    hashed = portable_ngram_hashes(tk, "doc_id", "tk", 8).distinct()
    bench = hashed.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "h"
    )
    corpus = hashed.filter(F.col("doc_id") % 50 != 0)
    totals = corpus.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    overlap = (
        corpus.join(bench, "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_common"))
    )
    frac = F.col("n_common").cast("double") / F.col("n_shingles")
    return (
        overlap.join(totals, "doc_id")
        .withColumn("overlap_frac", frac)
        .filter(F.col("overlap_frac") >= 0.5)
        .select("doc_id", "bench_id", "n_common", "n_shingles", "overlap_frac")
    )


def _corpus_filter_oracle(quality_cut: float = 0.5, min_tok: int = 10, max_tok: int = 5000) -> str:
    """Composed oracle for q78: the q49 near-dup pair block, the q30
    language-ID scoring, and the q31 quality expression chained into one
    pipeline — each stage already hash-matches on its own, so the
    composition is mechanical."""
    from stock_data_pipeline_spark.llm.text import LANG_MARKERS

    tk = _duck_tokens()
    hits = {
        lang: _LANG_HIT.format(tk=tk, lst=str(markers))
        for lang, markers in LANG_MARKERS.items()
    }
    hit_cols = ",\n               ".join(f"{h} AS {lang}_hits" for lang, h in hits.items())
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"{lang}_hits" for lang in langs) + ")"
    whens = " ".join(f"WHEN {lang}_hits = {best} THEN '{lang}'" for lang in langs)
    quality = f"""0.4 * least(CAST(len({tk}) AS DOUBLE) / 100.0, 1.0)
           + 0.3 * (CAST(len(list_filter({tk}, t -> list_contains(
                 ['the','and','of','to','a','in','is','it','that','for','on','with','as','at','by'],
                 lower(t)))) AS DOUBLE)
               / CAST(greatest(len({tk}), 1) AS DOUBLE))
           + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
               / CAST(greatest(length(text), 1) AS DOUBLE))"""
    return f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
            FROM toks
        )
    ), sz AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b USING (sh)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.8
    ), keep AS (
        SELECT d.* FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.id_b = d.doc_id)
    ), scored AS (
        SELECT doc_id,
               {hit_cols},
               CAST(len({tk}) AS BIGINT) AS n_tokens,
               {quality} AS quality
        FROM keep
    )
    SELECT doc_id, n_tokens, quality FROM scored
    WHERE (CASE WHEN {best} = 0 THEN 'und' {whens} END) = 'en'
      AND quality >= {quality_cut}
      AND n_tokens BETWEEN {min_tok} AND {max_tok}
    """


@register(
    "q78_corpus_filter_pipeline",
    oracle=_corpus_filter_oracle(quality_cut=0.5, min_tok=10, max_tok=5000),
    survey_ref="extension: composed C4-style cleanup — near-dup removal + "
    "language-ID + quality cut + length bounds as ONE declarative plan "
    "(each stage is an independently hash-verified operator)",
)
def q78_corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus cleanup a C4-style pipeline runs:
    drop near-duplicates (trigram Jaccard ≥ 0.8, keep lowest doc_id),
    keep docs *predicted* English, quality ≥ 0.5, 10–5000 tokens.

    Composition is free in Spark: every stage is a declarative operator,
    so Catalyst sees ONE plan — the scalar filters (lang, quality,
    length) run in the same codegen'd scan pass, and only the near-dup
    anti-join adds its (already postings-bounded) shuffles. No
    stage-by-stage materialization like a pandas pipeline would pay.
    """
    doc = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_prefix(doc, "doc_id", "text", n=3, threshold=0.8)
    dupes = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = doc.join(dupes, "doc_id", "left_anti")
    scored = kept.select(
        "doc_id",
        text.lang_id("text").alias("lang_pred"),
        text.token_count("text").cast("long").alias("n_tokens"),
        text.quality_score("text").alias("quality"),
    )
    return scored.filter(
        (F.col("lang_pred") == "en")
        & (F.col("quality") >= 0.5)
        & F.col("n_tokens").between(10, 5000)
    ).select("doc_id", "n_tokens", "quality")


@register(
    "q79_domain_mixing",
    oracle="""
    WITH cnt AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1
    ), mn AS (
        SELECT MIN(c) AS mc FROM cnt
    ), thr AS (
        SELECT lang,
               CAST(floor(CAST(mc AS DOUBLE) / c * 4294967296) AS BIGINT) AS thr
        FROM cnt, mn
    )
    SELECT d.doc_id, d.lang FROM documents d JOIN thr USING (lang)
    WHERE (d.doc_id * 2654435761) % 4294967296 < thr
    """,
    survey_ref="extension: domain-mixing resample — deterministic per-domain "
    "downsampling to the smallest domain's size (uniform mixture weights; "
    "domain = language, the skewed axis of this corpus)",
)
def q79_domain_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus mixture: downsample every domain (language
    here — the skewed axis) to the smallest domain's expected size — the
    mixture-weighting step before training-data tokenization, done with
    the q59/q72 multiplicative hash so the sample is reproducible under
    retries and repartitioning.

    The per-domain rate table is tiny (one row per domain): built with
    two aggregates and joined back via broadcast — the corpus itself is
    touched in a single scan+filter pass, no corpus-sized shuffle.
    """
    doc = load_table(spark, sf_dir, "documents")
    cnt = doc.groupBy("lang").agg(F.count("*").alias("c"))
    mn = cnt.agg(F.min("c").alias("mc"))
    thr = cnt.crossJoin(F.broadcast(mn)).select(
        "lang",
        F.floor(F.col("mc").cast("double") / F.col("c") * F.lit(4294967296)).alias("thr"),
    )
    mixed = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296))
    return (
        doc.join(F.broadcast(thr), "lang")
        .filter(mixed < F.col("thr"))
        .select("doc_id", "lang")
    )


def _kmeans_oracle(
    k: int = 8,
    rounds: int = 2,
    dim: int = 64,
    bits: int = 10,
    final_select: str | None = None,
) -> str:
    """DuckDB oracle for q80: unrolled Lloyd rounds. Quantization makes
    every per-cluster per-dimension sum exact int64 (order-independent),
    centroid means one double division of identical operands, and the
    distance² fold runs in the same left-to-right order as the Spark
    plan — each round reproduces bit-identically."""
    scale = 1 << bits

    def dist(qv: str, cv: str) -> str:
        return f"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, {dim}),
                   i -> (CAST({qv}[i] AS DOUBLE) - {cv}[i]) * (CAST({qv}[i] AS DOUBLE) - {cv}[i]))),
               (a, b) -> a + b)"""

    parts = [
        f"""q AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS qv
        FROM embeddings
    ), c0 AS (
        SELECT CAST(rn - 1 AS INTEGER) AS cid, list_transform(qv, x -> CAST(x AS DOUBLE)) AS cv
        FROM (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) AS rn, qv FROM q) t
        WHERE rn <= {k}
    )"""
    ]
    for r in range(rounds):
        prev = f"c{r}"
        parts.append(f"""a{r + 1} AS (
        SELECT vec_id, qv, cid, dist2 FROM (
            SELECT q.vec_id, q.qv, {prev}.cid,
                   {dist("q.qv", f"{prev}.cv")} AS dist2,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY {dist("q.qv", f"{prev}.cv")} ASC, {prev}.cid ASC) AS rn
            FROM q CROSS JOIN {prev}
        ) WHERE rn = 1
    )""")
        if r < rounds - 1:
            parts.append(f"""sums{r + 1} AS (
        SELECT cid, i, SUM(qv[i]) AS s FROM a{r + 1}, generate_series(1, {dim}) AS g(i)
        GROUP BY 1, 2
    ), cnt{r + 1} AS (
        SELECT cid, COUNT(*) AS n FROM a{r + 1} GROUP BY 1
    ), c{r + 1} AS (
        SELECT cid, list_transform(list(s ORDER BY i), s -> CAST(s AS DOUBLE) / n) AS cv
        FROM sums{r + 1} JOIN cnt{r + 1} USING (cid)
        GROUP BY cid, n
    )""")
    final = final_select or f"SELECT vec_id, cid AS cluster_id, dist2 FROM a{rounds}"
    return "\n    WITH " + ",\n    ".join(parts) + f"\n    {final}\n    "


@register(
    "q80_kmeans",
    oracle=_kmeans_oracle(k=8, rounds=2, dim=64, bits=10),
    survey_ref="extension: fixed-round Lloyd k-means over quantized "
    "embeddings — iterative ML as unrolled declarative rounds "
    "(broadcast assignment, exact-integer centroid sums), with a FULL "
    "value oracle",
)
def q80_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_pipeline_spark.llm.clustering import kmeans_fixed

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fixed(emb, "vec_id", "embedding", k=8, rounds=2, quant_bits=10)


@register(
    "q81_range_join",
    headline=True,
    oracle="""
    WITH ivl AS (
        SELECT o_orderkey,
               datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS w_start
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000
    )
    SELECT i.o_orderkey,
           CAST(i.w_start AS BIGINT) AS w_start,
           COUNT(*) AS n_shipped,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM ivl i JOIN lineitem l
      ON datediff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE))
         BETWEEN i.w_start AND i.w_start + 7
    GROUP BY 1, 2
    """,
    survey_ref="extension: range (interval) join — Spark's BETWEEN join "
    "predicate is a nested-loop; bucketization turns it into an "
    "equi-join (rangejoin.py), the lakehouse 'range join hint' pattern",
)
def q81_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per high-value urgent order: lineitems (corpus-wide) shipped in
    the 8-day window starting at the order date. Points = lineitem ship
    days, intervals = [order day, order day + 7]; bucket=8 so each
    interval explodes to ≤2 buckets.

    The decomposable aggregate (COUNT/SUM keyed by interval-side
    columns) is pushed BELOW the range join: lineitem first collapses
    to one row per ship day (count + exact decimal sum — both
    reassociate), and the bucketed join then matches days, not items.
    The join input shrinks from |lineitem| to |distinct days| — at
    100 TB that is the difference between joining the fact table and
    joining a few thousand rows; measured ~4× here. The same rewrite
    is invalid for non-decomposable aggs (exact medians) — those pay
    the row-level join.
    """
    from stock_data_pipeline_spark.operators.rangejoin import bucketed_range_join

    epoch = F.lit("1970-01-01").cast("date")
    ivl = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 400000))
        .select(
            "o_orderkey",
            F.datediff(F.col("o_orderdate").cast("date"), epoch).cast("long").alias("w_start"),
        )
        .withColumn("w_end", F.col("w_start") + F.lit(7))
    )
    days = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.datediff(F.col("l_shipdate").cast("date"), epoch)
            .cast("long")
            .alias("ship_day"),
            "l_quantity",
        )
        .groupBy("ship_day")
        .agg(
            F.count(F.lit(1)).alias("day_n"),
            F.sum(_dec("l_quantity")).alias("day_qty"),
        )
    )
    joined = bucketed_range_join(days, ivl, "ship_day", "w_start", "w_end", bucket=8)
    return joined.groupBy("o_orderkey", "w_start").agg(
        F.sum("day_n").cast("long").alias("n_shipped"),
        F.sum("day_qty").cast("double").alias("sum_qty"),
    )


@register(
    "q82_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY 1
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 1 HOUR
        GROUP BY 1
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL 24 HOUR
        GROUP BY 1
    )
    SELECT '1_view' AS step, COUNT(*) AS n_users FROM v
    UNION ALL SELECT '2_click', COUNT(*) FROM c
    UNION ALL SELECT '3_purchase', COUNT(*) FROM p
    """,
    survey_ref="extension: ordered conversion funnel with per-step time "
    "bounds (view → click ≤1h → purchase ≤24h) — sequential-event "
    "matching as equi-joins on user_id, one reusable shuffle key, no "
    "self-cross-join",
)
def q82_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: users whose first view is followed by a
    click within 1 h, then a purchase within 24 h of that click. Each
    step is min-timestamp-after-previous, all joins on user_id."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("v_ts"))
            & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )

    def _step(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("step"), "n_users"
        )

    return (
        _step(v, "1_view").unionByName(_step(c, "2_click")).unionByName(_step(p, "3_purchase"))
    )


@register(
    "q83_retention",
    headline=True,
    oracle="""
    WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS d FROM events
    ), f AS (
        SELECT user_id, MIN(d) AS cohort_d FROM d GROUP BY 1
    )
    SELECT strftime(f.cohort_d, '%Y-%m-%d') AS cohort_date,
           CAST(datediff('day', f.cohort_d, d.d) AS BIGINT) AS day_offset,
           COUNT(DISTINCT d.user_id) AS n_active
    FROM d JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    survey_ref="extension: cohort retention matrix — first-seen-day "
    "cohort × activity-day offset × distinct users; the canonical "
    "events-table rollup, one user_id shuffle + one (cohort, offset) "
    "distinct agg",
)
def q83_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention: users grouped by first-seen date,
    distinct-active counts per day offset from the cohort date."""
    ev = load_events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_d", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("d", "cohort_d").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "q84_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT) * 50000 AS DOUBLE) AS lo_edge,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1, 2
    """,
    survey_ref="extension: fixed-width histogram (width_bucket family) — "
    "single map-side-combinable groupBy, decimal-exact per-bucket sums",
)
def q84_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value histogram in 50k-wide buckets with exact sums."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        o.groupBy(
            bucket.alias("bucket"),
            (bucket * 50000).cast("double").alias("lo_edge"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


@register(
    "q85_interval_overlap",
    headline=True,
    oracle="""
    WITH a AS (
        SELECT o_orderkey AS a_key,
               datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS a_s,
               datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 7 AS a_e
        FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000
    ), b AS (
        SELECT o_orderkey AS b_key,
               datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS b_s,
               datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 7 AS b_e
        FROM orders WHERE o_orderpriority = '2-HIGH' AND o_totalprice > 400000
    )
    SELECT a.a_key,
           COUNT(*) AS n_overlap,
           CAST(SUM(LEAST(a.a_e, b.b_e) - GREATEST(a.a_s, b.b_s) + 1) AS BIGINT)
             AS overlap_days
    FROM a JOIN b ON a.a_s <= b.b_e AND b.b_s <= a.a_e
    GROUP BY 1
    """,
    survey_ref="extension: interval-overlap join (interval × interval) — "
    "bucketized, each true pair survives in exactly the bucket holding "
    "max(starts); rangejoin.bucketed_interval_overlap_join",
)
def q85_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 8-day order windows between urgent and high-priority
    high-value orders: per urgent window, how many high windows touch
    it and the total overlap length in days."""
    from stock_data_pipeline_spark.operators.rangejoin import (
        bucketed_interval_overlap_join,
    )

    epoch = F.lit("1970-01-01").cast("date")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)

    def windows(priority: str, key: str, s: str, e: str) -> DataFrame:
        return (
            o.filter(F.col("o_orderpriority") == priority)
            .select(
                F.col("o_orderkey").alias(key),
                F.datediff(F.col("o_orderdate").cast("date"), epoch).cast("long").alias(s),
            )
            .withColumn(e, F.col(s) + F.lit(7))
        )

    a = windows("1-URGENT", "a_key", "a_s", "a_e")
    b = windows("2-HIGH", "b_key", "b_s", "b_e")
    pairs = bucketed_interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bucket=8)
    return pairs.groupBy("a_key").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        F.sum(
            F.least(F.col("a_e"), F.col("b_e"))
            - F.greatest(F.col("a_s"), F.col("b_s"))
            + F.lit(1)
        )
        .cast("long")
        .alias("overlap_days"),
    )


# ---------------------------------------------------------------------------
# Batch 6 (round 2): span-level dup stats, grouped quantiles, SCD2,
# embedding quantization, multi-join analytics classics
# ---------------------------------------------------------------------------

@register(
    "q86_dup_ngram_spans",
    headline=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), grams AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(tk) - 4, 0)),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                        || ' ' || tk[i+4])) AS g
        FROM toks
    ), per_doc AS (
        SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2
    ), df AS (
        SELECT g, COUNT(*) AS n_docs FROM per_doc GROUP BY 1
    )
    SELECT p.doc_id,
           CAST(SUM(c) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup_spans,
           CAST(SUM(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) AS BIGINT)
             / CAST(SUM(c) AS BIGINT) AS dup_ratio
    FROM per_doc p JOIN df USING (g)
    GROUP BY 1
    """,
    survey_ref="extension: span-level duplication stats (Deduplicating "
    "Training Data Makes Language Models Better, Lee et al. 2022 — the "
    "per-document fraction of word-5-gram positions that also occur in "
    "another document; the substring-dedup decision metric)",
)
def q86_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span ratio over word 5-grams.

    Plan: one (doc, gram) partial count, one gram-level doc-frequency
    aggregate, equi-join back, one doc-level rollup — shuffle is
    proportional to the distinct-posting count, never pairwise. At
    100 TB you'd hash the gram to 64 bits first (collisions only
    perturb a ratio statistic, q25's xxhash64 pattern); the string form
    here keeps the full value oracle.
    """
    from stock_data_pipeline_spark.llm.text import tokens

    doc = load_table(spark, sf_dir, "documents")
    grams = doc.select("doc_id", tokens("text").alias("__tk")).select(
        "doc_id", F.explode(dedup.ngrams_from_tokens(F.col("__tk"), 5)).alias("g")
    )
    per_doc = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    # doc-frequency via a window over the SAME per_doc result instead of
    # a groupBy+join back: the join form plans the scan→gram-explode→
    # aggregate subtree twice (the two partial aggregates differ, so no
    # ReusedExchange); the window re-shuffles only per_doc's (doc, gram,
    # c) rows — gram generation runs exactly once.
    n_docs = F.count("*").over(Window.partitionBy("g"))
    dup_c = F.when(n_docs >= 2, F.col("c")).otherwise(F.lit(0))
    return (
        per_doc.select("doc_id", "c", dup_c.alias("dc"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_spans"),
            F.sum("dc").cast("long").alias("n_dup_spans"),
        )
        .withColumn("dup_ratio", F.col("n_dup_spans") / F.col("n_spans"))
    )


@register(
    "q87_group_quantiles",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    )
    SELECT o_orderpriority,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN o_totalprice END) AS p50,
           MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT) THEN o_totalprice END) AS p90,
           MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT) THEN o_totalprice END) AS p99
    FROM ranked GROUP BY 1
    """,
    survey_ref="G family extension: exact discrete per-group quantiles "
    "(quantile_disc semantics spelled out as row_number = ceil(p*n) so "
    "both engines pick the identical element — no interpolation, no "
    "approx sketch; the engine-portable twin of percentile_approx)",
)
def q87_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of order value per priority class.

    One shuffle on the group key serves the rank window, the count
    window, and the final aggregate (same partitioning). Scale note:
    exact per-group quantiles need the group sorted — fine when groups
    are wide but bounded (priority classes); for quantiles over the
    whole table switch to approx_percentile's PercentileDisc sketch.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice", "o_orderkey")
    wr = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = o.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count("*").over(wn)
    )

    def pick(p: float, name: str) -> F.Column:
        at = F.ceil(F.lit(p) * F.col("n"))
        return F.max(F.when(F.col("rn") == at, F.col("o_totalprice"))).alias(name)

    return ranked.groupBy("o_orderpriority").agg(
        pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99")
    )


@register(
    "q88_scd2_priority",
    oracle="""
    WITH feed AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    ), changes AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
        FROM feed WHERE prev IS NULL OR prev <> o_orderpriority
    )
    SELECT o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_n,
           o_orderpriority AS priority,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to
    FROM changes
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    survey_ref="D3/J3 extension: slowly-changing-dimension type 2 build "
    "from a change feed — collapse consecutive equal values, emit "
    "versioned validity intervals (valid_from, valid_to, NULL = "
    "current); the warehouse-side twin of the reference's "
    "drop-and-reload state refresh (main.py:113-121)",
)
def q88_scd2_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each customer's order-priority: one row per
    change, with half-open validity intervals.

    Single shuffle on o_custkey: the lag dedup, the version numbering,
    and the lead valid_to all share the same window partitioning, so
    Catalyst plans one Exchange + one Sort feeding three Window ops.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = o.withColumn("prev", F.lag("o_orderpriority").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority"))
    )
    return changes.select(
        "o_custkey",
        F.row_number().over(w).cast("long").alias("version_n"),
        F.col("o_orderpriority").alias("priority"),
        _d("o_orderdate").alias("valid_from"),
        F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd").alias("valid_to"),
    )


@register(
    "q89_embedding_quantize",
    oracle="""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), scaled AS (
        SELECT vec_id, v,
               127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
        FROM base
        WHERE list_max(list_transform(v, x -> abs(x))) > 0
    )
    SELECT vec_id, scale,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT))),
               (a, b) -> a + b) AS BIGINT) AS qsum,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)
                                      * CAST(floor(x * scale + 0.5) AS BIGINT))),
               (a, b) -> a + b) AS BIGINT) AS qnorm,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(v, x -> (x - floor(x * scale + 0.5) / scale)
                                      * (x - floor(x * scale + 0.5) / scale))),
               (a, b) -> a + b) AS recon_err
    FROM scaled
    """,
    survey_ref="extension: int8 scalar quantization of embeddings "
    "(symmetric, per-vector scale) + exact reconstruction error — the "
    "compression step before ANN index build; pure narrow map, zero "
    "shuffle, every value integer/IEEE-exact in both engines",
)
def q89_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per embedding: scale = 127/max|v|,
    q_i = floor(v_i*scale + 0.5) (round-half-up, engine-portable —
    round() half-even vs half-away varies by engine), plus the exact
    L2 reconstruction error via an in-order left fold.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    base = emb.select("vec_id", v.alias("v"), amax.alias("amax")).filter(
        F.col("amax") > 0
    )
    scale = F.lit(127.0) / F.col("amax")
    q = lambda x: F.floor(x * scale + F.lit(0.5))  # noqa: E731
    err = lambda x: (x - q(x) / scale) * (x - q(x) / scale)  # noqa: E731
    return base.select(
        "vec_id",
        scale.alias("scale"),
        F.aggregate(F.col("v"), F.lit(0).cast("long"), lambda a, x: a + q(x))
        .cast("long")
        .alias("qsum"),
        F.aggregate(F.col("v"), F.lit(0).cast("long"), lambda a, x: a + q(x) * q(x))
        .cast("long")
        .alias("qnorm"),
        F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + err(x)).alias("recon_err"),
    )


@register(
    "q90_shipping_priority",
    headline=True,
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-30'
      AND l_shipdate > TIMESTAMP '1998-06-30'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    survey_ref="J1 extension: TPC-H Q3 shape — selective 3-way join + "
    "decimal-exact revenue + global top-10; the canonical multi-join "
    "the optimizer must order (filter customer first, broadcast it, "
    "shuffle lineitem once)",
)
def q90_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped high-revenue orders for one market segment (TPC-H Q3).

    Scale plan (r08 rewrite, SCALE.md §16): both date filters push to
    the parquet scans; filtered lineitem pre-aggregates revenue to
    ORDER grain before any join — l_orderkey is orders' PK and decimal
    sums are exact, so the per-order Σ then 1:1 join is bit-identical
    to joining first and grouping by (l_orderkey, o_orderdate,
    o_orderpriority). The exchange carries order-grain rows instead of
    data-sized lineitem (the shuffle probe measured the join-then-agg
    shape jumping beta=2.81 across the broadcast→SMJ transition), the
    map-side partial agg collapses a zipf-hot orderkey per mapper
    (dissolving the SKEW_r08 distribution-reuse straggler for this
    query), and no second aggregation is needed at all. The filtered
    customer fifth-of-a-dimension stays broadcast. The top-10 compiles
    to TakeOrderedAndProject (per-partition heaps + driver merge of 10
    rows), never a global sort.
    """
    cutoff = "1998-06-30"
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    per_order = l.groupBy("l_orderkey").agg(F.sum(rev).alias("rev_sum"))
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "l_orderkey",
            F.col("rev_sum").cast("double").alias("revenue"),
            _d("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q91_returned_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS lost_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_returned_items
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R' AND year(o_orderdate) = 1997
    GROUP BY 1, 2
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    survey_ref="J1 extension: TPC-H Q10 shape — returned-item revenue "
    "per customer, fact-fact join then dimension enrich, top-20",
)
def q91_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in 1997 (TPC-H Q10).

    Join order matters at scale: lineitem('R') ⋈ orders(1997) first
    (both filters pushed to scans, shuffle on orderkey), aggregate down
    to one row per customer BEFORE joining the customer dimension —
    the dim join then moves n_customers rows, not n_lineitems.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1997)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    per_cust = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(rev).cast("double").alias("lost_revenue"),
            F.count("*").alias("n_returned_items"),
        )
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "lost_revenue", "n_returned_items")
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q92_promo_share",
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
           100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) = 1997
    GROUP BY 1
    """,
    survey_ref="J1/G2 extension: TPC-H Q14 shape — conditional aggregate "
    "over a fact⋈dimension broadcast join (promo revenue share per "
    "ship month); the CASE-inside-SUM pattern",
)
def q92_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly share of revenue from PROMO-type parts (TPC-H Q14).

    part is a pure dimension → broadcast join, zero shuffle on the
    fact side until the final month rollup; both aggregates are
    decimal-exact, the share is one double division of two exact
    values (identical operands → identical IEEE result in any engine).
    """
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1997)
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .withColumn(
            "promo_share",
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"),
        )
    )


@register(
    "q93_profile_table",
    oracle="""
    WITH m AS (
        SELECT COUNT(*) AS n_rows,
               COUNT(o_orderkey) AS c1, COUNT(DISTINCT o_orderkey) AS d1,
                 CAST(MIN(o_orderkey) AS VARCHAR) AS lo1, CAST(MAX(o_orderkey) AS VARCHAR) AS hi1,
               COUNT(o_custkey) AS c2, COUNT(DISTINCT o_custkey) AS d2,
                 CAST(MIN(o_custkey) AS VARCHAR) AS lo2, CAST(MAX(o_custkey) AS VARCHAR) AS hi2,
               COUNT(o_orderstatus) AS c3, COUNT(DISTINCT o_orderstatus) AS d3,
                 MIN(o_orderstatus) AS lo3, MAX(o_orderstatus) AS hi3,
               COUNT(o_totalprice) AS c4, COUNT(DISTINCT o_totalprice) AS d4,
                 CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS lo4,
                 CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS hi4,
               COUNT(o_orderdate) AS c5, COUNT(DISTINCT o_orderdate) AS d5,
                 strftime(MIN(o_orderdate), '%Y-%m-%d') AS lo5,
                 strftime(MAX(o_orderdate), '%Y-%m-%d') AS hi5,
               COUNT(o_orderpriority) AS c6, COUNT(DISTINCT o_orderpriority) AS d6,
                 MIN(o_orderpriority) AS lo6, MAX(o_orderpriority) AS hi6
        FROM orders
    )
    SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_nulls AS BIGINT) AS n_nulls,
           CAST(n_distinct AS BIGINT) AS n_distinct, min_repr, max_repr
    FROM (
        SELECT 'o_orderkey' AS col_name, n_rows, n_rows - c1 AS n_nulls, d1 AS n_distinct, lo1 AS min_repr, hi1 AS max_repr FROM m
        UNION ALL SELECT 'o_custkey', n_rows, n_rows - c2, d2, lo2, hi2 FROM m
        UNION ALL SELECT 'o_orderstatus', n_rows, n_rows - c3, d3, lo3, hi3 FROM m
        UNION ALL SELECT 'o_totalprice', n_rows, n_rows - c4, d4, lo4, hi4 FROM m
        UNION ALL SELECT 'o_orderdate', n_rows, n_rows - c5, d5, lo5, hi5 FROM m
        UNION ALL SELECT 'o_orderpriority', n_rows, n_rows - c6, d6, lo6, hi6 FROM m
    )
    """,
    survey_ref="extension: single-pass table profiler (null rate, exact "
    "distinct, min/max per column) — the data-quality gate a training "
    "pipeline runs before ingest; one scan, one Expand-based "
    "multi-distinct aggregate, then an unpivot of the 1-row result",
)
def q93_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders`` in ONE pass: a single aggregate row
    (Spark plans multi-distinct via Expand — one shuffle) stacked to a
    row per column. min/max are emitted as engine-neutral strings
    (doubles via lossless DECIMAL(18,2), dates via yyyy-MM-dd);
    n_distinct is exact — swap in approx_count_distinct when profiling
    ultra-wide tables at 100 TB.
    """
    o = load_table(spark, sf_dir, "orders")
    num = lambda agg: agg.cast("decimal(18,2)").cast("string")  # noqa: E731
    reprs = {
        "o_orderkey": (F.min("o_orderkey").cast("string"), F.max("o_orderkey").cast("string")),
        "o_custkey": (F.min("o_custkey").cast("string"), F.max("o_custkey").cast("string")),
        "o_orderstatus": (F.min("o_orderstatus"), F.max("o_orderstatus")),
        "o_totalprice": (num(F.min("o_totalprice")), num(F.max("o_totalprice"))),
        "o_orderdate": (_d(F.min("o_orderdate")), _d(F.max("o_orderdate"))),
        "o_orderpriority": (F.min("o_orderpriority"), F.max("o_orderpriority")),
    }
    aggs = [F.count("*").alias("n_rows")]
    for c, (lo, hi) in reprs.items():
        aggs += [
            F.count(c).alias(f"c_{c}"),
            F.count_distinct(F.col(c)).alias(f"d_{c}"),
            lo.alias(f"lo_{c}"),
            hi.alias(f"hi_{c}"),
        ]
    one = o.agg(*aggs)
    stack_args = []
    for c in reprs:
        stack_args += [
            F.lit(c),
            (F.col("n_rows") - F.col(f"c_{c}")).cast("long"),
            F.col(f"d_{c}").cast("long"),
            F.col(f"lo_{c}"),
            F.col(f"hi_{c}"),
        ]
    return one.select(
        F.stack(
            F.lit(len(reprs)), *stack_args
        ).alias("col_name", "n_nulls", "n_distinct", "min_repr", "max_repr"),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr")


@register(
    "q94_zscore_outliers",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id, value,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ), stats AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_c,
               sqrt(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DOUBLE) / COUNT(*)
                    - (CAST(SUM(cents) AS DOUBLE) / COUNT(*))
                      * (CAST(SUM(cents) AS DOUBLE) / COUNT(*))) AS std_c
        FROM c GROUP BY 1
    )
    SELECT c.user_id, c.event_id, c.value,
           (CAST(c.cents AS DOUBLE) - s.mean_c) / s.std_c AS z
    FROM c JOIN stats s ON c.user_id = s.user_id
    WHERE s.std_c > 0
      AND abs((CAST(c.cents AS DOUBLE) - s.mean_c) / s.std_c) > 2.5
    """,
    survey_ref="extension: per-entity z-score outlier flagging — "
    "population moments from exact integer-cents sums (the q57 "
    "DECIMAL(38,0) discipline), so mean/std/z are the identical IEEE "
    "value in any engine; anomaly gate for metric streams",
)
def q94_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value sits >2.5 population-σ from their user's mean.

    Exact integer moments (Σc, Σc² in DECIMAL(38,0)) make the double
    arithmetic a *function* of exact inputs — both engines run the same
    op sequence on the same operands, so even the z>2.5 boundary
    comparison agrees bit-for-bit. One shuffle on user_id shared by the
    aggregate and the stats join (broadcast: one row per user).
    """
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", "value", (_dec("value") * 100).cast("long").alias("cents")
    )
    stats = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("sum_c"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sumsq_c"),
    )
    mean_c = F.col("sum_c").cast("double") / F.col("n")
    std_c = F.sqrt(
        F.col("sumsq_c").cast("double") / F.col("n") - mean_c * mean_c
    )
    z = (F.col("cents").cast("double") - F.col("mean_c")) / F.col("std_c")
    return (
        ev.join(
            F.broadcast(stats.select("user_id", mean_c.alias("mean_c"), std_c.alias("std_c"))),
            "user_id",
        )
        .filter((F.col("std_c") > 0) & (F.abs(z) > 2.5))
        .select("user_id", "event_id", "value", z.alias("z"))
    )


@register(
    "q95_twap",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               strftime(ts, '%Y-%m-%d') AS day,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ), held AS (
        SELECT user_id, day, cents,
               LEAD(ts_us) OVER (PARTITION BY user_id, day
                                 ORDER BY ts_us, event_id) - ts_us AS dur_us
        FROM c
    )
    SELECT user_id, day,
           CAST(SUM(CAST(cents AS DECIMAL(38,0)) * dur_us) AS DOUBLE)
             / CAST(SUM(dur_us) AS DOUBLE) / 100.0 AS twap,
           CAST(SUM(dur_us) AS BIGINT) AS held_us,
           CAST(COUNT(*) AS BIGINT) AS n_holds
    FROM held
    WHERE dur_us IS NOT NULL
    GROUP BY 1, 2
    HAVING SUM(dur_us) > 0
    """,
    survey_ref="extension: time-weighted average price (last-point-hold "
    "TWAP per user-day) — the TimescaleDB time_weight rollup over an "
    "irregular tick series; exact integer µs × cents weights in "
    "DECIMAL(38,0), one (user, day) shuffle for window + rollup",
)
def q95_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean value per user-day: each tick's value
    holds until the next tick that day (the final tick holds nothing).
    Weights are exact integer microseconds; the weighted sum
    accumulates in DECIMAL(38,0) so scale can't overflow it.
    """
    from stock_data_pipeline_spark.catalog import load_events_us

    c = load_events_us(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts").alias("ts_us"),
        F.date_format(
            F.expr("timestamp_micros(ts)").cast("timestamp_ntz"), "yyyy-MM-dd"
        ).alias("day"),
        (_dec("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts_us", "event_id")
    held = c.withColumn("dur_us", F.lead("ts_us").over(w) - F.col("ts_us")).filter(
        F.col("dur_us").isNotNull()
    )
    return (
        held.groupBy("user_id", "day")
        .agg(
            F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dur_us")).alias("wsum"),
            F.sum("dur_us").alias("held_us"),
            F.count("*").alias("n_holds"),
        )
        .filter(F.col("held_us") > 0)
        .select(
            "user_id",
            "day",
            (F.col("wsum").cast("double") / F.col("held_us").cast("double") / F.lit(100.0)).alias("twap"),
            F.col("held_us").cast("long"),
            F.col("n_holds").cast("long"),
        )
    )


@register(
    "q96_click_attribution",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id AS view_id, ts AS v_ts
        FROM events WHERE event_type = 'view'
    ), c AS (
        SELECT user_id, event_id AS click_id, ts AS c_ts
        FROM events WHERE event_type = 'click'
    )
    SELECT v.user_id, view_id, click_id,
           CAST(epoch_us(c_ts) - epoch_us(v_ts) AS BIGINT) AS lag_us
    FROM v JOIN c
      ON v.user_id = c.user_id
     AND c.c_ts > v.v_ts
     AND c.c_ts <= v.v_ts + INTERVAL 1 HOUR
    """,
    survey_ref="extension: attribution interval join — the batch twin "
    "of streaming/joins.stream_stream_interval_join (every click within "
    "1h after a view by the same user); on a stream the identical call "
    "is a watermarked stream-stream join with bounded state",
)
def q96_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(view, click) attribution pairs via the SAME function the
    streaming path uses (``withWatermark`` is a no-op on batch).
    Equi-key on user_id carries the join; the time bound is the
    residual — and on a stream it is also the state-eviction bound.
    Lag is exact integer µs, so the oracle is TZ-proof.
    """
    from stock_data_pipeline_spark.streaming.joins import stream_stream_interval_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_events(spark, sf_dir)
    ts = F.col("ts").cast("timestamp")  # watermark type-checks LTZ even on batch
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), ts.alias("v_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), ts.alias("c_ts")
    )
    joined = stream_stream_interval_join(
        v, c, key="user_id", l_ts="v_ts", r_ts="c_ts", within="1 hour"
    )
    return joined.select(
        "user_id",
        "view_id",
        "click_id",
        (F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("lag_us"),
    )


@register(
    "q97_json_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    GROUP BY 1
    """,
    survey_ref="extension: semi-structured extraction — typed values "
    "pulled out of a JSON string column (get_json_object stays in "
    "codegen; at scale promote hot keys to real columns at ingest and "
    "keep the raw JSON for the long tail)",
)
def q97_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract ``props.$.k`` as a typed long and aggregate per event
    type — the JSON-sidecar pattern every event pipeline has. The
    extraction is a narrow map fused into the scan stage; one shuffle
    for the (tiny) per-type rollup.
    """
    ev = load_events(spark, sf_dir).select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )
