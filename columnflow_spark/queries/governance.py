"""Data governance: declarative quality expectations and a k-anonymity
privacy audit.

Every production table at 100 TB ships with a constraint suite (the
Deequ / Great Expectations / dbt-tests shape): uniqueness, null rates,
domain membership, bounds, referential integrity.  The expensive mistake
is evaluating N constraints as N scans; the scalable shape is ONE
aggregation pass computing every row-local constraint as a conditional
sum, plus one anti-join for each cross-table constraint.  Violation
counts are exact BIGINTs — no ratio floats to knife-edge.

The k-anonymity audit is the privacy-side twin: group sizes over a
quasi-identifier tuple, flagging classes smaller than k (re-identifiable
rows).  One map-side-combinable aggregation at quasi-identifier grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnflow_spark.queries import query
from columnflow_spark.sources import load_table

#: minimum equivalence-class size for the k-anonymity audit
_K_ANON = 5


@query(
    "data_quality_checks",
    oracle="""
    WITH m AS MATERIALIZED (
        SELECT count(*) AS n_rows,
               count(*) - count(DISTINCT o_orderkey) AS dup_keys,
               sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg_price,
               sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END)
                   AS bad_status,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_cust,
               sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                         OR o_orderdate >= TIMESTAMP '2010-01-01'
                        THEN 1 ELSE 0 END) AS date_oob
        FROM orders
    ),
    ri AS MATERIALIZED (
        SELECT count(*) AS orphans
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
    )
    SELECT check_name, CAST(violations AS BIGINT) AS violations,
           violations = 0 AS passed
    FROM (
        SELECT 'orderkey_unique' AS check_name, dup_keys AS violations FROM m
        UNION ALL SELECT 'price_non_negative', neg_price FROM m
        UNION ALL SELECT 'status_in_domain', bad_status FROM m
        UNION ALL SELECT 'custkey_not_null', null_cust FROM m
        UNION ALL SELECT 'orderdate_in_bounds', date_oob FROM m
        UNION ALL SELECT 'custkey_references_customer', orphans FROM ri
    )
    ORDER BY check_name
    """,
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-constraint expectation suite over orders in ONE aggregation pass
    (conditional sums) plus ONE anti-join for referential integrity;
    returns exact violation counts per check."""
    orders = load_table(
        spark,
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    )
    cust = load_table(spark, sf_dir, "customer", columns=["c_custkey"])

    viol = F.when
    m = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_keys"),
        F.sum(viol(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("neg_price"),
        F.sum(viol(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)).alias(
            "bad_status"
        ),
        F.sum(viol(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_cust"),
        F.sum(
            viol(
                (F.col("o_orderdate") < F.lit("1990-01-01 00:00:00").cast("timestamp_ntz"))
                | (F.col("o_orderdate") >= F.lit("2010-01-01 00:00:00").cast("timestamp_ntz")),
                1,
            ).otherwise(0)
        ).alias("date_oob"),
    )
    orphans = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    long = m.crossJoin(orphans).select(
        F.expr(
            "stack(6,"
            " 'orderkey_unique', dup_keys,"
            " 'price_non_negative', neg_price,"
            " 'status_in_domain', bad_status,"
            " 'custkey_not_null', null_cust,"
            " 'orderdate_in_bounds', date_oob,"
            " 'custkey_references_customer', orphans"
            ") AS (check_name, violations)"
        )
    )
    return (
        long.select(
            "check_name",
            F.col("violations").cast("long").alias("violations"),
            (F.col("violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )


@query(
    "k_anonymity_audit",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS grp_sz,
           count(*) < {_K_ANON} AS below_k
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence-class sizes over the (nation, market-segment)
    quasi-identifier tuple, flagging classes below ``_K_ANON`` — rows in a
    flagged class are re-identifiable and need suppression or
    generalization before release.  One map-side-combinable aggregation."""
    cust = load_table(spark, sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("grp_sz"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "grp_sz",
            (F.col("grp_sz") < _K_ANON).alias("below_k"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )
