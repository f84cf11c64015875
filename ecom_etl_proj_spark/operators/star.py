"""Star-schema master join.

Re-expresses the reference's master sales denormalization — the 7-way
LEFT JOIN feeding every dashboard metric
(/root/reference/streamlit/utils.py:177-195, run_analytics.py:36-55) —
on the testdata star schema.

Scale notes (100 TB):
- orders ⋈ lineitem is the fact-fact join: both shuffle on the order key.
  On a real lake both tables would be bucketed by order key at write time,
  making this join shuffle-free; here AQE handles skew splitting.
- nation / region / supplier are bounded dimensions → explicit broadcast.
- customer and part grow with SF but stay ~100-1000x smaller than
  lineitem; we leave them to Catalyst/AQE, which broadcast-joins them
  while they fit (autoBroadcastJoinThreshold) and shuffle-joins beyond.
- The join is LEFT from the fact side like the reference, so fact rows
  with dangling keys survive (the reference relies on this for its
  "orders with no review" rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sales_master(t: dict[str, DataFrame]) -> DataFrame:
    """One row per lineitem with order, customer, geo, part, supplier attrs."""
    cust_geo = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"), "left")
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "c_mktsegment",
            F.col("n_name").alias("cust_nation"),
            F.col("r_name").alias("cust_region"),
        )
    )
    supp_geo = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"), "left")
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"), "inner")
        .join(cust_geo, F.col("o_custkey") == F.col("c_custkey"), "left")
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"), "left")
        .join(F.broadcast(supp_geo), F.col("l_suppkey") == F.col("s_suppkey"), "left")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
            "c_name",
            "c_mktsegment",
            "cust_nation",
            "cust_region",
            "p_brand",
            F.col("p_type").alias("category"),
            "s_suppkey",
            "supp_nation",
        )
    )
