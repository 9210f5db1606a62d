"""TPC-H macro queries — multi-join pipelines as single Catalyst plans.

The registry's relational rows (Q06-Q12) prove each join/agg shape in
isolation; a warehouse user runs them *composed* — 3-6 table join trees
with selective filters, grouped measures, and top-k output. These four
macros are the classic TPC-H shapes (Q3 shipping priority, Q5 local
supplier volume, Q10 returned items, Q18 large-volume customers)
adapted to the TESTDATA columns, each expressed declaratively so
Catalyst/AQE picks the physical strategy.

The reference itself has no joins at all (SURVEY.md §4: "no joins in
reference") — this suite is engine-added warehouse surface, and doubles
as the bench's realism tier: every plan mixes broadcast + shuffle joins,
selective pushed-down filters, and partial aggregation.

Scale design (100 TB posture):
- Filters sit directly on the base scans, so parquet row-group pruning
  and column pruning apply before any join (PushedFilters verified in
  artifacts/PLANS.md).
- nation/region are bounded dims -> explicit ``F.broadcast``; the
  customer/orders/lineitem joins shuffle on their natural keys once
  each, and AQE re-plans the post-filter sides (the Q18 HAVING output
  is a tiny key set at any scale -> AQE turns the orders probe into a
  broadcast join at runtime).
- Every grouped money measure goes through exact DECIMAL partial sums
  (``dsum`` pattern) so the result is byte-identical under any
  partitioning/merge order, then one final cast to DOUBLE on the wire
  (the engine's cross-engine output-type contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nfl_predictions_spark.sources.tables import table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _revenue() -> F.Column:
    """Exact line revenue partial: round(extendedprice*(1-discount), 4)
    as DECIMAL so the sum is associative (order-independent); the
    product itself is one IEEE double op, bit-identical across engines.
    """
    return F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")


_REV_DUCK = "CAST(round(l_extendedprice * (1.0 - l_discount), 4) AS DECIMAL(18,4))"


# ---------------------------------------------------------------------------
# q156 — TPC-H Q3: shipping-priority (customer x orders x lineitem, top-10)
# ---------------------------------------------------------------------------


@_q(
    "q156_tpch_q3",
    f"""
    SELECT l_orderkey,
           CAST(round(sum({_REV_DUCK}), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum({_REV_DUCK}) DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q156_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, selective filters on all three scans,
    grouped revenue, global top-10. The segment filter prunes customer
    before its join; the two date filters push into the parquet scans.
    Ranking happens on the exact DECIMAL sum (before the wire cast) so
    the top-10 cut is deterministic."""
    cutoff = "1998-07-01"
    customer = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    lineitem = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = F.sum(_revenue())
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("rev_exact"))
        .orderBy(F.desc("rev_exact"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.round("rev_exact", 2).cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# q157 — TPC-H Q5: local-supplier volume (6-way join, grouped by nation)
# ---------------------------------------------------------------------------


@_q(
    "q157_tpch_q5",
    f"""
    SELECT n_name,
           CAST(round(sum({_REV_DUCK}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY sum({_REV_DUCK}) DESC, n_name
    """,
)
def q157_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-table join tree with the "local supplier"
    twist (customer and supplier must share a nation). The ASIA
    region filter is pushed through the broadcast nation/region dims
    onto BOTH fact-side inputs before any big join (classic star-schema
    dimension pushdown): customer and supplier each pre-filter to the 5
    ASIA nations via a broadcast hash join, so the custkey and suppkey
    shuffles move ~1/5 of the rows the late-decode plan shuffled —
    round 4 measured that plan at 5.1x sf0.1->sf1 decade growth
    (VERDICT r04 next-round #4). The compound supplier join key
    (l_suppkey, c_nationkey) rides the already-shuffled fact side.
    Output is |nations|-sized, so the final sort is trivial."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    lineitem = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(asia), customer.c_nationkey == asia.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    supp = supplier.join(
        F.broadcast(asia.select(F.col("n_nationkey").alias("sn"))),
        supplier.s_nationkey == F.col("sn"),
        "left_semi",
    ).select("s_suppkey", "s_nationkey")
    rev = F.sum(_revenue())
    # ASIA suppliers join lineitem FIRST (broadcast at bench scale; AQE
    # re-plans if the filtered dim outgrows the threshold): this is the
    # most selective broadcast-able edge in the tree, so the lineitem
    # rows entering the big l_orderkey shuffle drop ~5x. The residual
    # c_nationkey = s_nationkey "local supplier" predicate applies after
    # the orders/customer join as a filter on already-joined rows.
    li = lineitem.join(supp, lineitem.l_suppkey == supp.s_suppkey)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .groupBy("n_name")
        .agg(rev.alias("rev_exact"))
        .orderBy(F.desc("rev_exact"), "n_name")
        .select("n_name", F.round("rev_exact", 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q158 — TPC-H Q10: returned-item losses per customer (top-20)
# ---------------------------------------------------------------------------


@_q(
    "q158_tpch_q10",
    f"""
    SELECT c_custkey, c_name,
           CAST(round(sum({_REV_DUCK}), 2) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY sum({_REV_DUCK}) DESC, c_custkey
    LIMIT 20
    """,
)
def q158_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: one-quarter order window, returned lines only,
    revenue grouped by customer with a broadcast nation decode, global
    top-20 (TakeOrdered — no full sort). The returnflag filter pushes
    into the lineitem scan as a parquet predicate."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    lineitem = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    rev = F.sum(_revenue())
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.alias("rev_exact"))
        .orderBy(F.desc("rev_exact"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round("rev_exact", 2).cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


# ---------------------------------------------------------------------------
# q159 — TPC-H Q18: large-volume customers (HAVING subquery semi filter)
# ---------------------------------------------------------------------------


@_q(
    "q159_tpch_q18",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q159_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the HAVING-subquery pattern. Because the final
    per-(customer, order) sum is functionally determined by o_orderkey,
    the per-order quantity aggregate computed for the HAVING filter IS
    the output measure — so lineitem is scanned and shuffled exactly
    once (one groupBy on l_orderkey), and the filtered aggregate (a tiny
    fraction of orderkeys at any scale) joins orders as a broadcast-able
    inner join instead of the classic re-join + re-aggregate of the full
    lineitem table. Round 4 measured the re-join form at 5.7x sf0.1->sf1
    wall growth (worst in SCALING.md); this form removes the second
    full-lineitem shuffle entirely (VERDICT r04 next-round #4)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("q_raw"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q_dec"),
        )
        .filter(F.col("q_raw") > 300)
        .select(
            F.col("l_orderkey").alias("bk"),
            F.round("q_dec", 2).cast("double").alias("sum_qty"),
        )
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("bk"))
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q172 — TPC-H Q17: small-quantity-order revenue (correlated agg subquery)
# ---------------------------------------------------------------------------


@_q(
    "q172_tpch_q17",
    """
    WITH pa AS (
      SELECT l_partkey,
             sum(CAST(l_quantity AS DECIMAL(12,0))) AS qty_sum,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#13'
      AND CAST(l_quantity AS DECIMAL(12,0)) * 5 * pa.n < pa.qty_sum
    """,
)
def q172_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of lines whose quantity is below 20% of
    the part's average — the correlated-scalar-aggregate-subquery
    pattern, decorrelated into a per-part aggregate join.

    Determinism: the threshold compare runs in integer/DECIMAL algebra
    (qty * 5 * n < qty_sum) instead of comparing against 0.2*avg in
    floats, so no engine can disagree at the boundary.

    Scale: the brand filter prunes part to a bounded set that is
    broadcast; lineitem is semi-joined to it BEFORE the per-part
    average aggregates, so the correlated aggregate is computed only
    for surviving partkeys — at 100 TB that is the difference between
    aggregating the whole fact table and aggregating one brand's slice.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    parts = F.broadcast(
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    brand_lines = li.join(parts, li.l_partkey == F.col("p_partkey"))
    pa = brand_lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(12,0)")).alias("qty_sum"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        brand_lines.join(pa, brand_lines.l_partkey == F.col("pk"))
        .where(
            F.col("l_quantity").cast("decimal(12,0)") * 5 * F.col("n")
            < F.col("qty_sum")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q173 — TPC-H Q21: suppliers who kept orders waiting (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------

_LATE_DAYS = 120


def _q21_oracle() -> str:
    return f"""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN l l1 ON s_suppkey = l1.l_suppkey AND l1.late
    WHERE EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
    """


@_q("q173_tpch_q21", _q21_oracle())
def q173_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest decision-support pattern — one fact
    derivation feeding an EXISTS (another supplier touched the order)
    and a NOT EXISTS (no OTHER supplier was late) over itself, grouped
    into a top-k blame list. The schema has no commit/receipt dates, so
    "late" is shipdate > orderdate + {_LATE_DAYS} days (cited vs TPC-H
    Q21 which compares l_receiptdate > l_commitdate).

    Spark shape: the derived line table is computed once; the EXISTS
    becomes a left-semi and the NOT EXISTS a left-anti self-join, both
    equi-keyed on l_orderkey with the supplier-inequality as a join
    residual — Catalyst runs them as shuffled hash joins on the same
    key, so the three passes co-partition and AQE can reuse the
    exchange. Supplier is broadcast for the final name attach.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        ).alias("late"),
    )
    l1 = l.filter(F.col("late")).select("l_orderkey", "l_suppkey")
    l2 = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l.filter(F.col("late")).select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q193 — TPC-H Q4: order-priority checking (EXISTS semi join + agg)
# ---------------------------------------------------------------------------


@_q(
    "q193_tpch_q4",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      AND o_orderdate < TIMESTAMP '2000-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q193_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority distribution of orders with at least
    one late line. Lateness adapted to shipdate > orderdate + 90d (no
    commit/receipt dates in this schema; same adaptation as q173).

    Physical strategy: the naive decorrelated EXISTS is a left-semi
    join that shuffles EVERY lineitem row on l_orderkey (sort-merge:
    both sides sorted — 6.2x decade growth measured at sf1). But the
    EXISTS predicate is monotone in l_shipdate, so it collapses to an
    aggregate pushdown: exists(line with shipdate > odate+90) <=>
    max(l_shipdate) per order > odate+90. The pre-aggregate is
    map-side-combinable (the shuffle carries ONE row per orderkey, not
    one per line — ~4x less here, more at real line-fan-outs), and the
    join against the date-windowed orders broadcasts at fixture scale /
    shuffles order-count rows at 100 TB. Measured at sf1: 4.3 s -> 0.9 s
    warm, value-identical to the semi-join form (q173 keeps the
    semi/anti form because its THREE lineitem subtrees win via
    ReuseExchange — one-use subtrees win via pre-aggregation; see
    NOTES.md)."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "2000-01-01")
        & (F.col("o_orderdate") < "2000-07-01")
    )
    max_ship = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    late = orders.join(
        max_ship,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("max_ship") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q194 — TPC-H Q14: promotion revenue share (conditional agg over a join)
# ---------------------------------------------------------------------------


@_q(
    "q194_tpch_q14",
    f"""
    SELECT CAST(round(
             100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_DUCK}
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum({_REV_DUCK}) AS DOUBLE), 6) AS DOUBLE) AS promo_share,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_shipdate < TIMESTAMP '2000-02-01'
    """,
)
def q194_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for one ship month —
    conditional aggregation over a fact-dim join. Part is broadcast
    after column pruning; both the promo and total revenue ride the
    exact DECIMAL partial (same `_revenue` fragment as every macro), so
    the share is one double division on engine-identical sums."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "2000-01-01") & (F.col("l_shipdate") < "2000-02-01")
    )
    part = F.broadcast(table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    rev = _revenue()
    zero = F.lit(0).cast("decimal(18,4)")
    return j.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                "double"
            )
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_share"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q195 — TPC-H Q22: global sales opportunity (anti join + scalar subquery)
# ---------------------------------------------------------------------------


@_q(
    "q195_tpch_q22",
    """
    WITH avg_bal AS (
      SELECT avg(CAST(c_acctbal AS DECIMAL(18,2))) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) > a
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey ORDER BY nationkey
    """,
)
def q195_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-inactive customers per country —
    a scalar aggregate subquery (global positive-balance average,
    broadcast as one row), a NOT EXISTS that becomes a left-anti join
    against recent orders, and a grouped rollup. The threshold compare
    runs in DECIMAL on both engines so the average's representation
    cannot move the cut. Nation key stands in for TPC-H's phone
    country code (no phone column in this schema)."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    avg_bal = cust.filter(F.col("bal") > 0).agg(F.avg("bal").alias("a"))
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("bal") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Round-5 completion: the remaining 12 TPC-H shapes (Q2, Q6, Q7, Q8, Q9,
# Q11, Q12, Q13, Q15, Q16, Q19, Q20), closing the full 22-query macro tier.
#
# TESTDATA has no partsupp table and no commit/receipt/shipmode/container
# columns, so the four queries that touch them are adapted with the SAME
# plan shape (the thing the macro tier exists to prove) and documented
# substitutions:
#   - part-supplier catalog (Q2/Q11/Q16/Q20's partsupp) := the DISTINCT
#     (l_partkey, l_suppkey) pairs observed in lineitem, with
#     ps_supplycost := min observed unit price and ps_availqty := shipped
#     quantity — the derivation is itself a map-side-combinable aggregate.
#   - lateness (Q12's commit/receipt dates) := l_shipdate vs o_orderdate
#     windows, the same adaptation q173/q193 already use.
#   - Q19's container/shipinstruct predicate := p_type/p_size/l_quantity
#     disjunction (keeps the OR-of-ANDs pushdown structure).
# Every query keeps the canonical TPC-H plan skeleton: selective filters
# on the base scans, broadcast dims, one shuffle per fact join key,
# exact-DECIMAL money partials, deterministic total orders.
# ---------------------------------------------------------------------------


@_q(
    "q280_tpch_q6",
    f"""
    SELECT CAST(round(sum(CAST(round(l_extendedprice * l_discount, 4)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_shipdate <  TIMESTAMP '2001-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q280_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecasting revenue change — the purest pushdown
    benchmark. No join at all: three conjunctive predicates that ALL
    reach the parquet scan (date range, discount band, quantity cap)
    followed by a single map-side-combinable sum. At 100 TB this is a
    parquet row-group-pruned scan and one exchange of partial sums
    (one row per partition). The discount band compares the same
    double literals both engines parse identically; the revenue
    product is one IEEE op rounded into the exact DECIMAL partial."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "2000-01-01")
        & (F.col("l_shipdate") < "2001-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    disc_rev = F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).cast(
        "decimal(18,4)"
    )
    return li.agg(
        F.round(F.sum(disc_rev), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_UNIT_COST_DUCK = (
    "CAST(round(l_extendedprice / l_quantity, 2) AS DECIMAL(18,2))"
)


@_q(
    "q281_tpch_q2",
    f"""
    WITH cat AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min({_UNIT_COST_DUCK}) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ),
    offers AS (
      SELECT p_partkey, p_type, s_suppkey, s_name, s_acctbal, n_name, unit_cost
      FROM cat
      JOIN supplier ON suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      JOIN part     ON partkey = p_partkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD' AND p_size <= 10
    ),
    best AS (
      SELECT p_partkey AS bp, min(unit_cost) AS min_cost
      FROM offers GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           CAST(unit_cost AS DOUBLE) AS supply_cost
    FROM offers JOIN best ON p_partkey = bp AND unit_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 10
    """,
)
def q281_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier — the correlated-subquery
    classic (cost = min cost over the part's suppliers in a region).
    partsupp is derived from lineitem (docstring header): unit cost =
    min observed round(extendedprice/quantity, 2) per (part, supplier),
    a map-side-combinable DECIMAL min. The correlation decorellates
    into a per-part min + an equality join back on the exact DECIMAL —
    no window, no driver loop. Supplier/nation/region and the filtered
    part dim all broadcast; the only big shuffle is the catalog
    derivation's (partkey, suppkey) aggregate, which at 100 TB carries
    one row per observed pair (map-combined). Top-10 by account
    balance with full tie-break keys."""
    li = table(spark, sf_dir, "lineitem")
    cat = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2).cast(
                "decimal(18,2)"
            )
        ).alias("unit_cost")
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(eur), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_type")
    offers = (
        cat.join(F.broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts), F.col("partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_type", "s_suppkey", "s_name", "s_acctbal",
                "n_name", "unit_cost")
    )
    # per-part min as an unbounded window + filter instead of a
    # groupBy + equality self-join of offers: the self-join re-derived
    # the whole lineitem catalog aggregate for the build side (20
    # parquet scans / 2 lineitem aggregates in the un-cut plan — the
    # optimizer cannot reuse the subtree across the join's two arms).
    # One pass, one exchange on p_partkey, identical DECIMAL-exact
    # min-cost semantics (oracle-verified).
    wmin = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_cost", F.min("unit_cost").over(wmin))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(10)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("unit_cost").cast("double").alias("supply_cost"),
        )
    )


@_q(
    "q282_tpch_q7",
    f"""
    SELECT sr AS supp_region, cr AS cust_region, l_year,
           CAST(round(sum({_REV_DUCK}), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT rs.r_name AS sr, rc.r_name AS cr,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN region rs ON ns.n_regionkey = rs.r_regionkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region rc ON nc.n_regionkey = rc.r_regionkey
      WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        AND l_shipdate <  TIMESTAMP '2002-01-01'
        AND ((rs.r_name = 'ASIA' AND rc.r_name = 'EUROPE')
          OR (rs.r_name = 'EUROPE' AND rc.r_name = 'ASIA'))
    )
    GROUP BY sr, cr, l_year
    ORDER BY sr, cr, l_year
    """,
)
def q282_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipping between two trading partners by
    year — the both-directions disjunctive geography predicate. Region
    stands in for TPC-H's nation pair (TESTDATA's suppliers are too
    sparse for single-nation filters at sf0.001; same plan shape one
    dim level up). Both geography legs resolve through broadcast
    nation/region dims BEFORE the fact joins, so the disjunction
    ((ASIA->EUROPE) OR (EUROPE->ASIA)) filters supplier and customer
    to 2 regions each ahead of the l_suppkey/o_custkey shuffles; the
    residual pair predicate applies post-join. One l_orderkey shuffle,
    year extracted from the pushed-down shipdate window."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    geo = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "r_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(geo.withColumnRenamed("r_name", "sr")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "sr")
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(geo.withColumnRenamed("r_name", "cr")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "cr")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "2000-01-01") & (F.col("l_shipdate") < "2002-01-01")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rev = F.sum(_revenue())
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("sr") == "ASIA") & (F.col("cr") == "EUROPE"))
            | ((F.col("sr") == "EUROPE") & (F.col("cr") == "ASIA"))
        )
        .groupBy(
            F.col("sr").alias("supp_region"),
            F.col("cr").alias("cust_region"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(rev.alias("rev_exact"))
        .orderBy("supp_region", "cust_region", "l_year")
        .select(
            "supp_region", "cust_region", "l_year",
            F.round("rev_exact", 2).cast("double").alias("revenue"),
        )
    )


@_q(
    "q283_tpch_q8",
    f"""
    SELECT o_year,
           CAST(round(
             CAST(sum(CASE WHEN sr = 'ASIA' THEN {_REV_DUCK}
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum({_REV_DUCK}) AS DOUBLE), 6) AS DOUBLE) AS mkt_share,
           count(*) AS n_lines
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             rs.r_name AS sr, l_extendedprice, l_discount
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN region rs ON ns.n_regionkey = rs.r_regionkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region rc ON nc.n_regionkey = rc.r_regionkey
      WHERE rc.r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '2000-01-01'
        AND o_orderdate <  TIMESTAMP '2002-01-01'
    )
    GROUP BY o_year ORDER BY o_year
    """,
)
def q283_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — what fraction of the
    AMERICA market for ECONOMY parts does the ASIA supply base hold,
    per order year. Supplier region stands in for TPC-H's single
    nation (same sparsity note as q282). The market-defining filters
    (customer region, part type, order-date window) all push onto
    their scans through broadcast dims before the two fact shuffles;
    the numerator is a conditional DECIMAL partial over the SAME rows
    (one aggregate pass, no second join tree). Share = one double
    division of exact sums per year group."""
    nation = table(spark, sf_dir, "nation")
    regions = table(spark, sf_dir, "region")
    geo = nation.join(
        F.broadcast(regions), nation.n_regionkey == regions.r_regionkey
    ).select("n_nationkey", "r_name")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(geo.withColumnRenamed("r_name", "sr")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "sr")
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                geo.filter(F.col("r_name") == "AMERICA").select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey")
    )
    parts = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "2000-01-01") & (F.col("o_orderdate") < "2002-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    rev = _revenue()
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("sr") == "ASIA", rev).otherwise(zero)).alias("asia"),
            F.sum(rev).alias("total"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
        .select(
            "o_year",
            F.round(
                F.col("asia").cast("double") / F.col("total").cast("double"), 6
            ).alias("mkt_share"),
            "n_lines",
        )
    )


_PROFIT_DUCK = (
    "CAST(round(l_extendedprice * (1.0 - l_discount), 4) AS DECIMAL(18,4))"
    " - CAST(round(0.6 * p_retailprice * l_quantity, 4) AS DECIMAL(18,4))"
)


@_q(
    "q284_tpch_q9",
    f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(round(sum({_PROFIT_DUCK}), 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, CAST(year(o_orderdate) AS INT)
    ORDER BY nation, o_year
    """,
)
def q284_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by supplier nation and
    order year. Supply cost is adapted to 0.6 * p_retailprice per unit
    (no partsupp.ps_supplycost in TESTDATA — header note); profit =
    revenue partial minus cost partial, BOTH exact DECIMAL so the
    grouped sum is merge-order-independent. The %widget% name filter
    prunes part before its broadcast; supplier/nation broadcast; the
    one big shuffle is lineitem->orders on l_orderkey. The cost
    product multiplies left-to-right (0.6 * retail * qty) — the same
    IEEE sequence both engines."""
    parts = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _revenue() - F.round(
        F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity"), 4
    ).cast("decimal(18,4)")
    return (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).alias("profit_exact"))
        .orderBy("nation", "o_year")
        .select(
            "nation", "o_year",
            F.round("profit_exact", 2).cast("double").alias("sum_profit"),
        )
    )


@_q(
    "q285_tpch_q11",
    """
    WITH v AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS stock_value
    FROM v, (SELECT sum(val) AS total FROM v)
    WHERE CAST(val AS DOUBLE) > 0.001 * CAST(total AS DOUBLE)
    ORDER BY val DESC, l_partkey
    """,
)
def q285_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important stock — per-part supplied value for
    one geography, kept only where it exceeds a fraction of the
    geography's TOTAL value (the scalar-aggregate-subquery classic).
    Stock value is adapted to summed line revenue from ASIA-region
    suppliers (no partsupp; region for sparsity, header note). The
    per-part aggregate is computed ONCE and reused for both the rows
    and the scalar total (self-join on a 1-row broadcast — Catalyst
    reuses the exchange); threshold compare runs on the exact-DECIMAL
    sums cast to double identically in both engines."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_n = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(asia_n), F.col("s_nationkey") == F.col("n_nationkey"),
              "left_semi")
        .select("s_suppkey")
    )
    v = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)")).alias(
                "val"
            )
        )
    )
    total = v.agg(F.sum("val").alias("total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.lit(0.001) * F.col("total").cast("double"))
        .orderBy(F.desc("val"), "l_partkey")
        .select("l_partkey", F.col("val").cast("double").alias("stock_value"))
    )


@_q(
    "q286_tpch_q12",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate <  o_orderdate + INTERVAL 120 DAY
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q286_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment priority mix. Lateness is
    l_shipdate landing 60-120 days after o_orderdate (TESTDATA has no
    commit/receipt dates — same adaptation family as q193) and
    l_linestatus stands in for l_shipmode; the CASE pair over order
    priority is the query's signature conditional aggregation. The
    lateness predicate needs both sides, so it applies as a post-join
    filter on the single l_orderkey shuffle; the priority CASE runs
    map-side in the partial aggregate. Output is status-cardinality
    rows, totally ordered."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@_q(
    "q287_tpch_q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q287_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — the
    double aggregate over a filtered LEFT OUTER join (customers with
    zero qualifying orders must appear in the c_count=0 bucket, which
    is why the filter lives in the JOIN condition, not a WHERE). The
    priority exclusion stands in for TPC-H's comment NOT LIKE (no
    o_comment column). First aggregate shuffles on c_custkey (the
    join's own key — AQE coalesces the double use); the second input
    is customer-cardinality and the output is tiny. count(o_orderkey)
    counts non-null only, preserving outer-join semantics in both
    engines."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@_q(
    "q288_tpch_q15",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey, sum({_REV_DUCK}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        AND l_shipdate <  TIMESTAMP '2000-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier ON suppkey = s_suppkey,
         (SELECT max(total_rev) AS mx FROM rev)
    WHERE total_rev = mx
    ORDER BY s_suppkey
    """,
)
def q288_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier — per-supplier quarterly revenue
    equal to the global maximum (view + scalar-subquery equality). The
    quarter filter pushes to the scan; the per-supplier DECIMAL sum is
    map-combined and reused for BOTH the rows and the 1-row max
    (broadcast); equality on the exact DECIMAL cannot false-tie the
    way a double sum could. Supplier dim broadcasts onto the
    supplier-cardinality aggregate."""
    rev = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "2000-01-01")
            & (F.col("l_shipdate") < "2000-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_revenue()).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .orderBy("s_suppkey")
        .select(
            "s_suppkey", "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


@_q(
    "q289_tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
      AND s_acctbal >= 0
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q289_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can supply each qualifying
    (brand, type, size) — distinct-count over the part-supplier
    relation with a supplier EXCLUSION list. The relation is the
    DISTINCT lineitem pair set (no partsupp — header note); negative
    account balance stands in for the complaints comment filter. The
    brand/type/size predicates prune part before its broadcast; the
    exclusion semi-joins a tiny supplier subset; the distinct-pair
    aggregate shuffles on (partkey, suppkey) once, then the
    distinct-count shuffles group-cardinality rows."""
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    parts = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ok_supp = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") >= 0
    ).select("s_suppkey")
    return (
        pairs.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(ok_supp), F.col("l_suppkey") == F.col("s_suppkey"),
              "left_semi")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@_q(
    "q290_tpch_q19",
    f"""
    SELECT CAST(round(sum({_REV_DUCK}), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_type = 'SMALL'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_type = 'MEDIUM' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'LARGE'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 45)
    """,
)
def q290_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR-of-ANDs
    predicate mixing part attributes and line attributes (type/size/
    quantity triples stand in for brand/container/shipmode — header
    note). The optimizer factors the disjunction: part-only conjuncts
    (type+size) prune the broadcast dim per branch, the l_quantity
    bounds evaluate post-join, and the common l_partkey equi-join
    stays a single broadcast hash join — the pre-CNF-factoring
    anti-pattern would be a nested-loop. One aggregate row out."""
    li = table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        table(spark, sf_dir, "part").select("p_partkey", "p_type", "p_size")
    )
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_type") == "SMALL") & F.col("p_size").between(1, 15)
         & q.between(1, 15))
        | ((F.col("p_type") == "MEDIUM") & F.col("p_size").between(1, 25)
           & q.between(10, 30))
        | ((F.col("p_type") == "LARGE") & F.col("p_size").between(1, 35)
           & q.between(20, 45))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "q291_tpch_q20",
    """
    WITH w AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%bolt%'
        AND l_shipdate >= TIMESTAMP '2000-01-01'
        AND l_shipdate <  TIMESTAMP '2001-01-01'
      GROUP BY 1, 2
    ),
    tot AS (SELECT l_partkey AS pk, sum(qty) AS tq FROM w GROUP BY 1),
    dominant AS (
      SELECT DISTINCT l_suppkey FROM w JOIN tot ON l_partkey = pk
      WHERE qty > 0.5 * tq
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN dominant ON s_suppkey = l_suppkey
    ORDER BY s_suppkey
    """,
)
def q291_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: potential part promotion — suppliers holding
    excess share of a named part family's supply in a window. Adapted
    availability := shipped quantity (no partsupp.ps_availqty — header
    note): a supplier qualifies if for SOME %bolt% part it shipped
    more than half that part's year-2000 volume. The nested correlated
    aggregate decorellates into per-(part,supplier) sums joined
    against per-part totals (the per-part total reuses the same
    exchange); quantity sums are integer-valued doubles — exact in
    both engines at any merge order. The qualifying set semi-joins
    supplier; output is supplier-cardinality."""
    parts = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey")
    w = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "2000-01-01")
            & (F.col("l_shipdate") < "2001-01-01")
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"),
              "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = w.groupBy(F.col("l_partkey").alias("pk")).agg(F.sum("qty").alias("tq"))
    dominant = (
        w.join(tot, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("qty") > F.lit(0.5) * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name")
    )
