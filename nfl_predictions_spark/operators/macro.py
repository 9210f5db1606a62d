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

from pyspark.sql import DataFrame, SparkSession
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
