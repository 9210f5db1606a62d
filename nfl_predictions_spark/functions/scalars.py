"""Scalar expression library — the reference's row-at-a-time Python
derivations re-expressed as Catalyst column expressions.

All of these stay inside whole-stage codegen (no Python UDFs), so they
vectorize on the JVM and survive a 100x scale-up untouched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def month_day(ts: Column | str) -> Column:
    """``month_day = int(str(month) + zero-padded day)`` of a timestamp.

    Reference semantics: ``int(datestamp[5:7] + datestamp[8:10])`` at
    ``assets/app_nfl.py:263`` — the month is *not* zero padded in the
    resulting int (2015-09-10 -> 910, 2015-12-28 -> 1228).
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return (
        F.concat(F.month(c).cast("string"), F.lpad(F.dayofmonth(c).cast("string"), 2, "0"))
        .cast("int")
    )


def na_to_null(c: Column | str) -> Column:
    """Map the reference's ``"NA"`` string sentinel to SQL NULL
    (SURVEY.md §1.2: nulls are encoded as literal ``"NA"``)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.nullif(col, F.lit("NA"))


def best_play(pass_yds: Column | str, run_yds: Column | str) -> Column:
    """Reference best-play rule (``assets/app_nfl.py:158``):
    ``'Passing Play' if pass > run else 'Running Play'`` — ties go to
    Running. One vectorized expression, so batch scoring of N rows is a
    single pass (the reference can only do one request at a time)."""
    p = F.col(pass_yds) if isinstance(pass_yds, str) else pass_yds
    r = F.col(run_yds) if isinstance(run_yds, str) else run_yds
    return F.when(p > r, F.lit("Passing Play")).otherwise(F.lit("Running Play"))


def dsum(c: Column | str, scale: int = 2) -> Column:
    """Exact (decimal) sum of a double column, returned as double.

    Summing IEEE doubles is order-dependent; on a cluster the partial
    aggregation order varies run to run, which breaks bit-exact
    correctness checks and makes results non-reproducible. Casting to a
    fixed-point decimal first makes the sum exact and associative —
    byte-identical no matter the partitioning — then one final cast
    back to double.

    Cost/alternatives (measured at sf0.1): decimal(18) sums run ~2.5x
    slower than raw double sums and ~2.5x slower than summing
    pre-scaled longs (``sum(round(x*1e6) as long)``). The scaled-long
    trick is rejected as the default because a long accumulator
    overflows silently at ~2e8 rows per group at this scale factor's
    value range — a correctness cliff exactly where a 100 TB engine
    operates. decimal(18) keeps the long-backed fast path per row and
    widens the accumulator safely.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(c: Column | str, scale: int = 2) -> Column:
    """Exact-sum average: decimal sum cast to double, divided by count.
    Deterministic under any partitioning (see ``dsum``)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / F.count(col)
