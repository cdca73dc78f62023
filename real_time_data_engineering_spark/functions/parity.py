"""Column builders that are bit-identical between Spark and DuckDB.

The engine's correctness gate hash-compares Spark results against a
DuckDB oracle, so every aggregate has to be *deterministic across
partitionings* and *identical across engines*. Doubles fail both
requirements (order-dependent summation; engine-specific rounding), so:

* money/measure columns are cast to DECIMAL(12,2) at the scan —
  the corpus stores 2-decimal values in doubles with ~1e-9 noise, and
  both engines' double→decimal casts round to the same nearest cent;
* sums/products stay decimal (exact, associative → partial aggregation
  over any number of partitions is stable);
* ratios are produced by ONE double division of two exact operands —
  IEEE-754 division is deterministic, so both engines emit the same bits;
* nothing ever calls ROUND() on a double (Spark rounds the shortest
  decimal rendering via BigDecimal HALF_UP; DuckDB rounds the binary
  value — they disagree on values like 2.675).

DECIMAL(12,2) is chosen so a two-factor product is (25,4) and a
three-factor product is (38,6) — inside both engines' 38-digit cap,
hence exact, at any data scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_T = "decimal(12,2)"


def money(c: Column | str) -> Column:
    """Exact cents: double → DECIMAL(12,2)."""
    return F.col(c).cast(MONEY_T) if isinstance(c, str) else c.cast(MONEY_T)


def sum_money(c: Column | str) -> Column:
    """Exact decimal sum surfaced as a stable double."""
    return F.sum(money(c)).cast("double")


def ratio(num: Column, den: Column) -> Column:
    """One double division of exact operands — bit-stable across engines."""
    return num.cast("double") / den.cast("double")


def ts_str(c: Column | str) -> Column:
    """Canonical microsecond timestamp rendering (oracle: strftime '%f')."""
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")


# Oracle-side (DuckDB) fragments mirroring the above, for use in oracle SQL.
SQL_MONEY = "CAST({c} AS DECIMAL(12,2))"
SQL_SUM_MONEY = "CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DOUBLE)"
SQL_TS_STR = "strftime({c}, '%Y-%m-%d %H:%M:%S.%f')"
