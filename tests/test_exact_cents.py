"""Exact-cents aggregate invariants: the spark.sql split-sum forms used
by q1/q5 (and the plain-long form used by q3) must reproduce EXACT
integer arithmetic for any on-grid money values — including half-cent
rounding boundaries, the failure mode the sf10 sweep caught in r6."""

import random
from fractions import Fraction

from pyspark.sql import functions as F


def _gen_rows(n, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        qty = rng.randint(1, 50)
        # cents-grid price/discount incl. values engineered to land sums
        # on .xx5 half-cent boundaries after the /1e4 discount product
        price_c = rng.choice([rng.randint(90000, 10500000),
                              10000045, 9999995, 55])
        disc_c = rng.randint(0, 10)
        flag = rng.choice(["A", "N", "R"])
        rows.append((flag, float(qty), price_c / 100.0, disc_c / 100.0))
    return rows


def test_split_sum_sql_matches_python_exact(spark):
    rows = _gen_rows(4000, seed=7)
    df = spark.createDataFrame(
        rows, "flag string, l_quantity double, l_extendedprice double,"
              " l_discount double")
    df.createOrReplaceTempView("t_cents")
    S = 1 << 16
    D = "decimal(38,0)"
    cp = "cast(l_extendedprice * 100 + 0.5 as bigint)"
    cd = "cast(l_discount * 100 + 0.5 as bigint)"
    c4 = f"{cp} * (100 - {cd})"
    got = {r["flag"]: (int(r["s4"]), float(r["rev"])) for r in spark.sql(f"""
        SELECT flag,
               cast(cast(_h as {D}) * {S} + cast(_l as {D}) as string) AS s4,
               cast(((cast(_h as {D}) * {S} + cast(_l as {D})) + 50)
                    div 100 / 100.0 as double) AS rev
        FROM (SELECT flag, sum(({c4}) div {S}) AS _h,
                     sum(({c4}) % {S}) AS _l
              FROM t_cents GROUP BY flag)""").collect()}
    # python exact integers (no floats anywhere)
    exact: dict[str, int] = {}
    for flag, _qty, price, disc in rows:
        pc = int(Fraction(str(price)) * 100)
        dc = int(Fraction(str(disc)) * 100)
        exact[flag] = exact.get(flag, 0) + pc * (100 - dc)
    assert set(got) == set(exact)
    for flag, s4 in exact.items():
        assert got[flag][0] == s4, flag
        # round-half-up to cents, then exact decimal->double
        assert got[flag][1] == ((s4 + 50) // 100) / 100.0, flag


def test_plain_long_sum_matches_python_exact_per_bounded_group(spark):
    # q3's form: per-group row counts are bounded, no split needed
    rows = _gen_rows(2000, seed=11)
    df = spark.createDataFrame(
        rows, "flag string, l_quantity double, l_extendedprice double,"
              " l_discount double").withColumn(
        "grp", (F.rand(5) * 500).cast("int"))
    df.createOrReplaceTempView("t_cents_g")
    cp = "cast(l_extendedprice * 100 + 0.5 as bigint)"
    cd = "cast(l_discount * 100 + 0.5 as bigint)"
    got = {r["grp"]: int(r["s4"]) for r in spark.sql(f"""
        SELECT grp, sum({cp} * (100 - {cd})) AS s4
        FROM t_cents_g GROUP BY grp""").collect()}
    pdf = df.select("grp", "l_extendedprice", "l_discount").collect()
    exact: dict[int, int] = {}
    for r in pdf:
        pc = int(Fraction(str(r["l_extendedprice"])) * 100)
        dc = int(Fraction(str(r["l_discount"])) * 100)
        exact[r["grp"]] = exact.get(r["grp"], 0) + pc * (100 - dc)
    assert got == exact
