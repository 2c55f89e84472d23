"""TPC-H-shaped differential suite vs the SQLite oracle — the reference
validates these query shapes in Tests/ExecuteTest.cpp and benchmarks them
in Benchmarks/ (lineitem/orders/customer schema scaled down).  Covers
multi-way joins, date filters, aggregations, HAVING, CASE, top-k."""

import pytest

import heavydb_tpu as hdt
from tests.test_sqlite_oracle import Oracle


@pytest.fixture(scope="module")
def tpch(rng):
    db = hdt.connect()
    o = Oracle(db)
    n_part, n_cust, n_ord, n_li = 200, 150, 1200, 6000
    o.load(
        "part",
        {
            "p_partkey": list(range(n_part)),
            "p_brand": [f"Brand#{v}" for v in rng.integers(1, 6, n_part)],
            "p_size": [int(v) for v in rng.integers(1, 51, n_part)],
            "p_retailprice": [
                float(round(900 + v, 2)) for v in rng.uniform(0, 1200, n_part)
            ],
        },
        {"p_partkey": "INT", "p_brand": "TEXT", "p_size": "INT",
         "p_retailprice": "DOUBLE"},
    )
    o.load(
        "customer",
        {
            "c_custkey": list(range(n_cust)),
            "c_mktsegment": [
                ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
                 "FURNITURE"][v]
                for v in rng.integers(0, 5, n_cust)
            ],
            "c_acctbal": [
                float(round(v, 2)) for v in rng.uniform(-999, 9999, n_cust)
            ],
        },
        {"c_custkey": "INT", "c_mktsegment": "TEXT", "c_acctbal": "DOUBLE"},
    )
    o.load(
        "orders",
        {
            "o_orderkey": list(range(n_ord)),
            "o_custkey": [int(v) for v in rng.integers(0, n_cust, n_ord)],
            "o_orderdate": [
                int(v) for v in rng.integers(8000, 11000, n_ord)
            ],  # days-ish ints keep both engines' date math out of play
            "o_totalprice": [
                float(round(v, 2)) for v in rng.uniform(100, 400000, n_ord)
            ],
        },
        {"o_orderkey": "INT", "o_custkey": "INT", "o_orderdate": "INT",
         "o_totalprice": "DOUBLE"},
    )
    o.load(
        "lineitem",
        {
            "l_orderkey": [int(v) for v in rng.integers(0, n_ord, n_li)],
            "l_partkey": [int(v) for v in rng.integers(0, n_part, n_li)],
            "l_quantity": [int(v) for v in rng.integers(1, 51, n_li)],
            "l_extendedprice": [
                float(round(v, 2)) for v in rng.uniform(900, 100000, n_li)
            ],
            "l_discount": [
                float(round(v, 2)) for v in rng.uniform(0, 0.1, n_li)
            ],
            "l_returnflag": [
                ["A", "N", "R"][v] for v in rng.integers(0, 3, n_li)
            ],
            "l_shipdate": [int(v) for v in rng.integers(8000, 11000, n_li)],
        },
        {"l_orderkey": "INT", "l_partkey": "INT", "l_quantity": "INT",
         "l_extendedprice": "DOUBLE", "l_discount": "DOUBLE",
         "l_returnflag": "TEXT", "l_shipdate": "INT"},
    )
    return o


Q1 = (  # pricing summary (TPC-H Q1 shape)
    "SELECT l_returnflag, count(*), sum(l_quantity), "
    "sum(l_extendedprice * (1 - l_discount)), avg(l_extendedprice) "
    "FROM lineitem WHERE l_shipdate <= 10900 "
    "GROUP BY l_returnflag ORDER BY l_returnflag"
)
Q3 = (  # shipping priority (Q3 shape): 3-way join + group + topk
    "SELECT o.o_orderkey, sum(l.l_extendedprice * (1 - l.l_discount)) AS rev "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < 9500 "
    "AND l.l_shipdate > 9000 "
    "GROUP BY o.o_orderkey ORDER BY rev DESC, o.o_orderkey LIMIT 10"
)
Q5 = (  # local supplier volume (Q5-ish): join + segment grouping
    "SELECT c.c_mktsegment, sum(l.l_extendedprice * (1 - l.l_discount)) "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"
)
Q6 = (  # forecast revenue change (Q6 shape): pure scan-filter-agg
    "SELECT sum(l_extendedprice * l_discount) FROM lineitem "
    "WHERE l_shipdate >= 8500 AND l_shipdate < 9500 "
    "AND l_discount BETWEEN 0.02 AND 0.08 AND l_quantity < 24"
)
Q10 = (  # returned item reporting (Q10 shape) + HAVING
    "SELECT c.c_custkey, count(*) AS cnt, "
    "sum(l.l_extendedprice * (1 - l.l_discount)) AS rev "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE l.l_returnflag = 'R' GROUP BY c.c_custkey "
    "HAVING count(*) > 5 ORDER BY rev DESC, c.c_custkey LIMIT 20"
)
Q12 = (  # shipmode priority (Q12 shape): CASE aggregation
    "SELECT l_returnflag, "
    "sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS high, "
    "sum(CASE WHEN o_totalprice <= 200000 THEN 1 ELSE 0 END) AS low "
    "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
    "GROUP BY l_returnflag ORDER BY l_returnflag"
)
Q14 = (  # promo revenue (Q14 shape): join + conditional ratio
    "SELECT 100.0 * sum(CASE WHEN p.p_brand = 'Brand#1' "
    "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END) "
    "/ sum(l.l_extendedprice * (1 - l.l_discount)) "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE l.l_shipdate >= 9000 AND l.l_shipdate < 9300"
)
Q18 = (  # large volume customer (Q18 shape): agg subquery + IN
    "SELECT o.o_orderkey, o.o_totalprice, sum(l.l_quantity) "
    "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
    "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem "
    "GROUP BY l_orderkey HAVING sum(l_quantity) > 150) "
    "GROUP BY o.o_orderkey, o.o_totalprice "
    "ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 10"
)


Q2 = (  # minimum-cost supplier (Q2 shape): correlated MIN subquery
    "SELECT p.p_partkey, l.l_extendedprice FROM part p "
    "JOIN lineitem l ON l.l_partkey = p.p_partkey "
    "WHERE p.p_size < 20 AND l.l_extendedprice = "
    "(SELECT min(l2.l_extendedprice) FROM lineitem l2 "
    "WHERE l2.l_partkey = p.p_partkey) "
    "ORDER BY l.l_extendedprice, p.p_partkey LIMIT 15"
)
Q4 = (  # order priority check (Q4 shape): correlated EXISTS
    "SELECT o.o_custkey, count(*) FROM orders o "
    "WHERE o.o_orderdate >= 9000 AND o.o_orderdate < 10000 "
    "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
    "AND l.l_shipdate > o.o_orderdate) "
    "GROUP BY o.o_custkey ORDER BY o.o_custkey LIMIT 20"
)
Q11 = (  # important stock (Q11 shape): HAVING vs global scalar subquery
    "SELECT l_partkey, sum(l_extendedprice * l_quantity) AS val "
    "FROM lineitem GROUP BY l_partkey "
    "HAVING sum(l_extendedprice * l_quantity) > "
    "(SELECT sum(l_extendedprice * l_quantity) * 0.01 FROM lineitem) "
    "ORDER BY val DESC, l_partkey LIMIT 15"
)
Q15 = (  # top supplier (Q15 shape): CTE referenced from a subquery
    "WITH rev AS (SELECT l_partkey, "
    "sum(l_extendedprice * (1 - l_discount)) AS total FROM lineitem "
    "WHERE l_shipdate >= 9000 AND l_shipdate < 9600 GROUP BY l_partkey) "
    "SELECT l_partkey, total FROM rev "
    "WHERE total = (SELECT max(total) FROM rev)"
)
Q16 = (  # parts/supplier relationship (Q16 shape): NOT IN subquery
    "SELECT p_brand, count(*) FROM part "
    "WHERE p_size IN (5, 10, 15, 20) AND p_partkey NOT IN "
    "(SELECT l_partkey FROM lineitem WHERE l_quantity > 49) "
    "GROUP BY p_brand ORDER BY p_brand"
)
Q17 = (  # small-quantity-order revenue (Q17 shape): correlated AVG
    "SELECT sum(l.l_extendedprice) / 7.0 FROM lineitem l "
    "JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE p.p_brand = 'Brand#2' AND l.l_quantity < "
    "(SELECT 0.6 * avg(l2.l_quantity) FROM lineitem l2 "
    "WHERE l2.l_partkey = p.p_partkey)"
)
Q20 = (  # potential part promotion (Q20 shape): nested IN + correlated agg
    "SELECT c_custkey FROM customer WHERE c_custkey IN "
    "(SELECT o_custkey FROM orders o WHERE o_totalprice > "
    "(SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2 "
    "WHERE o2.o_custkey = o.o_custkey)) "
    "ORDER BY c_custkey LIMIT 20"
)
Q21 = (  # suppliers who kept waiting (Q21 shape): EXISTS + NOT EXISTS
    "SELECT c.c_custkey, count(*) FROM customer c "
    "JOIN orders o ON o.o_custkey = c.c_custkey "
    "WHERE EXISTS (SELECT 1 FROM lineitem l "
    "WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45) "
    "AND NOT EXISTS (SELECT 1 FROM lineitem l2 "
    "WHERE l2.l_orderkey = o.o_orderkey AND l2.l_discount > 0.09) "
    "GROUP BY c.c_custkey ORDER BY count(*) DESC, c.c_custkey LIMIT 15"
)
Q22 = (  # global sales opportunity (Q22 shape): scalar subquery + NOT EXISTS
    "SELECT count(*), sum(c_acctbal) FROM customer c "
    "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer "
    "WHERE c_acctbal > 0.0) "
    "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
)
Q7 = (  # volume shipping (Q7 shape): cross-filtered nation pairs
    "SELECT c.c_mktsegment, l.l_returnflag, "
    "sum(l.l_extendedprice * (1 - l.l_discount)) "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE (c.c_mktsegment = 'BUILDING' AND l.l_returnflag = 'R') "
    "OR (c.c_mktsegment = 'MACHINERY' AND l.l_returnflag = 'A') "
    "GROUP BY c.c_mktsegment, l.l_returnflag "
    "ORDER BY c.c_mktsegment, l.l_returnflag"
)
Q8 = (  # national market share (Q8 shape): conditional ratio per period
    "SELECT o.o_orderdate / 1000 AS yr, "
    "sum(CASE WHEN c.c_mktsegment = 'BUILDING' "
    "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END) "
    "/ sum(l.l_extendedprice * (1 - l.l_discount)) AS share "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "GROUP BY o.o_orderdate / 1000 ORDER BY yr"
)
Q9 = (  # product type profit (Q9 shape): LIKE filter + 2-key period group
    "SELECT c.c_mktsegment, o.o_orderdate / 1000 AS yr, "
    "sum(l.l_extendedprice * (1 - l.l_discount) - 0.5 * l.l_quantity) "
    "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey "
    "JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "JOIN customer c ON c.c_custkey = o.o_custkey "
    "WHERE p.p_brand LIKE 'Brand#%' AND p.p_size > 10 "
    "GROUP BY c.c_mktsegment, o.o_orderdate / 1000 "
    "ORDER BY c.c_mktsegment, yr"
)
Q13 = (  # customer order distribution (Q13 shape): LEFT JOIN with a
    # residual ON condition + two-level aggregation over the counts
    "SELECT c_count, count(*) AS custdist FROM "
    "(SELECT c.c_custkey, count(o.o_orderkey) AS c_count "
    "FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
    "AND o.o_totalprice > 50000 GROUP BY c.c_custkey) "
    "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
)
Q19 = (  # discounted revenue (Q19 shape): disjunctive join predicate
    "SELECT sum(l.l_extendedprice * (1 - l.l_discount)) "
    "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
    "WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 "
    "AND p.p_size BETWEEN 1 AND 15) "
    "OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20 "
    "AND p.p_size BETWEEN 1 AND 25) "
    "OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 "
    "AND p.p_size BETWEEN 1 AND 50)"
)


@pytest.mark.parametrize(
    "sql",
    [Q1, Q2, Q3, Q4, Q5, Q6, Q7, Q8, Q9, Q10, Q11, Q12, Q13, Q14, Q15,
     Q16, Q17, Q18, Q19, Q20, Q21, Q22],
    ids=["q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9", "q10",
         "q11", "q12", "q13", "q14", "q15", "q16", "q17", "q18", "q19",
         "q20", "q21", "q22"])
def test_tpch_shape(tpch, sql):
    tpch.check(sql)
