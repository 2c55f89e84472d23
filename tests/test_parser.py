from heavydb_tpu.errors import ParserError
from heavydb_tpu.sql import ast as A
from heavydb_tpu.sql.parser import parse, parse_many
import pytest


def test_select_basic():
    s = parse("SELECT a, b AS bb, 1+2 FROM t WHERE a > 1")
    assert isinstance(s, A.Select)
    assert len(s.projections) == 3
    assert s.projections[1][1] == "bb"
    assert isinstance(s.where, A.Binary)


def test_joins():
    s = parse(
        "SELECT * FROM a JOIN b ON a.k = b.k LEFT OUTER JOIN c ON b.j = c.j"
    )
    j = s.from_
    assert isinstance(j, A.JoinRef) and j.kind == "LEFT"
    assert isinstance(j.left, A.JoinRef) and j.left.kind == "INNER"


def test_right_join_swapped():
    s = parse("SELECT * FROM a RIGHT JOIN b ON a.k = b.k")
    j = s.from_
    assert j.kind == "LEFT"
    assert j.left.name == "b" and j.right.name == "a"


def test_group_order_limit():
    s = parse(
        "SELECT x, count(*) c FROM t GROUP BY x HAVING count(*) > 1 "
        "ORDER BY c DESC NULLS LAST LIMIT 5 OFFSET 2"
    )
    assert len(s.group_by) == 1 and s.having is not None
    assert s.order_by[0].asc is False and s.order_by[0].nulls_first is False
    assert s.limit == 5 and s.offset == 2


def test_case_simple_rewrite():
    s = parse("SELECT CASE x WHEN 1 THEN 'a' ELSE 'b' END FROM t")
    c = s.projections[0][0]
    assert isinstance(c, A.CaseWhen)
    assert isinstance(c.whens[0][0], A.Binary) and c.whens[0][0].op == "="


def test_string_escapes():
    s = parse("SELECT 'it''s'")
    assert s.projections[0][0].value == "it's"


def test_numeric_literals():
    s = parse("SELECT 1, 2.5, 1e3, .5, -7")
    kinds = [p[0].kind if isinstance(p[0], A.Literal) else None for p in s.projections]
    assert kinds[0] == "num_int"
    assert kinds[1] == "num_decimal"
    assert kinds[2] == "num_float"


def test_in_between_like():
    s = parse(
        "SELECT 1 FROM t WHERE a IN (1,2) AND b NOT BETWEEN 1 AND 2 "
        "AND c LIKE 'x%' ESCAPE '!' AND d NOT ILIKE 'y_'"
    )
    assert s.where is not None


def test_create_table():
    s = parse(
        "CREATE TABLE IF NOT EXISTS t (a INT NOT NULL, b DECIMAL(10,2), "
        "c TEXT ENCODING DICT(32), d TIMESTAMP(3)) WITH (fragment_size=1000)"
    )
    assert s.if_not_exists and len(s.columns) == 4
    assert s.columns[1].type_name.params == (10, 2)
    assert s.columns[2].type_name.encoding == "DICT"
    assert s.options["fragment_size"] == 1000


def test_ctas_and_union_and_cte():
    s = parse("CREATE TABLE t2 AS SELECT * FROM t")
    assert s.as_select is not None
    s = parse("WITH c AS (SELECT 1) SELECT * FROM c UNION ALL SELECT 2")
    assert s.ctes and s.set_ops[0][0] == "UNION ALL"


def test_errors():
    with pytest.raises(ParserError):
        parse("SELECT FROM t")
    with pytest.raises(ParserError):
        parse("SELECT 1 FROM t WHERE")
    with pytest.raises(ParserError):
        parse("FROB x")


def test_multi_statements():
    out = parse_many("SELECT 1; SELECT 2;")
    assert len(out) == 2


def test_window_syntax():
    s = parse("SELECT ROW_NUMBER() OVER (PARTITION BY a ORDER BY b DESC) FROM t")
    w = s.projections[0][0]
    assert isinstance(w, A.WindowFuncCall)
    assert len(w.spec.partition_by) == 1
