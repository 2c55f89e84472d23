"""COMMENT ON, ALTER COLUMN TYPE, and row-level-security policies
(reference Catalog/DdlCommandExecutor.h:39-286, AlterColumnRecovery.h,
SqlCreatePolicy + HeavyDBPlanner InjectFilterRule)."""
import numpy as np
import pytest

import heavydb_tpu as hdt
from heavydb_tpu.errors import CatalogError, HeavyTpuError


@pytest.fixture()
def db():
    return hdt.connect()


def _seed(db):
    db.sql("CREATE TABLE emp (dept TEXT, salary INT, region TEXT)")
    db.sql("INSERT INTO emp VALUES "
           "('eng', 100, 'us'), ('eng', 120, 'eu'), "
           "('hr', 80, 'us'), ('sales', 90, 'eu'), ('sales', 95, 'us')")


# ---- COMMENT ON ----

def test_comment_on_table_and_column(db):
    _seed(db)
    db.sql("COMMENT ON TABLE emp IS 'people table'")
    db.sql("COMMENT ON COLUMN emp.salary IS 'base salary, USD'")
    t = db.catalog.get_table("emp")
    assert t.comment == "people table"
    assert t.column_by_name("salary").comment == "base salary, USD"
    db.sql("COMMENT ON TABLE emp IS NULL")
    assert t.comment is None


def test_comment_persists(tmp_path):
    p = str(tmp_path / "data")
    db = hdt.connect(p)
    db.sql("CREATE TABLE c (x INT)")
    db.sql("COMMENT ON TABLE c IS 'kept'")
    db.sql("COMMENT ON COLUMN c.x IS 'col kept'")

    db2 = hdt.connect(p)
    t = db2.catalog.get_table("c")
    assert t.comment == "kept"
    assert t.column_by_name("x").comment == "col kept"


# ---- ALTER COLUMN TYPE ----

def test_alter_column_int_widen_and_float(db):
    _seed(db)
    db.sql("ALTER TABLE emp ALTER COLUMN salary TYPE BIGINT")
    assert db.catalog.get_table("emp").column_by_name("salary") \
        .type.sql_name().startswith("BIGINT")
    rows = db.sql("SELECT sum(salary) FROM emp").rows()
    assert rows[0][0] == 485
    db.sql("ALTER TABLE emp ALTER salary SET DATA TYPE DOUBLE")
    rows = db.sql("SELECT sum(salary) FROM emp").rows()
    assert rows[0][0] == pytest.approx(485.0)


def test_alter_column_narrow_out_of_range(db):
    db.sql("CREATE TABLE n (v INT)")
    db.sql("INSERT INTO n VALUES (100000), (2)")
    with pytest.raises(HeavyTpuError):
        db.sql("ALTER TABLE n ALTER COLUMN v TYPE SMALLINT")
    # table unchanged after the failed ALTER (all-or-nothing swap)
    assert db.sql("SELECT sum(v) FROM n").rows()[0][0] == 100002


def test_alter_column_nulls_vs_not_null(db):
    db.sql("CREATE TABLE m (v INT)")
    db.sql("INSERT INTO m VALUES (1), (NULL)")
    with pytest.raises(HeavyTpuError):
        db.sql("ALTER TABLE m ALTER COLUMN v TYPE BIGINT NOT NULL")
    db.sql("ALTER TABLE m ALTER COLUMN v TYPE BIGINT")
    assert db.sql("SELECT count(*) FROM m WHERE v IS NULL").rows()[0][0] == 1


def test_alter_column_int_to_text(db):
    db.sql("CREATE TABLE s (v INT)")
    db.sql("INSERT INTO s VALUES (7), (8)")
    db.sql("ALTER TABLE s ALTER COLUMN v TYPE TEXT")
    got = {r[0] for r in db.sql("SELECT v FROM s").rows()}
    assert got == {"7", "8"}
    assert db.sql("SELECT count(*) FROM s WHERE v = '7'").rows()[0][0] == 1


def test_alter_column_persists(tmp_path):
    p = str(tmp_path / "data")
    db = hdt.connect(p)
    db.sql("CREATE TABLE a (v INT)")
    db.sql("INSERT INTO a VALUES (5)")
    db.sql("ALTER TABLE a ALTER COLUMN v TYPE DOUBLE")

    db2 = hdt.connect(p)
    assert db2.sql("SELECT v FROM a").rows()[0][0] == pytest.approx(5.0)


# ---- row-level security ----

def _rls_setup(db):
    _seed(db)
    db.sql("CREATE USER bob (password='pw')")
    db.sql("GRANT SELECT ON emp TO bob")


def test_policy_restricts_text_column(db):
    _rls_setup(db)
    db.sql("CREATE POLICY ON COLUMN emp.dept TO bob VALUES ('eng')")
    rows = db.sql("SELECT dept, salary FROM emp", user="bob").rows()
    assert {r[0] for r in rows} == {"eng"}
    assert len(rows) == 2
    # aggregates see only permitted rows
    assert db.sql("SELECT sum(salary) FROM emp", user="bob").rows()[0][0] \
        == 220
    # admin unrestricted
    assert len(db.sql("SELECT * FROM emp", user="admin").rows()) == 5


def test_policy_restricts_int_column(db):
    _rls_setup(db)
    db.sql("CREATE POLICY ON COLUMN emp.salary TO bob VALUES (80, 90)")
    rows = db.sql("SELECT salary FROM emp", user="bob").rows()
    assert sorted(r[0] for r in rows) == [80, 90]


def test_policy_via_role_and_multiple(db):
    _rls_setup(db)
    db.sql("CREATE ROLE analysts")
    db.sql("GRANT analysts TO bob")
    db.sql("CREATE POLICY ON COLUMN emp.dept TO analysts "
           "VALUES ('eng', 'sales')")
    db.sql("CREATE POLICY ON COLUMN emp.region TO bob VALUES ('us')")
    rows = db.sql("SELECT dept, region FROM emp", user="bob").rows()
    assert all(r[0] in ("eng", "sales") and r[1] == "us" for r in rows)
    assert len(rows) == 2  # (eng, us), (sales, us)


def test_policy_applies_in_subquery_and_join(db):
    _rls_setup(db)
    db.sql("CREATE TABLE dim (dept TEXT, hq TEXT)")
    db.sql("INSERT INTO dim VALUES ('eng', 'sf'), ('hr', 'nyc')")
    db.sql("GRANT SELECT ON dim TO bob")
    db.sql("CREATE POLICY ON COLUMN emp.dept TO bob VALUES ('eng')")
    rows = db.sql(
        "SELECT e.dept, d.hq FROM emp e JOIN dim d ON e.dept = d.dept",
        user="bob").rows()
    assert {r[0] for r in rows} == {"eng"}
    n = db.sql(
        "SELECT count(*) FROM (SELECT dept FROM emp)", user="bob"
    ).rows()[0][0]
    assert n == 2


def test_show_and_drop_policy(db):
    _rls_setup(db)
    db.sql("CREATE POLICY ON COLUMN emp.dept TO bob VALUES ('eng')")
    shown = db.sql("SHOW POLICIES bob").rows()
    assert any("emp.dept" in r[0] for r in shown)
    db.sql("DROP POLICY ON COLUMN emp.dept FROM bob")
    assert db.sql("SHOW POLICIES bob").rows() == []
    assert len(db.sql("SELECT * FROM emp", user="bob").rows()) == 5
    with pytest.raises(HeavyTpuError):
        db.sql("DROP POLICY ON COLUMN emp.dept FROM bob")


def test_policy_persists(tmp_path):
    p = str(tmp_path / "data")
    db = hdt.connect(p)
    db.sql("CREATE TABLE t (c TEXT)")
    db.sql("INSERT INTO t VALUES ('a'), ('b')")
    db.sql("CREATE USER u (password='x')")
    db.sql("GRANT SELECT ON t TO u")
    db.sql("CREATE POLICY ON COLUMN t.c TO u VALUES ('a')")

    db2 = hdt.connect(p)
    rows = db2.sql("SELECT c FROM t", user="u").rows()
    assert [r[0] for r in rows] == ["a"]
