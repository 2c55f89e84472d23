"""TEXT ENCODING NONE execution + TRY_CAST + SqlStringOpKind parity.

Reference: none-encoded strings execute through the same ~45 string-op
matrix as dict strings (StringOps/StringOps.h); our design interns them
into a per-generation lazy dictionary at query time
(storage/table.Table.lazy_text_dict — the StringDictionaryProxy role),
so every dictionary kernel applies unchanged.  TRY_CAST matches
StringOps.cpp:98 TryStringCast::numericEval (NULL on parse failure).
"""

import numpy as np
import pytest


@pytest.fixture()
def ndb(db):
    db.sql("CREATE TABLE n (a TEXT ENCODING NONE, b INT)")
    db.sql(
        "INSERT INTO n VALUES ('hello', 1), ('world', 2), ('hello', 3), "
        "(NULL, 4), ('Grüße', 5)"
    )
    return db


def test_projection_and_nulls(ndb):
    assert ndb.sql("SELECT a, b FROM n ORDER BY b").rows() == [
        ("hello", 1), ("world", 2), ("hello", 3), (None, 4), ("Grüße", 5),
    ]


def test_filter_eq_like(ndb):
    assert ndb.sql("SELECT COUNT(*) FROM n WHERE a = 'hello'").scalar() == 2
    assert ndb.sql("SELECT COUNT(*) FROM n WHERE a LIKE 'h%'").scalar() == 2
    assert ndb.sql("SELECT COUNT(*) FROM n WHERE a IS NULL").scalar() == 1


def test_group_by(ndb):
    rows = ndb.sql(
        "SELECT a, COUNT(*), SUM(b) FROM n GROUP BY a ORDER BY a"
    ).rows()
    assert rows == [("Grüße", 1, 5), ("hello", 2, 4),
                    ("world", 1, 2), (None, 1, 4)]


def test_transforms_apply(ndb):
    assert ndb.sql(
        "SELECT UPPER(a) FROM n WHERE b = 1"
    ).scalar() == "HELLO"
    assert ndb.sql(
        "SELECT a || '!' FROM n WHERE b = 2"
    ).scalar() == "world!"


def test_join_with_dict_column(ndb):
    ndb.sql("CREATE TABLE d (a TEXT, c INT)")
    ndb.sql("INSERT INTO d VALUES ('hello', 10), ('mars', 20)")
    rows = ndb.sql(
        "SELECT n.b, d.c FROM n JOIN d ON n.a = d.a ORDER BY n.b"
    ).rows()
    assert rows == [(1, 10), (3, 10)]


def test_join_two_none_encoded(ndb):
    ndb.sql("CREATE TABLE m (a TEXT ENCODING NONE, c INT)")
    ndb.sql("INSERT INTO m VALUES ('world', 7), ('hello', 8)")
    rows = ndb.sql(
        "SELECT n.b, m.c FROM n JOIN m ON n.a = m.a ORDER BY n.b, m.c"
    ).rows()
    assert rows == [(1, 8), (2, 7), (3, 8)]


def test_order_by_is_lexicographic(ndb):
    vals = [r[0] for r in ndb.sql(
        "SELECT a FROM n WHERE a IS NOT NULL ORDER BY a"
    ).rows()]
    assert vals == sorted(vals)


def test_ctas_from_none_encoded(ndb):
    ndb.sql("CREATE TABLE c2 AS SELECT a, b * 2 AS bb FROM n")
    assert ndb.sql("SELECT a FROM c2 WHERE bb = 2").scalar() == "hello"


def test_update_delete_inplace(ndb):
    ndb.sql("UPDATE n SET a = 'patched' WHERE b = 2")
    assert ndb.sql("SELECT a FROM n WHERE b = 2").scalar() == "patched"
    ndb.sql("UPDATE n SET a = a || '?' WHERE b = 1")
    assert ndb.sql("SELECT a FROM n WHERE b = 1").scalar() == "hello?"
    ndb.sql("DELETE FROM n WHERE b = 3")
    assert ndb.sql("SELECT COUNT(*) FROM n").scalar() == 4
    assert ndb.sql(
        "SELECT a, COUNT(*) FROM n GROUP BY a ORDER BY a"
    ).rows() == [("Grüße", 1), ("hello?", 1), ("patched", 1), (None, 1)]


def test_persistence_roundtrip(tmp_path):
    import heavydb_tpu as hdt

    path = str(tmp_path / "nsdb")
    db = hdt.connect(path)
    db.sql("CREATE TABLE p (a TEXT ENCODING NONE, b INT)")
    db.sql("INSERT INTO p VALUES ('x', 1), (NULL, 2), ('Grüße', 3)")
    db.sql("UPDATE p SET a = 'y' WHERE b = 1")
    db.checkpoint()
    db2 = hdt.connect(path)
    assert db2.sql("SELECT a, b FROM p ORDER BY b").rows() == [
        ("y", 1), (None, 2), ("Grüße", 3),
    ]


def test_copy_csv(ndb, tmp_path):
    f = tmp_path / "ns.csv"
    f.write_text("a,b\nfoo,1\nbar,2\n,3\nfoo,4\n")
    ndb.sql("CREATE TABLE cc (a TEXT ENCODING NONE, b INT)")
    ndb.sql(f"COPY cc FROM '{f}' WITH (header='true')")
    assert ndb.sql(
        "SELECT a, COUNT(*) FROM cc GROUP BY a ORDER BY a"
    ).rows() == [("bar", 1), ("foo", 2), (None, 1)]


# ---------------------------------------------------------------------------
# TRY_CAST (reference TryStringCast, StringOps.cpp:98)
# ---------------------------------------------------------------------------


@pytest.fixture()
def tdb(db):
    db.sql("CREATE TABLE tc (s TEXT, n TEXT ENCODING NONE, k INT)")
    db.sql(
        "INSERT INTO tc VALUES "
        "('12', '2023-01-15', 1), "
        "('oops', 'not-a-date', 2), "
        "('3.75', '2024-06-30 12:30:00', 3), "
        "(NULL, NULL, 4), "
        "('-7', '1999-12-31', 5)"
    )
    return db


def test_try_cast_int(tdb):
    rows = tdb.sql("SELECT TRY_CAST(s AS INT), k FROM tc ORDER BY k").rows()
    assert rows == [(12, 1), (None, 2), (None, 3), (None, 4), (-7, 5)]


def test_try_cast_double(tdb):
    rows = tdb.sql(
        "SELECT TRY_CAST(s AS DOUBLE), k FROM tc ORDER BY k"
    ).rows()
    assert rows[0][0] == 12.0 and rows[2][0] == 3.75 and rows[4][0] == -7.0
    assert rows[1][0] is None and rows[3][0] is None


def test_try_cast_decimal(tdb):
    rows = tdb.sql(
        "SELECT TRY_CAST(s AS DECIMAL(10, 2)), k FROM tc ORDER BY k"
    ).rows()
    assert rows[2][0] == 3.75 and rows[1][0] is None


def test_try_cast_date(tdb):
    rows = tdb.sql("SELECT TRY_CAST(n AS DATE), k FROM tc ORDER BY k").rows()
    import datetime

    assert rows[0][0] == datetime.date(2023, 1, 15)
    assert rows[1][0] is None
    assert rows[4][0] == datetime.date(1999, 12, 31)


def test_try_cast_timestamp(tdb):
    rows = tdb.sql(
        "SELECT TRY_CAST(n AS TIMESTAMP), k FROM tc ORDER BY k"
    ).rows()
    assert rows[2][0] is not None and rows[1][0] is None


def test_try_cast_in_predicate(tdb):
    assert tdb.sql(
        "SELECT COUNT(*) FROM tc WHERE TRY_CAST(n AS DATE) > '2023-06-01'"
    ).scalar() == 1


def test_try_cast_aggregate(tdb):
    assert tdb.sql(
        "SELECT SUM(TRY_CAST(s AS INT)) FROM tc"
    ).scalar() == 5


# ---------------------------------------------------------------------------
# Full SqlStringOpKind matrix (reference Shared/sqldefs.h:93-140) executed
# over BOTH encodings.  One canonical call per op kind.
# ---------------------------------------------------------------------------

_OP_CASES = [
    # (sql expression over column {c}, input, expected)
    ("LOWER({c})", "AbC", "abc"),
    ("LCASE({c})", "AbC", "abc"),
    ("UPPER({c})", "AbC", "ABC"),
    ("UCASE({c})", "AbC", "ABC"),
    ("INITCAP({c})", "hello world", "Hello World"),
    ("REVERSE({c})", "abc", "cba"),
    ("LENGTH({c})", "abcd", 4),
    ("CHAR_LENGTH({c})", "abcd", 4),
    ("SPACE(3) || {c}", "x", "   x"),
    ("LEFT({c}, 2)", "abcd", "ab"),
    ("RIGHT({c}, 2)", "abcd", "cd"),
    ("GREATEST({c}, 'b')", "a", "b"),
    ("LEAST({c}, 'b')", "a", "a"),
    ("ENDSWITH({c}, 'cd')", "abcd", True),
    ("STARTSWITH({c}, 'ab')", "abcd", True),
    ("CONTAINS({c}, 'bc')", "abcd", True),
    ("REPEAT({c}, 2)", "ab", "abab"),
    ("CONCAT({c}, '!')", "ab", "ab!"),
    ("'pre' || {c}", "ab", "preab"),  # RCONCAT shape
    ("LPAD({c}, 4, '*')", "ab", "**ab"),
    ("RPAD({c}, 4, '*')", "ab", "ab**"),
    ("MID({c}, 2, 2)", "abcd", "bc"),
    ("TRIM({c})", " ab ", "ab"),
    ("LTRIM({c})", " ab ", "ab "),
    ("RTRIM({c})", " ab ", " ab"),
    ("SUBSTR({c}, 2, 2)", "abcd", "bc"),
    ("SUBSTRING({c}, 2, 2)", "abcd", "bc"),
    ("OVERLAY({c} PLACING 'XX' FROM 2)", "abcd", "aXXd"),
    ("REPLACE({c}, 'b', 'Z')", "abcb", "aZcZ"),
    ("SPLIT_PART({c}, ',', 2)", "a,b,c", "b"),
    ("REGEXP_REPLACE({c}, '[0-9]+', '#')", "a12b", "a#b"),
    ("REGEXP_SUBSTR({c}, '[0-9]+')", "a12b", "12"),
    ("REGEXP_COUNT({c}, '[0-9]')", "a12b", 2),
    ("JSON_VALUE({c}, '$.k')", '{"k": "v"}', "v"),
    ("BASE64_ENCODE({c})", "ab", "YWI="),
    ("BASE64_DECODE({c})", "YWI=", "ab"),
    ("URL_ENCODE({c})", "a b", "a%20b"),
    ("URL_DECODE({c})", "a%20b", "a b"),
    ("TRY_CAST({c} AS INT)", "42", 42),
    ("POSITION('b' IN {c})", "abc", 2),
    ("JAROWINKLER_SIMILARITY({c}, 'abc')", "abc", 100),
    ("LEVENSHTEIN_DISTANCE({c}, 'axc')", "abc", 1),
]


@pytest.mark.parametrize("encoding", ["DICT", "NONE"])
def test_string_op_matrix(db, encoding):
    enc = "" if encoding == "DICT" else " ENCODING NONE"
    db.sql(f"CREATE TABLE mx (c TEXT{enc}, k INT)")
    inputs = sorted({inp for _, inp, _ in _OP_CASES})
    for i, inp in enumerate(inputs):
        q = inp.replace("'", "''")
        db.sql(f"INSERT INTO mx VALUES ('{q}', {i})")
    failures = []
    for expr, inp, want in _OP_CASES:
        k = inputs.index(inp)
        got = db.sql(
            f"SELECT {expr.format(c='c')} FROM mx WHERE k = {k}"
        ).scalar()
        if isinstance(want, bool):
            got = bool(got)
        if got != want:
            failures.append((expr, got, want))
    assert not failures, failures


def test_hash_op(db):
    # HASH kind (53-bit, bit-parity with reference StringOps.cpp:335)
    db.sql("CREATE TABLE hx (c TEXT ENCODING NONE)")
    db.sql("INSERT INTO hx VALUES ('abc')")
    v = db.sql("SELECT HASH(c) FROM hx").scalar()
    assert isinstance(v, (int, np.integer)) and v > 0
