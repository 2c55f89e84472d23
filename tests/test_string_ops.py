"""String kernel tests (reference StringOps/ op set via translation maps)."""

import pytest


@pytest.fixture()
def sdb(db):
    db.sql("CREATE TABLE s (t TEXT, k INT)")
    db.sql(
        "INSERT INTO s VALUES ('Hello World', 1), ('  pad  ', 2), "
        "('a,b,c', 3), (NULL, 4), ('Grüße', 5)"
    )
    return db


def test_upper_lower(sdb):
    rows = sdb.sql("SELECT UPPER(t), LOWER(t) FROM s WHERE k = 1").rows()
    assert rows == [("HELLO WORLD", "hello world")]


def test_substring_replace(sdb):
    assert sdb.sql(
        "SELECT SUBSTRING(t, 1, 5) FROM s WHERE k = 1"
    ).scalar() == "Hello"
    assert sdb.sql(
        "SELECT REPLACE(t, 'World', 'TPU') FROM s WHERE k = 1"
    ).scalar() == "Hello TPU"


def test_trim_pad(sdb):
    assert sdb.sql("SELECT TRIM(t) FROM s WHERE k = 2").scalar() == "pad"
    assert sdb.sql("SELECT LTRIM(t) FROM s WHERE k = 2").scalar() == "pad  "
    assert sdb.sql("SELECT LPAD(TRIM(t), 6, '*') FROM s WHERE k = 2").scalar() == "***pad"


def test_split_part(sdb):
    assert sdb.sql("SELECT SPLIT_PART(t, ',', 2) FROM s WHERE k = 3").scalar() == "b"
    assert sdb.sql("SELECT SPLIT_PART(t, ',', 9) FROM s WHERE k = 3").scalar() is None


def test_concat_operator(sdb):
    assert sdb.sql("SELECT t || '!' FROM s WHERE k = 1").scalar() == "Hello World!"
    assert sdb.sql("SELECT '<' || t FROM s WHERE k = 1").scalar() == "<Hello World"
    assert sdb.sql("SELECT 'a' || 'b'").scalar() == "ab"


def test_null_propagation(sdb):
    assert sdb.sql("SELECT UPPER(t) FROM s WHERE k = 4").scalar() is None


def test_unicode(sdb):
    assert sdb.sql("SELECT UPPER(t) FROM s WHERE k = 5").scalar() == "GRÜSSE"


def test_predicate_over_transform(sdb):
    assert (
        sdb.sql("SELECT count(*) FROM s WHERE UPPER(t) = 'HELLO WORLD'").scalar()
        == 1
    )
    assert (
        sdb.sql("SELECT count(*) FROM s WHERE LOWER(t) LIKE '%world%'").scalar()
        == 1
    )


def test_group_by_transform(sdb):
    sdb.sql("CREATE TABLE g (t TEXT)")
    sdb.sql("INSERT INTO g VALUES ('a'), ('A'), ('b'), ('B'), ('b')")
    rows = sdb.sql(
        "SELECT UPPER(t) u, count(*) FROM g GROUP BY u ORDER BY u"
    ).rows()
    assert rows == [("A", 2), ("B", 3)]


def test_order_by_transform(sdb):
    rows = sdb.sql(
        "SELECT k FROM s WHERE t IS NOT NULL ORDER BY REVERSE(t)"
    ).rows()
    assert len(rows) == 4


def test_length_of_transform(sdb):
    assert sdb.sql("SELECT LENGTH(TRIM(t)) FROM s WHERE k = 2").scalar() == 3


def test_chained(sdb):
    assert (
        sdb.sql("SELECT UPPER(REPLACE(t, 'l', 'L')) FROM s WHERE k = 1").scalar()
        == "HELLO WORLD"
    )


# ---- extended string kernels (reference SqlStringOpKind coverage) --------


def test_position_and_instr(db):
    db.sql("CREATE TABLE sp (t TEXT)")
    db.sql("INSERT INTO sp VALUES ('hello world'), ('banana'), ('abc')")
    rows = db.sql(
        "SELECT t, POSITION('an' IN t), INSTR(t, 'o') FROM sp ORDER BY t"
    ).rows()
    assert rows == [
        ("abc", 0, 0), ("banana", 2, 0), ("hello world", 0, 5),
    ]


def test_overlay(db):
    db.sql("CREATE TABLE so (t TEXT)")
    db.sql("INSERT INTO so VALUES ('banana')")
    assert db.sql("SELECT OVERLAY(t, 'XX', 2) FROM so").scalar() == "bXXana"
    assert db.sql(
        "SELECT OVERLAY(t, 'Z', 2, 4) FROM so"
    ).scalar() == "bZa"


def test_json_value(db):
    db.sql("CREATE TABLE sj (j TEXT)")
    db.sql(
        "INSERT INTO sj VALUES ('{\"a\": {\"b\": [1, 2]}}'), "
        "('{\"a\": 5}'), ('nope')"
    )
    rows = db.sql(
        "SELECT JSON_VALUE(j, '$.a.b[1]'), JSON_VALUE(j, '$.a') FROM sj"
    ).rows()
    assert rows == [("2", None), (None, "5"), (None, None)]


def test_regexp_substr_count(db):
    db.sql("CREATE TABLE sr (t TEXT)")
    db.sql("INSERT INTO sr VALUES ('banana'), ('xyz')")
    rows = db.sql(
        "SELECT REGEXP_SUBSTR(t, '[aeiou]+'), REGEXP_COUNT(t, 'a') "
        "FROM sr ORDER BY t"
    ).rows()
    assert rows == [("a", 3), (None, 0)]


def test_levenshtein(db):
    db.sql("CREATE TABLE sl (t TEXT)")
    db.sql("INSERT INTO sl VALUES ('banana'), ('banal')")
    rows = db.sql(
        "SELECT t, LEVENSHTEIN_DISTANCE(t, 'banal') FROM sl ORDER BY t"
    ).rows()
    assert rows == [("banal", 0), ("banana", 2)]


def test_intfn_in_where_and_agg(db):
    db.sql("CREATE TABLE sw (t TEXT, v INT)")
    db.sql(
        "INSERT INTO sw VALUES ('apple', 1), ('grape', 2), ('plum', 4)"
    )
    assert db.sql(
        "SELECT SUM(v) FROM sw WHERE POSITION('ap' IN t) > 0"
    ).scalar() == 3


def test_try_cast(db):
    db.sql("CREATE TABLE tc (s TEXT)")
    db.sql("INSERT INTO tc VALUES ('42'), ('3.5'), ('nope'), (NULL), ('-7')")
    rows = db.sql(
        "SELECT s, TRY_CAST(s AS INT), TRY_CAST(s AS DOUBLE) FROM tc"
    ).rows()
    assert rows == [
        ("42", 42, 42.0), ("3.5", None, 3.5), ("nope", None, None),
        (None, None, None), ("-7", -7, -7.0),
    ]
    assert db.sql("SELECT SUM(TRY_CAST(s AS DOUBLE)) FROM tc").scalar() == 38.5
    assert db.sql(
        "SELECT COUNT(*) FROM tc WHERE TRY_CAST(s AS INT) IS NOT NULL"
    ).scalar() == 2


def test_left_right_space(db):
    db.sql("CREATE TABLE slr (s TEXT)")
    db.sql("INSERT INTO slr VALUES ('hello world'), (''), (NULL)")
    rows = db.sql("SELECT LEFT(s, 3), RIGHT(s, 3), s || SPACE(2) || 'x' "
                  "FROM slr").rows()
    assert rows[0] == ("hel", "rld", "hello world  x")
    assert rows[1] == ("", "", "  x")
    assert rows[2] == (None, None, None)


def test_hash_matches_reference_algorithm(db):
    # reference Hash::numericEval (StringOps.cpp:335): JS-compatible
    # 53-bit MurmurX hash; empty string -> NULL
    def ref_hash(s, seed=0):
        M = 0xFFFFFFFF
        h1 = (0xDEADBEEF ^ seed) & M
        h2 = (0x41C6CE57 ^ seed) & M
        for ch in s.encode():
            h1 = ((h1 ^ ch) * 2654435761) & M
            h2 = ((h2 ^ ch) * 1597334677) & M
        h1 = ((h1 ^ (h1 >> 16)) * 2246822507) & M
        h1 = (h1 ^ (((h2 ^ (h2 >> 13)) * 3266489909) & M)) & M
        h2 = ((h2 ^ (h2 >> 16)) * 2246822507) & M
        h2 = (h2 ^ (((h1 ^ (h1 >> 13)) * 3266489909) & M)) & M
        return ((h2 & 0x1FFFFF) << 32) | h1

    db.sql("CREATE TABLE sh (s TEXT)")
    db.sql("INSERT INTO sh VALUES ('Spark'), ('hello'), (''), (NULL)")
    rows = db.sql("SELECT HASH(s) FROM sh").rows()
    assert rows[0][0] == ref_hash("Spark")
    assert rows[1][0] == ref_hash("hello")
    assert rows[2][0] is None and rows[3][0] is None


def test_jarowinkler_similarity(db):
    db.sql("CREATE TABLE sj (s TEXT)")
    db.sql("INSERT INTO sj VALUES ('martha'), ('marhta'), ('')")
    rows = db.sql(
        "SELECT JAROWINKLER_SIMILARITY(s, 'martha') FROM sj"
    ).rows()
    assert rows[0][0] == 100       # identical
    assert 90 <= rows[1][0] < 100  # classic JW example ~96
    assert rows[2][0] is None      # empty -> NULL


def test_startswith_endswith_contains(db):
    db.sql("CREATE TABLE sw (s TEXT)")
    db.sql("INSERT INTO sw VALUES ('100% sure'), ('a_b'), ('plain'), (NULL)")
    # literals containing LIKE wildcards must be escaped by the desugaring
    assert db.sql("SELECT count(*) FROM sw WHERE CONTAINS(s, '0%')"
                  ).rows()[0][0] == 1
    assert db.sql("SELECT count(*) FROM sw WHERE CONTAINS(s, '_')"
                  ).rows()[0][0] == 1
    assert db.sql("SELECT count(*) FROM sw WHERE STARTSWITH(s, 'pl')"
                  ).rows()[0][0] == 1
    assert db.sql("SELECT count(*) FROM sw WHERE ENDSWITH(s, 'ure')"
                  ).rows()[0][0] == 1


def test_greatest_least(db):
    db.sql("CREATE TABLE gl (a INT, b INT, c DOUBLE)")
    db.sql("INSERT INTO gl VALUES (1, 5, 2.5), (7, 3, NULL), (NULL, 4, 1.0)")
    rows = db.sql(
        "SELECT GREATEST(a, b), LEAST(a, b), GREATEST(a, b, c) FROM gl"
    ).rows()
    assert rows[0] == (5, 1, 5.0)
    assert rows[1][:2] == (7, 3) and rows[1][2] is None
    assert rows[2] == (None, None, None)


def test_llm_transform_gated(db):
    """LLM_TRANSFORM(text, prompt) applies the registered backend per
    distinct dictionary entry (reference SqlStringOpKind::LLM_TRANSFORM);
    without a backend it raises a clear NotSupported."""
    import pytest

    from heavydb_tpu.errors import NotSupported
    from heavydb_tpu.storage import string_ops as SO

    db.sql("CREATE TABLE lt (s TEXT)")
    db.sql("INSERT INTO lt VALUES ('cat'), ('dog'), ('cat')")
    with pytest.raises(NotSupported):
        db.sql("SELECT LLM_TRANSFORM(s, 'translate to fr') FROM lt")
    calls = []

    def fake(text, prompt):
        calls.append((text, prompt))
        return f"{prompt}:{text.upper()}"

    db.register_llm_transform(fake)
    try:
        out = db.sql(
            "SELECT LLM_TRANSFORM(s, 'p') FROM lt ORDER BY s"
        ).rows()
        assert [r[0] for r in out] == ["p:CAT", "p:CAT", "p:DOG"]
        # applied per distinct entry, not per row
        assert sorted(calls) == [("cat", "p"), ("dog", "p")]
    finally:
        SO.set_llm_transform(None)
