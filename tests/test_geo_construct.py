"""Geometry-valued constructors — the GEOS-runtime role
(RelAlgTranslatorGeo.cpp ST_Buffer/ST_Union/ST_Intersection/
ST_Difference), implemented natively on even-odd ring sets
(ops/geo_construct.py)."""

import numpy as np
import pytest

import heavydb_tpu as hdt


@pytest.fixture()
def db():
    return hdt.connect()


def test_buffer_point_area_and_wkt(db):
    db.sql("CREATE TABLE pts (g GEOMETRY(POINT))")
    db.sql("INSERT INTO pts VALUES ('POINT (10 20)')")
    n = 32
    expected = 0.5 * n * np.sin(2 * np.pi / n) * 4.0  # r=2 regular 32-gon
    a = db.sql("SELECT ST_AREA(ST_BUFFER(g, 2.0)) FROM pts").rows()[0][0]
    assert a == pytest.approx(expected)
    wkt = db.sql("SELECT ST_ASTEXT(ST_BUFFER(g, 2.0)) FROM pts").rows()[0][0]
    assert wkt.startswith("POLYGON (")
    assert "12 20" in wkt  # east extreme x = 10 + 2


def test_buffer_zero_identity(db):
    db.sql("CREATE TABLE ply (g GEOMETRY(POLYGON))")
    db.sql("INSERT INTO ply VALUES ('POLYGON ((0 0, 4 0, 4 4, 0 4))')")
    a = db.sql("SELECT ST_AREA(ST_BUFFER(g, 0)) FROM ply").rows()[0][0]
    assert a == pytest.approx(16.0)


def test_intersection_crossing_convex_clip(db):
    db.sql("CREATE TABLE t1 (g GEOMETRY(POLYGON))")
    # unit 4x4 square; clip with a 2x2 rect overhanging the right edge
    db.sql("INSERT INTO t1 VALUES ('POLYGON ((0 0, 4 0, 4 4, 0 4))')")
    a = db.sql(
        "SELECT ST_AREA(ST_INTERSECTION(g, "
        "'POLYGON ((3 1, 6 1, 6 3, 3 3))')) FROM t1"
    ).rows()[0][0]
    assert a == pytest.approx(2.0)  # 1x2 overlap
    # commuted literal-first
    a2 = db.sql(
        "SELECT ST_AREA(ST_INTERSECTION("
        "'POLYGON ((3 1, 6 1, 6 3, 3 3))', g)) FROM t1"
    ).rows()[0][0]
    assert a2 == pytest.approx(2.0)


def test_intersection_with_holes(db):
    db.sql("CREATE TABLE th (g GEOMETRY(POLYGON))")
    # 4x4 square with a 2x2 hole in the middle
    db.sql("INSERT INTO th VALUES ("
           "'POLYGON ((0 0, 4 0, 4 4, 0 4), (1 1, 3 1, 3 3, 1 3))')")
    # clip to the left half (0..2 x 0..4): area = 8 - hole part (1x2) = 6
    a = db.sql(
        "SELECT ST_AREA(ST_INTERSECTION(g, "
        "'POLYGON ((0 0, 2 0, 2 4, 0 4))')) FROM th"
    ).rows()[0][0]
    assert a == pytest.approx(6.0)


def test_difference_nested_and_crossing(db):
    db.sql("CREATE TABLE td (g GEOMETRY(POLYGON))")
    db.sql("INSERT INTO td VALUES ('POLYGON ((0 0, 4 0, 4 4, 0 4))')")
    # nested: subtract interior square -> donut
    rows = db.sql(
        "SELECT ST_AREA(ST_DIFFERENCE(g, "
        "'POLYGON ((1 1, 2 1, 2 2, 1 2))')), "
        "ST_NRINGS(ST_DIFFERENCE(g, 'POLYGON ((1 1, 2 1, 2 2, 1 2))')) "
        "FROM td"
    ).rows()
    assert rows[0][0] == pytest.approx(15.0)
    assert rows[0][1] == 2
    # crossing convex clip: subtract the overhanging 2x2 rect
    a = db.sql(
        "SELECT ST_AREA(ST_DIFFERENCE(g, "
        "'POLYGON ((3 1, 6 1, 6 3, 3 3))')) FROM td"
    ).rows()[0][0]
    assert a == pytest.approx(14.0)


def test_union_disjoint_and_nested(db):
    db.sql("CREATE TABLE tu (a GEOMETRY(POLYGON), b GEOMETRY(POLYGON))")
    db.sql("INSERT INTO tu VALUES ("
           "'POLYGON ((0 0, 1 0, 1 1, 0 1))', "
           "'POLYGON ((5 5, 7 5, 7 7, 5 7))')")
    rows = db.sql(
        "SELECT ST_AREA(ST_UNION(a, b)), ST_ASTEXT(ST_UNION(a, b)) FROM tu"
    ).rows()
    assert rows[0][0] == pytest.approx(5.0)  # 1 + 4, disjoint
    assert rows[0][1].startswith("MULTIPOLYGON")
    # nested union = outer
    a = db.sql(
        "SELECT ST_AREA(ST_UNION(a, 'POLYGON ((-1 -1, 2 -1, 2 2, -1 2))'))"
        " FROM tu"
    ).rows()[0][0]
    assert a == pytest.approx(9.0)


def test_union_crossing_unsupported(db):
    db.sql("CREATE TABLE tux (g GEOMETRY(POLYGON))")
    # concave subject crossing a concave operand -> clean NotSupported
    db.sql("INSERT INTO tux VALUES ("
           "'POLYGON ((0 0, 4 0, 4 4, 3 4, 3 1, 1 1, 1 4, 0 4))')")
    with pytest.raises(Exception):
        db.sql(
            "SELECT ST_AREA(ST_UNION(g, "
            "'POLYGON ((0 2, 5 2, 5 3, 4.5 3, 4.5 2.5, 0.5 2.5, 0.5 3, 0 3))'"
            ")) FROM tux"
        ).rows()


def test_null_geometry_propagates(db):
    db.sql("CREATE TABLE tn (g GEOMETRY(POLYGON))")
    db.sql("INSERT INTO tn VALUES (NULL)")
    assert db.sql(
        "SELECT ST_AREA(ST_INTERSECTION(g, "
        "'POLYGON ((0 0, 1 0, 1 1, 0 1))')) FROM tn"
    ).rows() == [(None,)]


def test_chained_transforms(db):
    db.sql("CREATE TABLE tc (g GEOMETRY(POINT))")
    db.sql("INSERT INTO tc VALUES ('POINT (0 0)')")
    # buffer the point, then clip to the right half-plane x >= 0
    a = db.sql(
        "SELECT ST_AREA(ST_INTERSECTION(ST_BUFFER(g, 1.0), "
        "'POLYGON ((0 -2, 2 -2, 2 2, 0 2))')) FROM tc"
    ).rows()[0][0]
    n = 32
    full = 0.5 * n * np.sin(2 * np.pi / n)
    assert a == pytest.approx(full / 2, rel=1e-6)


def test_projection_of_raw_and_transformed(db):
    db.sql("CREATE TABLE tp (g GEOMETRY(POLYGON))")
    db.sql("INSERT INTO tp VALUES ('POLYGON ((0 0, 2 0, 2 2, 0 2))')")
    rows = db.sql(
        "SELECT ST_ASTEXT(g), ST_ASTEXT(ST_BUFFER(g, 0)) FROM tp"
    ).rows()
    assert rows[0][0].startswith("POLYGON")
    assert rows[0][1].startswith("POLYGON")
