"""Geospatial tests — reference Geospatial/ types + GeoIR ST_* functions
(point/polygon WKT storage, ST_X/Y, ST_Distance, ST_DWithin, ST_Contains
via even-odd ray casting, ST_Area/Perimeter/NPoints)."""

import math

import pytest


@pytest.fixture()
def gdb(db):
    db.sql("CREATE TABLE geo (id INT, p POINT, zone GEOMETRY(POLYGON, 4326))")
    db.sql(
        "INSERT INTO geo VALUES "
        "(1, 'POINT(1 1)', 'POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))'), "
        "(2, 'POINT(10 10)', 'POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))'), "
        "(3, NULL, NULL)"
    )
    return db


def test_wkt_roundtrip(gdb):
    rows = gdb.sql("SELECT id, p, zone FROM geo ORDER BY id").rows()
    # p (no SRID) round-trips exactly; zone (4326) is GEOINT32-compressed
    # so its WKT egress carries the ~1e-7° tolerance (reference parity)
    assert rows[0][:2] == (1, "POINT (1 1)")
    import re

    nums = [float(v) for v in re.findall(r"-?[\d.]+", rows[0][2])]
    assert nums == pytest.approx([0, 0, 4, 0, 4, 4, 0, 4, 0, 0], abs=1e-6)
    assert rows[2] == (3, None, None)


def test_st_x_y(gdb):
    rows = gdb.sql("SELECT ST_X(p), ST_Y(p) FROM geo ORDER BY id").rows()
    assert rows == [(1.0, 1.0), (10.0, 10.0), (None, None)]


def test_st_distance_and_dwithin(gdb):
    rows = gdb.sql(
        "SELECT ST_Distance(p, 'POINT(0 0)') FROM geo ORDER BY id"
    ).rows()
    assert math.isclose(rows[0][0], math.sqrt(2))
    assert rows[2][0] is None
    assert gdb.sql(
        "SELECT id FROM geo WHERE ST_DWithin(p, 'POINT(0 0)', 2.0)"
    ).rows() == [(1,)]


def test_st_distance_two_columns(db):
    db.sql("CREATE TABLE pts (a POINT, b POINT)")
    db.sql("INSERT INTO pts VALUES ('POINT(0 0)', 'POINT(3 4)')")
    assert db.sql("SELECT ST_Distance(a, b) FROM pts").scalar() == 5.0


def test_st_contains_per_row(gdb):
    rows = gdb.sql(
        "SELECT id, ST_Contains(zone, p) FROM geo ORDER BY id"
    ).rows()
    assert rows == [(1, True), (2, False), (3, None)]


def test_st_contains_literal_polygon(gdb):
    assert gdb.sql(
        "SELECT id FROM geo WHERE "
        "ST_Contains('POLYGON((0 0, 5 0, 5 5, 0 5, 0 0))', p)"
    ).rows() == [(1,)]


def test_st_contains_literal_point(gdb):
    rows = gdb.sql(
        "SELECT id, ST_Contains(zone, ST_GeomFromText('POINT(1 1)')) "
        "FROM geo ORDER BY id"
    ).rows()
    assert rows == [(1, True), (2, True), (3, None)]


def test_area_perimeter_npoints(gdb):
    rows = gdb.sql(
        "SELECT ST_Area(zone), ST_Perimeter(zone), ST_NPoints(zone) "
        "FROM geo ORDER BY id"
    ).rows()
    # zone is SRID-4326 → GEOINT32-compressed by default (reference
    # parity): values carry the ~1e-7-degree compression tolerance
    assert rows[2] == (None, None, None)
    for got, want in zip(rows, [(16.0, 16.0, 4), (4.0, 8.0, 4)]):
        assert got[0] == pytest.approx(want[0], abs=1e-4)
        assert got[1] == pytest.approx(want[1], abs=1e-4)
        assert got[2] == want[2]


def test_geo_aggregation(gdb):
    # geo expressions fuse into normal aggregates
    assert gdb.sql(
        "SELECT COUNT(*) FROM geo WHERE ST_Contains(zone, p)"
    ).scalar() == 1
    rows = gdb.sql(
        "SELECT SUM(ST_Area(zone)) FROM geo"
    ).rows()
    assert rows[0][0] == pytest.approx(20.0, abs=1e-4)


def test_geo_persistence(tmp_path):
    import heavydb_tpu as hdt

    d = str(tmp_path / "gdb")
    db = hdt.connect(d)
    db.sql("CREATE TABLE g (p POINT)")
    db.sql("INSERT INTO g VALUES ('POINT(2.5 -3)')")
    del db
    db2 = hdt.connect(d)
    assert db2.sql("SELECT p FROM g").scalar() == "POINT (2.5 -3)"
    assert db2.sql("SELECT ST_X(p) FROM g").scalar() == 2.5


def test_linestring_length(db):
    db.sql("CREATE TABLE ln (path LINESTRING)")
    db.sql("INSERT INTO ln VALUES ('LINESTRING(0 0, 3 4, 3 8)')")
    assert db.sql("SELECT ST_Length(path) FROM ln").scalar() == 9.0
    assert db.sql("SELECT ST_NPoints(path) FROM ln").scalar() == 3
    assert db.sql("SELECT path FROM ln").scalar() == "LINESTRING (0 0, 3 4, 3 8)"


def test_multiring_polygon_and_multipolygon(db):
    db.sql("CREATE TABLE mr (poly POLYGON, mp MULTIPOLYGON)")
    db.sql(
        "INSERT INTO mr VALUES ("
        "'POLYGON((0 0, 10 0, 10 10, 0 10), (4 4, 6 4, 6 6, 4 6))', "
        "'MULTIPOLYGON(((0 0, 2 0, 2 2, 0 2)), ((5 5, 7 5, 7 7, 5 7)))')"
    )
    r = db.sql(
        "SELECT ST_AREA(poly), ST_AREA(mp), ST_NPOINTS(poly), "
        "ST_NPOINTS(mp), ST_PERIMETER(poly) FROM mr"
    ).rows()[0]
    assert r[0] == 96.0      # 100 outer - 4 hole
    assert r[1] == 8.0       # 4 + 4
    assert r[2] == 8 and r[3] == 8
    assert r[4] == 48.0      # 40 outer + 8 hole ring
    # point inside the hole is NOT contained; outside it is
    assert db.sql("SELECT count(*) FROM mr WHERE "
                  "ST_CONTAINS(poly, 'POINT(5 5)')").rows()[0][0] == 0
    assert db.sql("SELECT count(*) FROM mr WHERE "
                  "ST_CONTAINS(poly, 'POINT(1 1)')").rows()[0][0] == 1
    # WKT roundtrip preserves rings and parts
    wkt = db.sql("SELECT mp FROM mr").rows()[0][0]
    assert wkt.count("((") == 2


def test_st_intersects(db):
    db.sql("CREATE TABLE si (poly POLYGON, ln LINESTRING, p POINT)")
    db.sql("INSERT INTO si VALUES ('POLYGON((0 0, 4 0, 4 4, 0 4))', "
           "'LINESTRING(-1 -1, 5 5)', 'POINT(2 2)')")
    db.sql("INSERT INTO si VALUES ('POLYGON((10 10, 12 10, 12 12, 10 12))', "
           "'LINESTRING(20 20, 21 21)', 'POINT(30 30)')")
    q = lambda c, g: db.sql(
        f"SELECT ST_INTERSECTS({c}, '{g}') FROM si").rows()
    assert q("poly", "POLYGON((3 3, 6 3, 6 6, 3 6))") == [(True,), (False,)]
    assert q("poly", "POINT(2 2)") == [(True,), (False,)]
    assert q("ln", "POLYGON((0 0, 4 0, 4 4, 0 4))") == [(True,), (False,)]
    # containment without boundary crossing still intersects
    assert q("poly", "POLYGON((1 1, 2 1, 2 2, 1 2))") == [(True,), (False,)]
    assert q("p", "POLYGON((0 0, 4 0, 4 4, 0 4))") == [(True,), (False,)]


def test_st_within(gdb):
    # ST_Within(a, b) == ST_Contains(b, a) (ExtensionFunctionsGeo.hpp)
    rows = gdb.sql(
        "SELECT id FROM geo WHERE ST_Within(p, zone) ORDER BY id"
    ).rows()
    assert rows == [(1,)]
    rows = gdb.sql(
        "SELECT id FROM geo WHERE "
        "ST_Within('POINT(1 1)', zone) ORDER BY id"
    ).rows()
    assert rows == [(1,), (2,)]


def test_st_srid(gdb):
    rows = gdb.sql(
        "SELECT ST_SRID(p), ST_SRID(zone) FROM geo ORDER BY id LIMIT 1"
    ).rows()
    assert rows == [(0, 4326)]


def test_st_nrings(db):
    db.sql("CREATE TABLE pz (id INT, z POLYGON)")
    db.sql("INSERT INTO pz VALUES "
           "(1, 'POLYGON((0 0, 4 0, 4 4, 0 4, 0 0),"
           "(1 1, 2 1, 2 2, 1 2, 1 1))'), "
           "(2, 'POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))'), (3, NULL)")
    rows = db.sql("SELECT id, ST_NRings(z) FROM pz ORDER BY id").rows()
    assert rows == [(1, 2), (2, 1), (3, None)]


def test_st_centroid(db):
    db.sql("CREATE TABLE cz (id INT, z POLYGON, p POINT)")
    db.sql("INSERT INTO cz VALUES "
           "(1, 'POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))', 'POINT(3 7)'), "
           "(2, 'POLYGON((0 0, 2 0, 2 6, 0 6, 0 0))', 'POINT(1 1)'), "
           "(3, NULL, NULL)")
    rows = db.sql(
        "SELECT id, ST_X(ST_Centroid(z)), ST_Y(ST_Centroid(z)), "
        "ST_X(ST_Centroid(p)) FROM cz ORDER BY id"
    ).rows()
    assert rows[0][1] == pytest.approx(2.0)
    assert rows[0][2] == pytest.approx(2.0)
    assert rows[0][3] == pytest.approx(3.0)
    assert rows[1][1] == pytest.approx(1.0)
    assert rows[1][2] == pytest.approx(3.0)
    assert rows[2][1:] == (None, None, None)
    # centroid usable inside distance predicates
    got = db.sql(
        "SELECT id FROM cz WHERE "
        "ST_Distance(ST_Centroid(z), 'POINT(2 2)') < 0.01"
    ).rows()
    assert got == [(1,)]


def test_st_centroid_with_hole(db):
    db.sql("CREATE TABLE hz (z POLYGON)")
    # square with an off-center hole: centroid shifts AWAY from the hole
    db.sql("INSERT INTO hz VALUES "
           "('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0),"
           "(2 1, 3 1, 3 2, 2 2, 2 1))')")
    x, y = db.sql(
        "SELECT ST_X(ST_Centroid(z)), ST_Y(ST_Centroid(z)) FROM hz"
    ).rows()[0]
    # exact: (16*2 - 1*2.5)/15, (16*2 - 1*1.5)/15
    assert x == pytest.approx((32 - 2.5) / 15)
    assert y == pytest.approx((32 - 1.5) / 15)
