"""GEOINT32 compressed coordinates + bbox/transform ST_* surface.

Reference: Geospatial/CompressionRuntime.h (lon = trunc(x·(2^31-1)/180),
lat = trunc(y·(2^31-1)/90), ~1e-7° tolerance; SRID-4326 columns compress
by default, ENCODING NONE opts out), ExtensionFunctionsGeo.hpp
(ST_XMin/XMax/YMin/YMax, conv_4326_900913 for ST_Transform).
"""

import math

import numpy as np
import pytest

from heavydb_tpu.storage.table import (
    geoint_compress,
    geoint_decompress,
    wkt_to_coords,
)
from heavydb_tpu import types as T


def test_codec_bit_parity():
    # formulas match CompressionRuntime.h exactly
    c = wkt_to_coords("POINT(-122.4194 37.7749)", T.SQLTypeKind.GEO_POINT)
    z = geoint_compress(c, T.SQLTypeKind.GEO_POINT)
    assert z.dtype == np.int32
    assert z[0] == int(-122.4194 * (2147483647.0 / 180.0))
    assert z[1] == int(37.7749 * (2147483647.0 / 90.0))
    d = geoint_decompress(z, T.SQLTypeKind.GEO_POINT)
    assert d[0] == z[0] * 8.3819031754424345e-08
    assert d[1] == z[1] * 4.1909515877212172e-08
    assert abs(d[0] - -122.4194) < 1e-6 and abs(d[1] - 37.7749) < 1e-6


def test_polygon_header_exact():
    w = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))"
    c = wkt_to_coords(w, T.SQLTypeKind.GEO_POLYGON)
    z = geoint_compress(c, T.SQLTypeKind.GEO_POLYGON)
    d = geoint_decompress(z, T.SQLTypeKind.GEO_POLYGON)
    # ring headers survive exactly; coords within tolerance
    nr = int(c[0])
    assert (d[: 1 + nr] == c[: 1 + nr]).all()
    assert np.allclose(d[1 + nr:], c[1 + nr:], atol=1e-6)


def test_default_compression_by_srid(db):
    db.sql(
        "CREATE TABLE g (a GEOMETRY(POINT, 4326), "
        "b GEOMETRY(POINT, 4326) ENCODING NONE, c POINT)"
    )
    ta = db.catalog.get_table("g")
    assert ta.columns[0].type.is_geo_compressed
    assert not ta.columns[1].type.is_geo_compressed
    assert not ta.columns[2].type.is_geo_compressed
    db.sql(
        "INSERT INTO g VALUES ('POINT(1.5 2.5)', 'POINT(1.5 2.5)', "
        "'POINT(1.5 2.5)')"
    )
    rows = db.sql("SELECT ST_X(a), ST_X(b), ST_X(c) FROM g").rows()
    assert rows[0][0] == pytest.approx(1.5, abs=1e-6)  # lossy
    assert rows[0][1] == 1.5  # exact (uncompressed)
    assert rows[0][2] == 1.5
    # host storage really is int32 (half the bytes of f64)
    frag = ta.fragments[0]
    assert frag.chunks[ta.columns[0].col_id][0].dtype == np.int32
    assert frag.chunks[ta.columns[1].col_id][0].dtype == np.float64


def test_compressed_explicit_encoding(db):
    db.sql(
        "CREATE TABLE ge (p GEOMETRY(POINT, 4326) ENCODING COMPRESSED(32))"
    )
    assert db.catalog.get_table("ge").columns[0].type.is_geo_compressed
    from heavydb_tpu.errors import BinderError

    with pytest.raises(BinderError):
        db.sql("CREATE TABLE gbad (p POINT ENCODING COMPRESSED(32))")


def test_compressed_polygon_ops(db):
    db.sql("CREATE TABLE gz (id INT, z GEOMETRY(POLYGON, 4326))")
    db.sql(
        "INSERT INTO gz VALUES "
        "(1, 'POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))'), (2, NULL)"
    )
    rows = db.sql(
        "SELECT ST_Area(z), ST_NPoints(z), "
        "ST_Contains(z, ST_GeomFromText('POINT(1 1)')) FROM gz ORDER BY id"
    ).rows()
    assert rows[0][0] == pytest.approx(16.0, abs=1e-4)
    assert rows[0][1] == 4 and rows[0][2] is True
    assert rows[1] == (None, None, None)
    # WKT egress round-trips through decompression
    wkt = db.sql("SELECT z FROM gz WHERE id = 1").scalar()
    assert wkt.startswith("POLYGON")


def test_compressed_persistence(tmp_path):
    import heavydb_tpu as hdt

    path = str(tmp_path / "geodb")
    db = hdt.connect(path)
    db.sql("CREATE TABLE gp (p GEOMETRY(POINT, 4326))")
    db.sql("INSERT INTO gp VALUES ('POINT(12.34 56.78)'), (NULL)")
    db.checkpoint()
    db2 = hdt.connect(path)
    t = db2.catalog.get_table("gp")
    assert t.fragments[0].chunks[t.columns[0].col_id][0].dtype == np.int32
    rows = db2.sql("SELECT ST_X(p), ST_Y(p) FROM gp").rows()
    assert rows[0][0] == pytest.approx(12.34, abs=1e-6)
    assert rows[0][1] == pytest.approx(56.78, abs=1e-6)
    assert rows[1] == (None, None)


def test_bbox_functions(db):
    db.sql("CREATE TABLE gb (id INT, z POLYGON, l LINESTRING)")
    db.sql(
        "INSERT INTO gb VALUES "
        "(1, 'POLYGON((1 2, 5 2, 5 8, 1 8, 1 2))', "
        "'LINESTRING(0 0, 3 4, -2 1)'), (2, NULL, NULL)"
    )
    rows = db.sql(
        "SELECT ST_XMin(z), ST_XMax(z), ST_YMin(z), ST_YMax(z), "
        "ST_XMin(l), ST_YMax(l) FROM gb ORDER BY id"
    ).rows()
    assert rows[0] == (1.0, 5.0, 2.0, 8.0, -2.0, 4.0)
    assert rows[1] == (None,) * 6


def test_st_astext(db):
    db.sql("CREATE TABLE ga (p POINT)")
    db.sql("INSERT INTO ga VALUES ('POINT(3 4)')")
    assert db.sql("SELECT ST_AsText(p) FROM ga").scalar() == "POINT (3 4)"


def test_st_transform_web_mercator(db):
    db.sql("CREATE TABLE gt (p GEOMETRY(POINT, 4326))")
    db.sql("INSERT INTO gt VALUES ('POINT(-122.4194 37.7749)')")
    rows = db.sql(
        "SELECT ST_X(ST_Transform(p, 900913)), "
        "ST_Y(ST_Transform(p, 900913)) FROM gt"
    ).rows()
    # reference conv_4326_900913: x·111319.490778,
    # 6378136.99911·ln(tan(.00872664626·y + .785398163397))
    wx = -122.4194 * 111319.490778
    wy = 6378136.99911 * math.log(
        math.tan(0.00872664626 * 37.7749 + 0.785398163397)
    )
    assert rows[0][0] == pytest.approx(wx, rel=1e-6)
    assert rows[0][1] == pytest.approx(wy, rel=1e-6)
    # distance in meters between two transformed points
    db.sql("CREATE TABLE gt2 (a GEOMETRY(POINT, 4326))")
    db.sql("INSERT INTO gt2 VALUES ('POINT(0 0)')")
    d = db.sql(
        "SELECT ST_Distance(ST_Transform(a, 900913), "
        "ST_GeomFromText('POINT(111319.490778 0)')) FROM gt2"
    ).scalar()
    assert d == pytest.approx(111319.490778, rel=1e-3)
