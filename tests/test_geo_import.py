"""GeoJSON import — the reference GDAL geo import path (COPY ... WITH
(source_type='geo_file'), ImportExport/Importer.cpp importGDALGeo),
parsed natively (no GDAL in this environment)."""

import json

import pytest

import heavydb_tpu as hdt


@pytest.fixture()
def db():
    return hdt.connect()


def _write(tmp_path, doc, name="data.geojson"):
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def test_points_with_properties(db, tmp_path):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
             "properties": {"name": "a", "pop": 10, "area": 1.5}},
            {"type": "Feature",
             "geometry": {"type": "Point", "coordinates": [3.0, 4.0]},
             "properties": {"name": "b", "pop": 20, "area": None}},
        ],
    }
    p = _write(tmp_path, doc)
    r = db.sql(f"COPY pts FROM '{p}' WITH (source_type='geo_file')").rows()
    assert "2" in r[0][0]
    rows = db.sql(
        "SELECT name, pop, ST_X(geom), ST_Y(geom) FROM pts ORDER BY name"
    ).rows()
    # GeoJSON is WGS84 → GEOINT32-compressed storage (reference parity)
    assert [(r[0], r[1]) for r in rows] == [("a", 10), ("b", 20)]
    assert [r[2] for r in rows] == pytest.approx([1.0, 3.0], abs=1e-6)
    assert [r[3] for r in rows] == pytest.approx([2.0, 4.0], abs=1e-6)


def test_polygons_promote_to_multipolygon(db, tmp_path):
    doc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "Polygon", "coordinates": [
                 [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]},
             "properties": {"tag": "square"}},
            {"type": "Feature",
             "geometry": {"type": "MultiPolygon", "coordinates": [
                 [[[10, 10], [12, 10], [12, 12], [10, 12], [10, 10]]],
                 [[[20, 20], [21, 20], [21, 21], [20, 21], [20, 20]]]]},
             "properties": {"tag": "two"}},
        ],
    }
    p = _write(tmp_path, doc)
    db.sql(f"COPY polys FROM '{p}' WITH (source_type='geojson')")
    rows = db.sql(
        "SELECT tag, ST_AREA(geom) FROM polys ORDER BY tag"
    ).rows()
    assert rows[0][0] == "square" and rows[0][1] == pytest.approx(16.0, abs=1e-4)
    assert rows[1][0] == "two" and rows[1][1] == pytest.approx(5.0, abs=1e-4)


def test_extension_autodetect_and_spatial_query(db, tmp_path):
    feats = [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [float(i), 0.0]},
         "properties": {"i": i}}
        for i in range(10)
    ]
    p = _write(tmp_path, {"type": "FeatureCollection", "features": feats})
    db.sql(f"COPY gpts FROM '{p}'")  # .geojson extension routes to geo
    n = db.sql(
        "SELECT count(*) FROM gpts "
        "WHERE ST_DISTANCE(geom, 'POINT (0 0)') < 3.5"
    ).rows()
    assert n == [(4,)]


def test_bare_geometry_and_missing_geometry(db, tmp_path):
    p = _write(tmp_path, {"type": "Point", "coordinates": [5.0, 6.0]})
    db.sql(f"COPY bare FROM '{p}' WITH (source_type='geo_file')")
    assert db.sql("SELECT ST_X(geom) FROM bare").rows()[0][0] == pytest.approx(5.0, abs=1e-6)
    doc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": None, "properties": {"i": 1}},
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [1.0, 1.0]},
         "properties": {"i": 2}},
    ]}
    p2 = _write(tmp_path, doc, "nulls.geojson")
    db.sql(f"COPY ng FROM '{p2}'")
    rows = db.sql("SELECT i, geom IS NULL FROM ng ORDER BY i").rows()
    assert rows == [(1, True), (2, False)]
