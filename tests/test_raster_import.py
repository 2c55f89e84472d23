"""Raster import — the reference GDAL raster path (COPY ... WITH
(source_type='raster_file'), ImportExport/RasterImporter.cpp), decoded
natively: ESRI ASCII grid, GeoTIFF tags via Pillow, XYZ text."""

import numpy as np
import pytest

import heavydb_tpu as hdt


@pytest.fixture()
def db():
    return hdt.connect()


ASC = """ncols 3
nrows 2
xllcorner 100.0
yllcorner 40.0
cellsize 0.5
NODATA_value -9999
1 2 3
4 -9999 6
"""


def test_esri_ascii_world(db, tmp_path):
    p = tmp_path / "g.asc"
    p.write_text(ASC)
    db.sql(f"COPY rast FROM '{p}' WITH (source_type='raster_file')")
    rows = db.sql(
        "SELECT raster_lon, raster_lat, band_1_1 FROM rast "
        "ORDER BY raster_lat DESC, raster_lon"
    ).rows()
    assert len(rows) == 6
    # top-left pixel center: x = 100 + 0.5*0.5, y = 40 + 2*0.5 - 0.25
    assert rows[0][0] == pytest.approx(100.25)
    assert rows[0][1] == pytest.approx(40.75)
    assert [r[2] for r in rows] == [1.0, 2.0, 3.0, 4.0, None, 6.0]


def test_esri_ascii_file_coords_and_drop_null(db, tmp_path):
    p = tmp_path / "g.asc"
    p.write_text(ASC)
    db.sql(
        f"COPY rast2 FROM '{p}' WITH (source_type='raster_file', "
        "raster_point_transform='none', raster_drop_if_all_null='true')"
    )
    rows = db.sql(
        "SELECT raster_x, raster_y, band_1_1 FROM rast2 "
        "ORDER BY raster_y, raster_x"
    ).rows()
    assert len(rows) == 5  # the NODATA pixel dropped
    assert rows[0][:2] == (0, 0)
    assert [r[2] for r in rows] == [1.0, 2.0, 3.0, 4.0, 6.0]


def test_xyz(db, tmp_path):
    p = tmp_path / "pts.xyz"
    p.write_text("10 20 1.5\n11 21 2.5\n")
    db.sql(f"COPY xyz FROM '{p}' WITH (source_type='raster_file')")
    rows = db.sql(
        "SELECT raster_lon, raster_lat, band_1_1 FROM xyz ORDER BY raster_lon"
    ).rows()
    assert rows == [(10.0, 20.0, 1.5), (11.0, 21.0, 2.5)]


def test_point_type_point(db, tmp_path):
    p = tmp_path / "g.asc"
    p.write_text(ASC)
    db.sql(
        f"COPY rastp FROM '{p}' WITH (source_type='raster_file', "
        "raster_point_type='point')"
    )
    rows = db.sql(
        "SELECT ST_X(raster_point), band_1_1 FROM rastp "
        "WHERE band_1_1 = 6 ORDER BY 1"
    ).rows()
    assert len(rows) == 1
    assert rows[0][0] == pytest.approx(101.25)


def _write_geotiff(path, arr, scale, tiepoint, nodata=None):
    from PIL import Image, TiffImagePlugin

    im = Image.fromarray(arr)
    ifd = TiffImagePlugin.ImageFileDirectory_v2()
    ifd[33550] = tuple(float(v) for v in scale)      # ModelPixelScale
    ifd.tagtype[33550] = 12                          # DOUBLE
    ifd[33922] = tuple(float(v) for v in tiepoint)   # ModelTiepoint
    ifd.tagtype[33922] = 12
    if nodata is not None:
        ifd[42113] = str(nodata)                     # GDAL_NODATA
        ifd.tagtype[42113] = 2                       # ASCII
    im.save(str(path), tiffinfo=ifd)


def test_geotiff(db, tmp_path):
    pil = pytest.importorskip("PIL")
    arr = np.array([[10, 20], [30, 40]], dtype=np.int32)
    p = tmp_path / "g.tif"
    _write_geotiff(p, arr, scale=(0.1, 0.1, 0.0),
                   tiepoint=(0, 0, 0, 5.0, 50.0, 0))
    db.sql(f"COPY tif FROM '{p}' WITH (source_type='raster_file')")
    rows = db.sql(
        "SELECT raster_lon, raster_lat, band_1_I FROM tif "
        "ORDER BY raster_lat DESC, raster_lon"
    ).rows()
    assert len(rows) == 4
    assert rows[0][0] == pytest.approx(5.05)
    assert rows[0][1] == pytest.approx(49.95)
    assert [r[2] for r in rows] == [10, 20, 30, 40]


def test_geotiff_band_filter_and_nodata(db, tmp_path):
    pytest.importorskip("PIL")
    arr = np.array([[1, 7], [7, 4]], dtype=np.uint8)
    p = tmp_path / "n.tif"
    _write_geotiff(p, arr, scale=(1.0, 1.0, 0.0),
                   tiepoint=(0, 0, 0, 0.0, 2.0, 0), nodata=7)
    db.sql(
        f"COPY tifn FROM '{p}' WITH (source_type='raster_file', "
        "raster_import_bands='band_1_L', raster_point_transform='none')"
    )
    rows = db.sql(
        "SELECT band_1_L FROM tifn ORDER BY raster_y, raster_x"
    ).rows()
    assert [r[0] for r in rows] == [1, None, None, 4]
    n = db.sql("SELECT COUNT(band_1_L) FROM tifn").rows()[0][0]
    assert n == 2


def test_unknown_extension_rejected(db, tmp_path):
    p = tmp_path / "g.png"
    p.write_text("x")
    with pytest.raises(Exception):
        db.sql(f"COPY bad FROM '{p}' WITH (source_type='raster_file')")
