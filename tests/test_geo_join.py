"""Geo joins: grid-bucket candidate generation + exact residual.

Reference: QueryEngine/JoinHashTable/BoundingBoxIntersectJoinHashTable.h
(bucketed spatial hash join with exact predicate recheck).  Oracle =
numpy brute force over all pairs using the engine's own ray-cast rule.
"""

import numpy as np
import pytest

import heavydb_tpu as hdt
from heavydb_tpu import types as T
from heavydb_tpu.storage.table import geo_rings, wkt_to_coords


def _point_in(px, py, rings):
    crossings = 0
    for c, _ in rings:
        if len(c) < 6:
            continue
        x, y = c[0::2], c[1::2]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cr = ((y > py) != (y2 > py)) & (
            px < (x2 - x) * (py - y)
            / np.where(y2 == y, 1e-300, y2 - y) + x
        )
        crossings += int(cr.sum())
    return crossings % 2 == 1


@pytest.fixture()
def db():
    return hdt.connect()


def _load_points(db, name, xs, ys, nulls=()):
    rows = []
    for i, (x, y) in enumerate(zip(xs, ys)):
        if i in nulls:
            rows.append(f"({i}, NULL)")
        else:
            rows.append(f"({i}, 'POINT({x:.9f} {y:.9f})')")
    db.sql(f"INSERT INTO {name} VALUES {', '.join(rows)}")


class TestDWithinJoin:
    def _setup(self, db, na=300, nb=250, seed=0, nulls=False):
        db.sql("CREATE TABLE ga (id INTEGER, p POINT)")
        db.sql("CREATE TABLE gb (id INTEGER, p POINT)")
        rng = np.random.default_rng(seed)
        ax, ay = rng.uniform(0, 10, na), rng.uniform(0, 10, na)
        bx, by = rng.uniform(0, 10, nb), rng.uniform(0, 10, nb)
        an = {1, 7} if nulls else set()
        bn = {0, 5} if nulls else set()
        _load_points(db, "ga", ax, ay, an)
        _load_points(db, "gb", bx, by, bn)
        d = np.sqrt((ax[:, None] - bx[None, :]) ** 2
                    + (ay[:, None] - by[None, :]) ** 2)
        for i in an:
            d[i, :] = np.inf
        for j in bn:
            d[:, j] = np.inf
        return d

    def test_where_form(self, db):
        d = self._setup(db)
        expect = int((d <= 0.3).sum())
        r = db.sql("SELECT COUNT(*) FROM ga a, gb b "
                   "WHERE ST_DWITHIN(a.p, b.p, 0.3)")
        assert r.rows() == [(expect,)]

    def test_join_on_form(self, db):
        d = self._setup(db)
        expect = int((d <= 0.5).sum())
        r = db.sql("SELECT COUNT(*) FROM ga a JOIN gb b "
                   "ON ST_DWITHIN(a.p, b.p, 0.5)")
        assert r.rows() == [(expect,)]

    def test_distance_lt(self, db):
        d = self._setup(db)
        expect = int((d < 0.4).sum())
        r = db.sql("SELECT COUNT(*) FROM ga a, gb b "
                   "WHERE ST_DISTANCE(a.p, b.p) < 0.4")
        assert r.rows() == [(expect,)]

    def test_null_points_excluded(self, db):
        d = self._setup(db, nulls=True)
        expect = int((d <= 0.6).sum())
        r = db.sql("SELECT COUNT(*) FROM ga a, gb b "
                   "WHERE ST_DWITHIN(a.p, b.p, 0.6)")
        assert r.rows() == [(expect,)]

    def test_pairs_exact(self, db):
        d = self._setup(db, na=80, nb=60)
        want = sorted(
            (i, j)
            for i in range(d.shape[0]) for j in range(d.shape[1])
            if d[i, j] <= 0.8
        )
        r = db.sql("SELECT a.id, b.id FROM ga a, gb b "
                   "WHERE ST_DWITHIN(a.p, b.p, 0.8) ORDER BY a.id, b.id")
        assert r.rows() == want

    def test_extra_filter_conjuncts(self, db):
        d = self._setup(db)
        expect = int((d[:100, :] <= 0.5).sum())
        r = db.sql("SELECT COUNT(*) FROM ga a, gb b "
                   "WHERE ST_DWITHIN(a.p, b.p, 0.5) AND a.id < 100")
        assert r.rows() == [(expect,)]


class TestPolygonJoin:
    def _setup(self, db, nz=40, np_=400, seed=1):
        db.sql("CREATE TABLE zones (zid INTEGER, zone POLYGON)")
        db.sql("CREATE TABLE pts (pid INTEGER, p POINT)")
        rng = np.random.default_rng(seed)
        zones = []
        for i in range(nz):
            cx, cy = rng.uniform(0, 20, 2)
            w, h = rng.uniform(0.5, 3.0, 2)
            if i % 3 == 0:  # square with a hole
                wkt = (
                    f"POLYGON(({cx} {cy}, {cx+w} {cy}, {cx+w} {cy+h}, "
                    f"{cx} {cy+h}, {cx} {cy}),"
                    f"({cx+w*0.4} {cy+h*0.4}, {cx+w*0.6} {cy+h*0.4}, "
                    f"{cx+w*0.6} {cy+h*0.6}, {cx+w*0.4} {cy+h*0.6}, "
                    f"{cx+w*0.4} {cy+h*0.4}))"
                )
            else:  # triangle
                wkt = (f"POLYGON(({cx} {cy}, {cx+w} {cy}, "
                       f"{cx+w*0.5} {cy+h}, {cx} {cy}))")
            zones.append(wkt)
        vals = ", ".join(f"({i}, '{w}')" for i, w in enumerate(zones))
        db.sql(f"INSERT INTO zones VALUES {vals}")
        xs = rng.uniform(0, 22, np_)
        ys = rng.uniform(0, 22, np_)
        _load_points(db, "pts", xs, ys)
        K = T.SQLTypeKind.GEO_POLYGON
        rings = [geo_rings(wkt_to_coords(w, K), K) for w in zones]
        inside = np.array([
            [_point_in(xs[j], ys[j], rg) for j in range(np_)]
            for rg in rings
        ])
        return inside

    def test_contains_poly_build(self, db):
        inside = self._setup(db)
        expect = int(inside.sum())
        r = db.sql("SELECT COUNT(*) FROM pts p, zones z "
                   "WHERE ST_CONTAINS(z.zone, p.p)")
        assert r.rows() == [(expect,)]

    def test_contains_poly_probe(self, db):
        inside = self._setup(db)
        expect = int(inside.sum())
        r = db.sql("SELECT COUNT(*) FROM zones z, pts p "
                   "WHERE ST_CONTAINS(z.zone, p.p)")
        assert r.rows() == [(expect,)]

    def test_intersects_column_pair(self, db):
        inside = self._setup(db)
        expect = int(inside.sum())
        r = db.sql("SELECT COUNT(*) FROM pts p JOIN zones z "
                   "ON ST_INTERSECTS(p.p, z.zone)")
        assert r.rows() == [(expect,)]

    def test_grouped_spatial_join(self, db):
        inside = self._setup(db)
        per = {z: int(c) for z, c in enumerate(inside.sum(axis=1)) if c}
        r = db.sql(
            "SELECT z.zid, COUNT(*) FROM zones z, pts p "
            "WHERE ST_CONTAINS(z.zone, p.p) GROUP BY z.zid ORDER BY z.zid"
        )
        assert dict(r.rows()) == per

    def test_contains_seg_as_filter_same_table(self, db):
        # CONTAINS_SEG must agree with the host precompute when both
        # columns live in one table (same-domain evaluation)
        db.sql("CREATE TABLE combo (id INTEGER, zone POLYGON, p POINT)")
        db.sql(
            "INSERT INTO combo VALUES "
            "(1, 'POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))', 'POINT(2 2)'), "
            "(2, 'POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))', 'POINT(9 9)'), "
            "(3, 'POLYGON((0 0, 2 0, 1 3, 0 0))', 'POINT(1 1)')"
        )
        r = db.sql("SELECT id FROM combo "
                   "WHERE ST_CONTAINS(zone, p) ORDER BY id")
        assert r.rows() == [(1,), (3,)]
