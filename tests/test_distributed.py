"""Multi-device execution tests on an 8-device virtual CPU mesh (SURVEY §4:
the multi-host test rig we must build ourselves).  The same SQL must produce
identical results sharded vs single-device."""

import numpy as np
import pytest

import heavydb_tpu as hdt
from heavydb_tpu.config import Config


@pytest.fixture()
def pair(rng):
    """(single-device db, 8-shard db) loaded with identical data."""
    single = hdt.connect()
    sharded = hdt.connect(config=Config(num_shards=8))
    n = 10_000
    data = {
        "k": rng.integers(0, 50, n),
        "x": np.where(rng.random(n) < 0.1, np.nan, rng.integers(-100, 100, n)),
        "v": rng.normal(size=n),
    }
    for db in (single, sharded):
        db.sql("CREATE TABLE t (k INT, x INT, v DOUBLE)")
        db.load_table("t", data)
        db.sql("CREATE TABLE d (k INT, name TEXT)")
        db.sql(
            "INSERT INTO d VALUES (1,'one'),(2,'two'),(3,'three'),(4,'four')"
        )
    return single, sharded


QUERIES = [
    "SELECT count(*), sum(x), min(v), max(v) FROM t",
    "SELECT count(*) FROM t WHERE x > 0 AND v < 1.0",
    "SELECT k, count(*), sum(x), avg(v) FROM t GROUP BY k ORDER BY k",
    "SELECT k, count(DISTINCT x) FROM t GROUP BY k ORDER BY k",
    "SELECT x % 7, count(*) FROM t WHERE x IS NOT NULL GROUP BY 1 ORDER BY 1",
    "SELECT d.name, count(*) FROM t JOIN d ON t.k = d.k GROUP BY d.name ORDER BY d.name",
    "SELECT k, v FROM t ORDER BY v DESC, k LIMIT 20",
    "SELECT DISTINCT k FROM t ORDER BY k",
]


def _canon(rows):
    """Round floats: parallel reduction order may differ in the last ulp,
    matching the reference's multi-GPU reduce behavior."""
    out = []
    for r in rows:
        out.append(
            tuple(round(v, 8) if isinstance(v, float) else v for v in r)
        )
    return out


@pytest.mark.parametrize("sql", QUERIES, ids=lambda q: q[:48])
def test_sharded_matches_single(pair, sql):
    single, sharded = pair
    a = _canon(single.sql(sql).rows())
    b = _canon(sharded.sql(sql).rows())
    if "ORDER BY" in sql:
        assert a == b
    else:
        assert sorted(map(repr, a)) == sorted(map(repr, b))


def test_mesh_created(pair):
    _, sharded = pair
    assert sharded.executor.mesh is not None
    assert sharded.executor.mesh.devices.size == 8


def test_reduce_scatter_groupby_owner_sharded():
    import numpy as np
    import jax.numpy as jnp

    from heavydb_tpu.parallel.dist_query import (
        distributed_groupby_reduce_scatter,
    )
    from heavydb_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    n = 8 * 1000
    keys = rng.integers(0, 64, n).astype(np.int32)
    keys[: n // 2] = 7  # heavy skew: one key on half the rows
    vals = rng.random(n).astype(np.float32)
    nrows = np.full(8, 1000, np.int32)
    fn = distributed_groupby_reduce_scatter(mesh, 64)
    counts, sums = fn(jnp.asarray(keys), jnp.asarray(vals),
                      jnp.asarray(nrows))
    counts = np.asarray(counts)
    want_c = np.bincount(keys, minlength=64)
    want_s = np.zeros(64)
    np.add.at(want_s, keys, vals)
    assert np.array_equal(counts, want_c)
    assert np.allclose(np.asarray(sums), want_s, rtol=1e-5)
