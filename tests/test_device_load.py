"""Device-resident ingest (api.load_table_device): seeds the device scan
cache directly from jax arrays — no host→device copy — with the host
master materialized lazily.  Reference analogue: GPU-resident columnar
ingest (heavy.thrift:736 load_table_binary_columnar / CUDA IPC buffers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import heavydb_tpu as hdt


@pytest.fixture()
def dev_db(db):
    n = 100_000
    k = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(k)
    db.load_table_device("dt", {
        "x": jax.random.randint(k1, (n,), 0, 100, jnp.int32),
        "y": jax.random.uniform(k2, (n,), jnp.float32),
        "b": jax.random.randint(k1, (n,), 0, 5, jnp.int64),
    }, create=True)
    return db, n


def test_device_load_queries(dev_db):
    db, n = dev_db
    (cnt, mn, mx), = db.sql("SELECT count(*), min(x), max(x) FROM dt").rows()
    assert cnt == n and mn == 0 and mx == 99
    rows = db.sql(
        "SELECT x, count(*) FROM dt WHERE y > 0.5 GROUP BY x"
    ).rows()
    assert sum(r[1] for r in rows) == db.sql(
        "SELECT count(*) FROM dt WHERE y > 0.5"
    ).rows()[0][0]


def test_device_load_stats_and_host_paths(dev_db):
    db, n = dev_db
    t = db.catalog.get_table("dt")
    st = t.fragments[0].stats[1]
    assert (st.min, st.max, st.has_nulls) == (0, 99, False)
    # UPDATE forces lazy host materialization; results stay consistent
    db.sql("UPDATE dt SET x = -1 WHERE x = 99")
    assert db.sql("SELECT count(*) FROM dt WHERE x = 99").rows() == [(0,)]
    assert db.sql("SELECT count(*) FROM dt").rows() == [(n,)]


def test_device_load_dict_strings(db):
    n = 50_000
    k = jax.random.PRNGKey(1)
    vocab = ["AA", "UA", "DL"]
    db.load_table_device("df", {
        "carrier": jax.random.randint(k, (n,), 0, 3, jnp.int32),
        "v": jax.random.uniform(k, (n,), jnp.float32),
    }, create=True, dicts={"carrier": vocab})
    rows = db.sql(
        "SELECT carrier, count(*) FROM df GROUP BY carrier ORDER BY carrier"
    ).rows()
    assert [r[0] for r in rows] == sorted(vocab)
    assert sum(r[1] for r in rows) == n
    assert db.sql(
        "SELECT count(*) FROM df WHERE carrier LIKE 'A%'"
    ).rows()[0][0] == rows[0][1]


def test_device_load_rejects(db):
    a = jnp.zeros(10, jnp.int32)
    db.load_table_device("r1", {"x": a}, create=True)
    with pytest.raises(Exception):
        db.load_table_device("r1", {"x": a})  # non-empty target
    with pytest.raises(Exception):
        db.load_table_device(
            "r2", {"s": jnp.zeros(4, jnp.complex64)}, create=True
        )


def test_device_load_fragments_and_streaming(db):
    """Bulk device ingest splits at fragment_rows: fragment-wave streaming
    (top-k + partial-agg merge) and chunk-stat pruning work on
    device-loaded tables (BASELINE config 4 mechanism at small scale)."""
    import jax.numpy as jnp

    db.config.stream_threshold_bytes = 1 << 12  # 4KB → everything streams
    db.sql("CREATE TABLE dfrag (k INT, v FLOAT) WITH (fragment_size=1000)")
    n = 10_000
    rng = np.random.default_rng(5)
    k = rng.integers(0, 50, n).astype(np.int32)
    v = rng.random(n).astype(np.float32)
    db.load_table_device("dfrag", {"k": jnp.asarray(k), "v": jnp.asarray(v)})
    t = db.catalog.get_table("dfrag")
    assert len(t.fragments) == 10
    assert all(f.num_rows == 1000 for f in t.fragments)
    # per-fragment stats exist (pruning metadata)
    st = t.fragments[3].stats[1]
    assert st.min == k[3000:4000].min() and st.max == k[3000:4000].max()

    # streamed top-k over waves
    rows = db.sql("SELECT k, v FROM dfrag ORDER BY v DESC LIMIT 5").rows()
    order = np.argsort(-v)[:5]
    assert [r[1] for r in rows] == pytest.approx(v[order].tolist())

    # streamed group-by with partial-agg merge
    rows = sorted(db.sql(
        "SELECT k, count(*), sum(v) FROM dfrag GROUP BY k").rows())
    ref_c = np.bincount(k, minlength=50)
    ref_s = np.bincount(k, weights=v.astype(np.float64), minlength=50)
    for kk, c, s in rows:
        assert c == ref_c[kk]
        assert s == pytest.approx(ref_s[kk], rel=1e-4)

    # host materialization of a fragment VIEW (LazyDeviceChunk bounds)
    frag_vals = np.asarray(t.fragments[7].chunks[2])
    assert np.allclose(frag_vals, v[7000:8000])
