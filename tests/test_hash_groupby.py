"""Hash (slot-claiming) group-by strategy tests — reference
GroupByBaselineHash coverage: sparse keys, NULLs, floats, multi-key
packing, the retry ladder, and NDV-based routing."""

import numpy as np
import pytest

import jax.numpy as jnp

from heavydb_tpu.ops.groupby import hash_group_ids, pack_group_keys


def _strategy_for(db, q):
    from heavydb_tpu.plan import rel_alg as R
    from heavydb_tpu.plan.optimizer import optimize
    from heavydb_tpu.sql.parser import parse

    plan = optimize(db._plan_select(parse(q)))
    for nd in R.topo_order(plan):
        if isinstance(nd, R.Compound) and nd.group_exprs:
            _, p = db.executor._prepare_compound(nd, {})
            return p.group_strategy[0]
    return None


@pytest.fixture()
def hdb():
    import heavydb_tpu as hdt
    from heavydb_tpu.config import Config

    # the hash strategy is opt-in on this runtime (colliding-scatter
    # cost); tests exercise it explicitly
    db = hdt.connect(config=Config(enable_hash_groupby=True))
    rng = np.random.default_rng(0)
    n = 300_000
    db.sql("CREATE TABLE h (sparse BIGINT, dupy BIGINT, f DOUBLE, "
           "a INT, b INT)")
    db.load_table("h", {
        "sparse": rng.integers(0, 10_000_000_000, n),
        "dupy": rng.integers(1, 1001, n).astype(np.int64) * 10_000_000_000,
        "f": rng.random(n) * 1e6,
        "a": rng.integers(0, 2_000_000, n).astype(np.int32),
        "b": rng.integers(0, 1_000_000, n).astype(np.int32),
    })
    return db


def test_ndv_routing(hdb):
    # ~unique sparse bigints → hash; 1000 heavy-duplicate keys → sort
    assert _strategy_for(
        hdb, "SELECT sparse, COUNT(*) FROM h GROUP BY sparse"
    ) == "hash"
    assert _strategy_for(
        hdb, "SELECT dupy, COUNT(*) FROM h GROUP BY dupy"
    ) == "sort"


def test_hash_groupby_parity_bigint(hdb):
    import pandas as pd

    got = hdb.sql(
        "SELECT sparse, COUNT(*) c FROM h GROUP BY sparse "
        "ORDER BY sparse LIMIT 10"
    ).rows()
    t = hdb.catalog.get_table("h")
    want = pd.Series(np.asarray(t.column_values(1))).value_counts()
    want = want.sort_index()
    assert [g[0] for g in got] == list(want.index[:10])
    assert [g[1] for g in got] == list(want.values[:10])


def test_hash_groupby_double_keys(hdb):
    import pandas as pd

    t = hdb.catalog.get_table("h")
    f = np.asarray(t.column_values(3))
    n_groups = hdb.sql(
        "SELECT COUNT(*) FROM (SELECT f FROM h GROUP BY f) q"
    ).scalar()
    assert n_groups == pd.Series(f).nunique()


def test_hash_groupby_null_keys(db):
    rng = np.random.default_rng(1)
    n = 300_000
    k = rng.integers(0, 10_000_000_000, n)
    k[::4] = np.iinfo(np.int64).min  # in-band NULL sentinel
    db.sql("CREATE TABLE hn (k BIGINT)")
    db.load_table("hn", {"k": k})
    rows = db.sql(
        "SELECT k, COUNT(*) c FROM hn GROUP BY k ORDER BY c DESC LIMIT 1"
    ).rows()
    assert rows[0][0] is None
    assert rows[0][1] == (n + 3) // 4


def test_hash_groupby_multikey_packed(hdb):
    import pandas as pd

    t = hdb.catalog.get_table("h")
    a = np.asarray(t.column_values(4))
    b = np.asarray(t.column_values(5))
    got = hdb.sql(
        "SELECT COUNT(*) FROM (SELECT a, b FROM h GROUP BY a, b) q"
    ).scalar()
    assert got == pd.DataFrame({"a": a, "b": b}).drop_duplicates().shape[0]


def test_hash_claim_retry_converges():
    rng = np.random.default_rng(2)
    n = 200_000
    keys = rng.integers(0, 1 << 60, n)
    packed = pack_group_keys([(jnp.asarray(keys), None)], None)
    # deliberately undersized table: 4x oversubscribed per round
    gid, total, unresolved, slot_keys = hash_group_ids(
        packed, None, 65536
    )
    assert int(unresolved) > 0  # the ladder would retry with 4x slots
    gid, total, unresolved, slot_keys = hash_group_ids(
        packed, None, 1 << 19
    )
    assert int(unresolved) == 0
    # every resolved slot's key table entry matches its rows' keys
    sk = np.asarray(slot_keys)
    g = np.asarray(gid)
    p = np.asarray(packed)
    sel = g < total
    assert (sk[g[sel]] == p[sel]).all()
