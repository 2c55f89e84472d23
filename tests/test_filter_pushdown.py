"""Filter push-down into the join pipeline (reference JoinFilterPushDown /
FILTER_PROJECT_TRANSPOSE rules, QueryEngine/JoinFilterPushDown.cpp):
single-input WHERE conjuncts move to the probe mask (before expansion) or
the INNER build side's validity.  Differential-checked vs the SQLite
oracle; the plan split itself is asserted on the executor's _CompoundPlan."""

import numpy as np
import pytest

import heavydb_tpu as hdt
from tests.test_sqlite_oracle import Oracle


@pytest.fixture()
def oracle(db, rng):
    o = Oracle(db)
    n = 4000
    o.load(
        "pf",
        {
            "k": [int(v) for v in rng.integers(0, 40, n)],
            "x": [int(v) if i % 9 else None
                  for i, v in enumerate(rng.integers(-100, 100, n))],
            "v": [float(round(v, 3)) for v in rng.normal(0, 10, n)],
        },
        {"k": "INT", "x": "INT", "v": "DOUBLE"},
    )
    m = 500
    o.load(
        "pd",
        {
            "k": [int(v) for v in rng.integers(0, 50, m)],
            "g": [int(v) if i % 6 else None
                  for i, v in enumerate(rng.integers(0, 8, m))],
            "w": [float(round(v, 2)) for v in rng.uniform(0, 5, m)],
        },
        {"k": "INT", "g": "INT", "w": "DOUBLE"},
    )
    return o


PUSHDOWN_QUERIES = [
    # probe-side conjunct (→ pre_mask)
    "SELECT count(*), sum(f.v) FROM pf f JOIN pd d ON f.k = d.k WHERE f.x > 0",
    # build-side conjunct on an INNER level (→ build_filters)
    "SELECT count(*), sum(f.v) FROM pf f JOIN pd d ON f.k = d.k WHERE d.g < 4",
    # both + a cross-input residual conjunct
    "SELECT count(*) FROM pf f JOIN pd d ON f.k = d.k "
    "WHERE f.x > -50 AND d.g <= 5 AND f.v < d.w * 20",
    # NULL-valued pushed conjuncts (NULL → row dropped, same as WHERE)
    "SELECT count(*) FROM pf f JOIN pd d ON f.k = d.k WHERE f.x <> 3 AND d.g <> 2",
    # group-by over a pushed-filter join (NULLS FIRST matches sqlite's
    # default NULL placement; the engine default is NULLS LAST)
    "SELECT d.g, count(*), sum(f.v) FROM pf f JOIN pd d ON f.k = d.k "
    "WHERE f.x > 10 AND d.w > 1.0 GROUP BY d.g ORDER BY d.g NULLS FIRST",
    # LEFT join: probe-side pushes, build-side conjunct must NOT be pushed
    # (it would drop null-extended rows differently) — stays in the residual
    "SELECT count(*), count(d.g) FROM pf f LEFT JOIN pd d ON f.k = d.k "
    "WHERE f.x > 0",
    "SELECT count(*) FROM pf f LEFT JOIN pd d ON f.k = d.k "
    "WHERE f.x > 0 AND d.g IS NULL",
    # three-way with per-input conjuncts
    "SELECT count(*) FROM pf f JOIN pd d ON f.k = d.k JOIN pd e ON f.k = e.k "
    "WHERE f.x > 0 AND d.g = 1 AND e.g = 2",
]


@pytest.mark.parametrize("sql", PUSHDOWN_QUERIES)
def test_pushdown_parity(oracle, sql):
    oracle.check(sql)


def _planned(db, sql):
    """Run + capture the _CompoundPlan the executor built."""
    from heavydb_tpu.exec import executor as X

    captured = {}
    orig = X.Executor._plan_compound

    def spy(self, node, batches, offsets):
        plan = orig(self, node, batches, offsets)
        if node.join_levels:
            captured["plan"] = plan
        return plan

    X.Executor._plan_compound = spy
    try:
        db.sql(sql)
    finally:
        X.Executor._plan_compound = orig
    return captured["plan"]


def test_split_happens(oracle):
    db = oracle.db
    plan = _planned(
        db,
        "SELECT count(*) FROM pf f JOIN pd d ON f.k = d.k "
        "WHERE f.x > 0 AND d.g < 4 AND f.v < d.w * 20",
    )
    assert len(plan.pre_mask) == 1  # f.x > 0
    assert len(plan.build_filters.get(1, [])) == 1  # d.g < 4
    # the cross-input conjunct was already hoisted into the join's
    # residual by the optimizer — nothing remains post-join
    assert plan.filter_rest == []
    assert any(jp.residual for jp in plan.joins)


def test_left_build_conjunct_not_pushed(oracle):
    plan = _planned(
        oracle.db,
        "SELECT count(*) FROM pf f LEFT JOIN pd d ON f.k = d.k "
        "WHERE f.x > 0 AND d.g IS NULL",
    )
    assert len(plan.pre_mask) == 1  # probe side still pushes
    assert not plan.build_filters  # d-side conjunct must stay post-join
    assert len(plan.filter_rest) == 1


def test_div_conjunct_not_pushed(oracle):
    # DIV raises a division-by-zero error flag; it must not be evaluated
    # for rows a later residual would have dropped → never pushed
    plan = _planned(
        oracle.db,
        "SELECT count(*) FROM pf f JOIN pd d ON f.k = d.k "
        "WHERE 100 / (f.x + 200) > 0",
    )
    assert not plan.pre_mask
    assert plan.filter_rest and len(plan.filter_rest) == 1


def test_pushdown_shrinks_expansion_cap(db, rng):
    """Build-side push means filtered build rows don't occupy join-table
    slots: a 1:N join whose N collapses under the pushed filter must not
    need the unfiltered expansion capacity."""
    n = 20_000
    k = rng.integers(0, 10, n).astype(np.int32)
    db.load_table("bigf", {"k": k}, create=True)
    # build: 200 rows per key, but only 1 per key survives sel = 0
    bk = np.repeat(np.arange(10, dtype=np.int32), 200)
    sel = np.tile(np.arange(200, dtype=np.int32), 10)
    db.load_table("bigd", {"k": bk, "sel": sel}, create=True)
    r = db.sql(
        "SELECT count(*) FROM bigf f JOIN bigd d ON f.k = d.k WHERE d.sel = 0"
    ).rows()
    assert r[0][0] == n  # exactly one build match per probe row


def test_dead_column_elimination(db, rng):
    """Optimizer pass 4 (reference eliminate_dead_columns): a derived
    table computing unused expressions gets trimmed to what the outer
    query references."""
    n = 30_000
    db.load_table("wide", {
        "k": rng.integers(0, 50, n).astype(np.int32),
        "a": rng.random(n).astype(np.float32),
        "b": rng.random(n).astype(np.float32),
        "c": rng.random(n).astype(np.float32),
        "d": rng.integers(0, 9, n).astype(np.int32),
    }, create=True)
    from heavydb_tpu.plan import rel_alg as R
    from heavydb_tpu.plan.optimizer import optimize
    from heavydb_tpu.sql.parser import parse

    # pure projections inline during fusion; an AGGREGATE derived table
    # survives as an intermediate Compound — its unused aggs must go
    q = ("SELECT t.k, t.s FROM (SELECT k, sum(a) AS s, sum(b) AS sb, "
         "sum(c) AS sc, count(d) AS cd FROM wide GROUP BY k) t "
         "WHERE t.s > 0")
    node = optimize(db._plan_select(parse(q)))
    if isinstance(node, R.Sort):
        node = node.inputs[0]
    inner = node.inputs[0]
    assert isinstance(inner, R.Compound) and inner.is_aggregate
    assert inner.arity == 2  # k, s — sb/sc/cd eliminated
    assert len(inner.aggs) == 1
    # and the results are right
    rows = db.sql(q + " ORDER BY t.k").rows()
    import numpy as np_
    k = np_.asarray(db.sql("SELECT k FROM wide").to_pandas()["k"])
    a = np_.asarray(db.sql("SELECT a FROM wide").to_pandas()["a"])
    assert len(rows) == 50
    for kk, s in rows[:5]:
        assert s == pytest.approx(float(a[k == kk].sum()), rel=1e-4)


def test_filter_aggregate_transpose(db):
    """WHERE on a group-key output of an aggregate subquery filters rows
    BEFORE grouping (optimizer._push_filter_through_agg; reference
    FilterAggregateTransposeRule), and results match the unpushed
    semantics."""
    import numpy as np

    from heavydb_tpu.plan import rel_alg as R
    from heavydb_tpu.plan.optimizer import optimize
    from heavydb_tpu.sql.parser import parse

    rng = np.random.default_rng(4)
    n = 20_000
    k = rng.integers(0, 500, n).astype(np.int32)
    v = rng.random(n).astype(np.float32)
    db.sql("CREATE TABLE fat (k INT, v FLOAT)")
    db.catalog.get_table("fat").insert_columns({1: k, 2: v})

    q = ("SELECT k, cnt FROM (SELECT k, count(*) AS cnt, sum(v) AS sv "
         "FROM fat GROUP BY k) WHERE k BETWEEN 10 AND 20 AND cnt > 0")
    plan = optimize(db._plan_select(parse(q)))
    # the key conjunct landed on the INNER aggregate's filter
    node = plan
    while not (isinstance(node, R.Compound) and node.is_aggregate):
        node = node.inputs[0]
    assert node.filter_cond is not None, "key filter not pushed below agg"

    rows = sorted(db.sql(q).rows())
    want = [(kk, int((k == kk).sum())) for kk in range(10, 21)]
    assert rows == want
