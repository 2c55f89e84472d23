"""Reference synthetic micro-benchmark suite run VERBATIM
(Benchmarks/synthetic_benchmark/queries/* — PerfectHashSingleCol/MultiCol,
BaselineHash, MultiStep, NonGroupedAgg, Sort, ApproxMedian) against the
engine, differential-checked against SQLite.  The table mirrors
create_table.py:120-149 (controlled-cardinality x10..x10m uniform columns
plus sparse step-10k BIGINT keys) at reduced scale.

LIMIT-without-ORDER-BY picks an arbitrary subset, so those clauses are
stripped and the FULL result sets compared; the Sort suite (ORDER BY cnt
LIMIT 100, massively tied) checks the cnt column against SQLite's and
each returned key's count exactly."""

import glob
import os
import re
import sqlite3

import numpy as np
import pytest

import heavydb_tpu as hdt

QROOT = "/root/reference/Benchmarks/synthetic_benchmark/queries"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(QROOT), reason="reference synthetic queries absent"
)

N = 200_000


def _queries():
    out = []
    for path in sorted(glob.glob(os.path.join(QROOT, "*", "*.sql"))):
        suite = os.path.basename(os.path.dirname(path))
        name = os.path.basename(path)[:-4]
        with open(path) as f:
            sql = f.read().replace("##TAB##", "bench").strip().rstrip(";")
        out.append(pytest.param(suite, sql, id=name))
    return out


@pytest.fixture(scope="module")
def sdb():
    rng = np.random.default_rng(23)
    cols = {}
    for name, card in [("x10", 10), ("y10", 10), ("z10", 10),
                       ("x100", 100), ("y100", 100), ("z100", 100),
                       ("x1k", 1000), ("x10k", 10_000),
                       ("x100k", 100_000), ("x1m", 1_000_000),
                       ("x10m", 10_000_000)]:
        cols[name] = rng.integers(1, card + 1, N).astype(np.int32)
    for name, card in [("x10k_s10k", 10_000), ("x100k_s10k", 100_000),
                       ("x1m_s10k", 1_000_000)]:
        cols[name] = (
            rng.integers(1, card + 1, N).astype(np.int64) * 10_000
        )
    db = hdt.connect()
    decls = ", ".join(
        f"{c} {'BIGINT' if cols[c].dtype == np.int64 else 'INT'}"
        for c in cols
    )
    db.sql(f"CREATE TABLE bench ({decls})")
    db.load_table("bench", cols)

    lite = sqlite3.connect(":memory:")
    lite.execute(
        "CREATE TABLE bench ("
        + ", ".join(f"{c} INTEGER" for c in cols) + ")"
    )
    names = list(cols)
    rows = list(zip(*[cols[c].tolist() for c in names]))
    lite.executemany(
        f"INSERT INTO bench VALUES ({','.join('?' * len(names))})", rows
    )
    return db, lite, cols


def _norm(v):
    if isinstance(v, float):
        return round(v, 5)
    return v


def _rows_set(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


_LIMIT_RE = re.compile(r"\blimit\s+\d+\s*$", re.I)


@pytest.mark.parametrize("suite,sql", _queries())
def test_synthetic_query(sdb, suite, sql):
    db, lite, cols = sdb
    if suite == "ApproxMedian":
        rows = db.sql(sql).rows()
        if "group by" in sql.lower():
            for y, cnt, med in rows:
                sel = cols["y10"] == y
                assert cnt == int(sel.sum())
                assert med == pytest.approx(
                    float(np.median(cols["x10"][sel])), rel=1e-6)
        else:
            cnt, avg, med = rows[0]
            assert cnt == N
            assert avg == pytest.approx(float(cols["x10"].mean()), rel=1e-6)
            assert med == pytest.approx(
                float(np.median(cols["x10"])), rel=1e-6)
        return
    if suite == "Sort":
        rows = db.sql(sql).rows()
        key_col = re.match(r"select\s+(\w+)", sql, re.I).group(1)
        import collections

        true_counts = collections.Counter(cols[key_col].tolist())
        assert len(rows) == 100
        cnts = [r[1] for r in rows]
        assert cnts == sorted(cnts)  # ORDER BY cnt ascending
        for k, c in rows:
            assert true_counts[k] == c
        want = sorted(true_counts.values())[:100]
        assert cnts == want
        return
    run_sql = sql
    if "order by" not in sql.lower():
        run_sql = _LIMIT_RE.sub("", sql).strip()
    ours = _rows_set(db.sql(run_sql).rows())
    theirs = _rows_set(lite.execute(run_sql).fetchall())
    assert len(ours) == len(theirs), (len(ours), len(theirs), run_sql)
    assert ours == theirs, (
        f"\nquery: {run_sql}\nours:   {ours[:4]}\ntheirs: {theirs[:4]}"
    )
