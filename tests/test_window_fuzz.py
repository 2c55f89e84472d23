"""Randomized window-function fuzz vs the SQLite oracle (sqlite ≥ 3.25
implements SQL window functions) — extends the deterministic window tests
with generated partition/order/frame combinations."""

import random

import numpy as np
import pytest

from tests.test_sqlite_oracle import Oracle


@pytest.fixture(scope="module")
def wdb():
    import heavydb_tpu as hdt

    return hdt.connect()


@pytest.fixture(scope="module")
def woracle(wdb):
    rng = np.random.default_rng(31415)
    o = Oracle(wdb)
    n = 600
    o.load(
        "w1",
        {
            "p": [int(v) for v in rng.integers(0, 7, n)],
            "o": [int(v) for v in rng.integers(0, 50, n)],
            "v": [None if i % 11 == 0 else float(round(x, 2))
                  for i, x in enumerate(rng.normal(0, 10, n))],
            "f": [float(round(x, 1)) for x in rng.normal(0, 3, n)],
            "s": [f"t{int(v)}" for v in rng.integers(0, 9, n)],
            "rid": list(range(n)),
        },
        {"p": "INT", "o": "INT", "v": "DOUBLE", "f": "DOUBLE",
         "s": "TEXT", "rid": "INT"},
    )
    return o


class WGen:
    FUNCS = [
        "ROW_NUMBER()", "RANK()", "DENSE_RANK()",
        "COUNT(*)", "COUNT(v)", "SUM(v)", "MIN(v)", "MAX(v)",
        "LAG(v)", "LEAD(v)", "FIRST_VALUE(v)", "LAST_VALUE(v)",
    ]
    FRAMES = [
        "",
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
        " ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        " ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        " RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    ]

    def __init__(self, seed):
        self.r = random.Random(seed)

    def query(self):
        r = self.r
        fn = r.choice(self.FUNCS)
        frame = ""
        if fn.split("(")[0] in ("COUNT", "SUM", "MIN", "MAX",
                                "FIRST_VALUE", "LAST_VALUE"):
            frame = r.choice(self.FRAMES)
        ranky = fn.split("(")[0] in ("ROW_NUMBER", "RANK", "DENSE_RANK",
                                     "LAG", "LEAD", "FIRST_VALUE",
                                     "LAST_VALUE")
        part = r.choice(["", "PARTITION BY p"])
        # order-key variants: ints (packable), a FLOAT key (generic
        # operand path — regression: RANGE peers over-split there), and
        # a dict STRING key (lexicographic rank tables)
        order = r.choice([
            "ORDER BY o, rid",
            "ORDER BY f, rid",
            "ORDER BY s, rid",
            "ORDER BY o, s, rid",
        ]) if not frame.strip().startswith("RANGE") else "ORDER BY o, rid"
        spec = " ".join(x for x in (part, order) if x) + frame
        # WHERE filters exercise the Compound-child path (regression:
        # dict-string rank tables were skipped under a filtered child)
        where = r.choice(["", "WHERE o < 40", "WHERE p <> 3"])
        return (f"SELECT rid, {fn} OVER ({spec}) FROM w1 {where} "
                "ORDER BY rid")


@pytest.mark.parametrize("batch", range(4))
def test_window_fuzz(woracle, batch):
    gen = WGen(2718 + batch)
    for qi in range(15):
        q = gen.query()
        try:
            woracle.check(q)
        except Exception as e:
            raise AssertionError(
                f"seed={2718 + batch} #{qi}: {q}\n{type(e).__name__}: {e}"
            ) from None
