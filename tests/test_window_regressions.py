"""Regressions for two latent window bugs found by the distributed
window oracle (fixed in the same change):

1. the generic (non-packable) window sort derived RANGE peer starts
   from a slice that included the row iota whenever payload operands
   rode the sort — every row became its own peer group
2. dict-string ORDER BY under a filtered child lost its dictionary
   identity and silently ranked by dictionary id
"""

import numpy as np
import pytest


def test_range_peers_on_unpackable_sort(db):
    # float ORDER BY key → _pack_plan returns None → generic operand
    # path; duplicate keys + a payload (the SUM argument) exercised the
    # over-split
    db.sql("CREATE TABLE wr (g INT, f DOUBLE, v DOUBLE)")
    rows = [(0, 1.5, 10.0), (0, 1.5, 20.0), (0, 2.5, 5.0),
            (1, 1.5, 1.0), (1, 1.5, 2.0)]
    db.sql("INSERT INTO wr VALUES " + ", ".join(map(str, rows)))
    got = db.sql(
        "SELECT g, f, sum(v) OVER (PARTITION BY g ORDER BY f) "
        "FROM wr ORDER BY g, f, v"
    ).rows()
    # RANGE peers: both f=1.5 rows of g=0 share the sum 30
    assert got == [
        (0, 1.5, 30.0), (0, 1.5, 30.0), (0, 2.5, 35.0),
        (1, 1.5, 3.0), (1, 1.5, 3.0),
    ]


def test_dict_order_lexicographic_under_filter(db):
    db.sql("CREATE TABLE wd (g INT, s TEXT)")
    # insertion order puts 'zz' at dictionary id 0; lexicographic order
    # must still rank 'aa' first — including under a WHERE (whose child
    # Compound drops target dict_refs)
    db.sql(
        "INSERT INTO wd VALUES (0, 'zz'), (0, 'aa'), (0, 'mm'), (1, 'zz')"
    )
    got = db.sql(
        "SELECT s, row_number() OVER (PARTITION BY g ORDER BY s) "
        "FROM wd WHERE g = 0 ORDER BY s"
    ).rows()
    assert got == [("aa", 1), ("mm", 2), ("zz", 3)]
