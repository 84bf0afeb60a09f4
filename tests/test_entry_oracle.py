"""Pre-gate: every queries() entry must match its oracle_sql() in DuckDB.

Emulates the driver's correctness check locally at sf0.001: row count,
column names, and order-insensitive values (floats rounded in-query on both
sides, so plain equality after sorting is expected).
"""

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def _entries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o.get(name)) for name in q]


@pytest.mark.parametrize("name,fn,sql", _entries(), ids=[n for n, _, _ in _entries()])
def test_entry_matches_oracle(spark, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    spark_rows = sdf.collect()
    cols = sdf.columns
    if sql is None:
        assert len(spark_rows) >= 0
        return
    con = _duck()
    duck = con.sql(sql)
    duck_cols = [d[0] for d in duck.description]
    assert cols == duck_cols, f"{name}: column mismatch {cols} vs {duck_cols}"
    duck_rows = duck.fetchall()
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    got = _norm([tuple(r[c] for c in cols) for r in spark_rows], cols)
    exp = _norm(duck_rows, cols)
    mism = [(g, e) for g, e in zip(got, exp) if g != e]
    assert not mism, f"{name}: {len(mism)} mismatched rows; first: {mism[:3]}"
    if name.endswith("_nonvacuous"):
        # these entries exist precisely to certify with rows present
        assert len(spark_rows) >= 1, f"{name}: vacuous (0 rows)"
