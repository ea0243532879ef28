"""Driver-contract gate, in-suite: every queries() entry vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from tools.check_oracles import TABLES, compare

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _pairs():
    from rios_spark.queries import ORACLES, QUERIES

    return [(n, QUERIES[n], ORACLES.get(n)) for n in QUERIES]


@pytest.mark.parametrize("name,fn,oracle", _pairs(), ids=[n for n, *_ in _pairs()])
def test_query_matches_oracle(spark, con, name, fn, oracle):
    got = fn(spark, SF).toPandas()
    if oracle is None:
        assert len(got) >= 0  # rows-only contract
        if name == "extract_text_invariant":
            assert got["n_pages"].iloc[0] == got["n_byte_identical"].iloc[0]
        return
    want = con.execute(oracle).df()
    problems = compare(name, got, want)
    assert not problems, f"{name}: {problems}"
