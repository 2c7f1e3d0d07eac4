"""Oracle-equivalence gate for queries beyond the driver's window.

The driver's CORRECTNESS gate grades the first 50 ``queries()`` entries;
everything after position 50 with a full DuckDB oracle is certified here
instead — the same Spark-vs-DuckDB row/column/value comparison, run at
sf0.001 so a plain pytest run exercises it.
"""

import os
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import __spark_entry__ as entry
from check_oracle import compare_arrow_schemas, compare_frames

SF_DIR = "/root/testdata/sf0.001"


def _beyond_window_oracle_queries() -> list[str]:
    q, o = list(entry.queries()), entry.oracle_sql()
    return [n for n in q[50:] if n in o]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for p in sorted(Path(SF_DIR).glob("*.parquet")):
        con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", _beyond_window_oracle_queries())
def test_beyond_window_query_matches_oracle(spark, duck, name):
    s_tbl = entry.queries()[name](spark, SF_DIR).toArrow()
    sdf = s_tbl.to_pandas()
    assert len(sdf) > 0, f"{name} returned no rows at sf0.001"
    d_tbl = duck.execute(entry.oracle_sql()[name]).arrow()
    err = compare_arrow_schemas(s_tbl, d_tbl) or compare_frames(
        sdf, d_tbl.to_pandas()
    )
    assert err is None, f"{name}: {err}"
