"""Driver-contract tests: every queries() entry hash-matches its DuckDB
oracle at sf0.001 (the driver's own gate runs sf0.01), and entry() returns
rows with a stable schema."""

import pytest

from owlfrontier.oracle_check import compare
from owlfrontier.queries import ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.001"


# non-SQL-expressible ops: queries() entries with NO oracle — the driver
# records the weaker rows-only check for these (pandas-UDF string work /
# binary decode); their exact semantics are pinned by pytest goldens
ROWS_ONLY = {"search_highlights", "multimodal_features"}


def test_registry_complete():
    assert set(QUERIES) == set(ORACLE) | ROWS_ONLY
    assert not ROWS_ONLY & set(ORACLE)
    assert len(ORACLE) >= 18


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    r = compare(name, spark, SF_DIR)
    assert r["ok"], r


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["seq", "generation", "url", "doc_id", "text_json"]
    assert rows[0]["text_json"].startswith('{"title":"Doc 0"')
