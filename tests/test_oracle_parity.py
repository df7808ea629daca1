"""The t2 gate, locally: every corpus query with an oracle must hash-match
DuckDB on the same fixtures; rows-only queries must at least run and
return a stable schema."""

from __future__ import annotations

import pytest

from elasticsearch_hadoop_spark.corpus import load_all
from tests.oracle_harness import compare

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir, duck):
    ok, msg = compare(REGISTRY[name], spark, sf_dir, duck)
    assert ok, f"{name}: {msg}"


# Every registered query currently carries an oracle, so the rows-only
# leg is empty — defining it anyway would log a perpetual parametrize
# skip.  It reappears automatically if a rows-only query is ever added.
if ROWS_ONLY:

    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_rows_only_runs(name, spark, sf_dir):
        df = REGISTRY[name].fn(spark, sf_dir)
        rows = df.collect()
        assert rows is not None
        assert len(df.columns) > 0
