"""Driver-contract smoke tests: entry(), queries()/oracle_sql() integrity."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"l_returnflag", "n_rows", "sum_qty"}


def test_registry_integrity(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 28
    assert set(oracles) <= set(qs)
    # every callable takes (spark, sf_dir)
    import inspect
    for name, fn in qs.items():
        assert len(inspect.signature(fn).parameters) == 2, name
