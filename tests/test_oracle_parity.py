"""THE correctness gate replica: every registered query vs its DuckDB
oracle at sf0.01, exactly as the driver will run it."""

from __future__ import annotations

import pytest

from event_streaming_service_spark.queries import REGISTRY, _load_all
from tests import parity

_load_all()
_NAMES = sorted(REGISTRY)


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, sf_oracle, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_oracle)
    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        n = df.count()
        assert n >= 0
        assert df.schema is not None
        return
    want = parity.run_oracle(spec.oracle, sf_oracle)
    parity.compare(df, want, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
