"""Every catalog query with an oracle must hash-match DuckDB at the test SF.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json) so
failures surface locally before a round submit.
"""

import pytest

from music_recommendation_service_spark.plans import registry
from tests.oracle import assert_matches_oracle

_REG = registry()


@pytest.mark.parametrize("name", sorted(_REG))
def test_query_matches_oracle(spark, sf_dir, name):
    q = _REG[name]
    df = q.build(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only smoke, mirroring the weaker check
        return
    assert_matches_oracle(df, sf_dir, q.oracle, name)
