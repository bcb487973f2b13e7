"""Registry sanity: every declared query runs at sf0.001 and returns a
DataFrame; every oracle key has a matching query. (The full hash-match
gate is scripts/check_oracle.py at sf0.01.)"""

import os

import pytest

from tensorflow_recorder_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, name
    assert df.count() >= 0
