"""Arrow-type-faithfulness sweep over every registered oracle.

The driver's correctness hasher is type-sensitive: DuckDB widens sums of
BIGINT to HUGEINT (decimal128 over Arrow), and the `// ` integer division
preserves it, so an uncast aggregate column hashes differently from Spark's
int64 even when every value is equal.  That was the r2/r3 `compaction_plan`
red row: rows+schema matched, hash didn't, for two rounds, because the local
gate fetched via `fetchall()` which coerces HUGEINT back to Python int.

This sweep runs ONLY the DuckDB side (no Spark needed) of all full_oracles()
at sf0.001 and fails on any decimal / >64-bit-integer output column, so the
class can never hide again.  Fix is always `cast(... AS BIGINT)` in the
oracle text (the engine side is already int64).
"""

from __future__ import annotations

import pytest

from s3bigdatasync_spark import registry
from tests.oracle_utils import duck_connect, oracle_type_violations

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_connect(SF_DIR)
    yield c
    c.close()


def _oracle_items():
    return sorted(registry.full_oracles().items())


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_output_types_hashable(con, name, sql):
    schema = con.execute(sql).fetch_arrow_table().schema
    bad = oracle_type_violations(schema)
    assert not bad, (
        f"oracle {name!r} emits driver-hash-unsafe column types {bad}; "
        f"wrap the expression in cast(... AS BIGINT) in the oracle SQL"
    )
