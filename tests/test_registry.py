"""Registry invariants that keep shipped docs honest (r9 verdict ask 3):
the query/oracle counts printed in README.md must equal the live
registry, so adding a query without bumping the doc fails CI instead
of drifting silently."""

from __future__ import annotations

import re
from pathlib import Path

from data_mining_map_reduce_spark.queries import ORACLES, SPARK_QUERIES

README = Path(__file__).resolve().parent.parent / "README.md"


def test_readme_counts_match_registry():
    text = README.read_text()
    m = re.search(
        r"registry: (\d+) named queries, (\d+) paired with DuckDB oracle SQL",
        text,
    )
    assert m, "README.md registry count line missing or reworded"
    assert int(m.group(1)) == len(SPARK_QUERIES), (
        f"README says {m.group(1)} queries, registry has "
        f"{len(SPARK_QUERIES)} — update README.md"
    )
    assert int(m.group(2)) == len(ORACLES), (
        f"README says {m.group(2)} oracles, registry has "
        f"{len(ORACLES)} — update README.md"
    )


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(SPARK_QUERIES)
