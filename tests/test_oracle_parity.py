"""Every declared query must hash-match its DuckDB oracle — the same gate
the correctness driver applies at sf0.01 (run here at the conftest SF)."""

from __future__ import annotations

import pytest

import xarray_dataaccessor_spark.queries_ext  # noqa: F401 (registers extension queries)
from xarray_dataaccessor_spark.queries import ORACLES, QUERIES

from tests.oracle_utils import assert_frames_match


def test_every_query_has_an_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops are allowed to omit the oracle, but must be
    # explicitly listed here so the gap is a decision, not an accident.
    allowed_weak = {name for name in missing if name.endswith("_noracle")}
    assert missing == allowed_weak, f"queries without oracle: {missing - allowed_weak}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 2


def test_driver_window_is_fully_oracle_backed():
    """The correctness driver verifies the FIRST 50 queries() entries;
    every one of them must carry an oracle (rows-only entries must sort
    after) and the window must be exactly full — a regression here would
    silently drop hard verification from an operator."""
    import __spark_entry__ as e

    names = list(e.queries())
    oracles = e.oracle_sql()
    window = names[:50]
    missing = [n for n in window if n not in oracles]
    assert missing == [], f"driver window entries without oracles: {missing}"
    assert len(oracles) == 50, (
        f"{len(oracles)} oracle-backed queries; the 50-slot window should "
        "be exactly full (fuse or split queries to keep hard coverage)"
    )
    for n in names[50:]:
        assert n not in oracles, f"oracle-backed {n} outside the window"
