"""Local mimic of the driver's correctness gate.

Runs every REGISTRY query through Spark AND its DuckDB oracle on the
same parquet, then compares row count + column names + order-insensitive
values (exact — no float tolerance, by design: oracle-checked queries
only emit deterministic values; see queries.py docstring).

Uses sf0.001 by default for speed; set SPARK_GRAFT_SF_DIR_TEST to
/root/testdata/sf0.01 to match the driver's scale exactly.
"""

import math

import duckdb
import pytest

from datafusion_uba_spark.queries import REGISTRY
from datafusion_uba_spark.sources import TESTDATA_TABLES


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    """Canonical python value for order-insensitive comparison."""
    if v is None:
        return None
    if hasattr(v, "item") and not hasattr(v, "__len__"):  # numpy scalar
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    return v


def _rows(pdf):
    cols = sorted(pdf.columns)
    out = []
    for _, r in pdf[cols].iterrows():
        out.append(tuple(_canon(r[c]) for c in cols))
    return sorted(out, key=repr), cols


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, sf_dir, ddb, name):
    fn, oracle = REGISTRY[name]
    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()
    if oracle is None:
        assert len(spdf) >= 0  # rows-only check, like the driver's
        return
    opdf = ddb.sql(oracle).df()
    srows, scols = _rows(spdf)
    orows, ocols = _rows(opdf)
    assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    for i, (a, b) in enumerate(zip(srows, orows)):
        assert a == b, f"{name}: row {i} differs:\n spark={a}\n duckdb={b}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["row_idx", "day_offset", "retained"]
