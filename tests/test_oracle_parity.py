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


def _dtype_fidelity_errors(spdf, opdf) -> list[str]:
    """The r7 lesson: value-level parity is WEAKER than the driver's
    type-sensitive hash. DuckDB silently widens (sum(BIGINT) ->
    HUGEINT, which lands in pandas as object/float), the values still
    compare equal, and only the driver catches it. So: any column
    Spark delivers as a concrete numeric dtype must come back from the
    oracle as the SAME pandas dtype — unless either side holds NULLs
    (nullable-int widening is a pandas artifact, not an engine type
    drift)."""
    errors = []
    for c in spdf.columns:
        if c not in opdf.columns:
            continue
        sd, od = str(spdf[c].dtype), str(opdf[c].dtype)
        if sd.startswith(("int", "uint", "float")) and od != sd:
            if spdf[c].isnull().any() or opdf[c].isnull().any():
                continue
            errors.append(
                f"column {c!r} typed {sd} in Spark but {od} in the oracle "
                "frame (driver hash is type-sensitive — CAST the oracle "
                "aggregate)"
            )
    return errors


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
    fidelity = _dtype_fidelity_errors(spdf, opdf)
    assert not fidelity, f"{name}: " + "; ".join(fidelity)


def test_dtype_fidelity_rejects_hugeint():
    """The gate-hardening pin: a DuckDB oracle whose aggregate comes
    back HUGEINT (pandas object/float) against a Spark bigint column
    must FAIL locally — this is exactly the r7 events_json_props
    defect, which value-level comparison let through."""
    import pandas as pd

    con = duckdb.connect()
    # sum(BIGINT) -> HUGEINT: the classic trap
    bad = con.sql(
        "SELECT sum(x) AS s FROM (SELECT CAST(3 AS BIGINT) AS x)"
    ).df()
    good = con.sql(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT CAST(3 AS BIGINT) AS x)"
    ).df()
    sp = pd.DataFrame({"s": pd.Series([3], dtype="int64")})
    assert _dtype_fidelity_errors(sp, bad), (
        f"HUGEINT frame (dtype {bad['s'].dtype}) must be flagged"
    )
    assert not _dtype_fidelity_errors(sp, good)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["row_idx", "day_offset", "retained"]
