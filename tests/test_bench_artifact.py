"""Guards the bench artifact contract.

Round 6 regression: the single stdout JSON line grew past the driver's
~2 KB stdout tail capture (it carried per-rep ``runs`` arrays for 31
queries), so ``BENCH_r06.json`` recorded ``parsed: null`` despite a
clean run. The fix splits the output into a compact headline line and
a sidecar file; these tests pin that split so it cannot regress as the
registry grows.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import build_artifacts  # noqa: E402
from datafusion_uba_spark.queries import queries  # noqa: E402


def _fake_results():
    names = list(queries())
    assert len(names) >= 30, "registry unexpectedly shrank"
    per_query = {n: 9999.1234 for n in names}
    per_runs = {n: [9999.1234, 9999.5678, 9999.9012] for n in names}
    return names, per_query, per_runs


def test_headline_line_fits_driver_capture():
    _, per_query, per_runs = _fake_results()
    headline, _ = build_artifacts(per_query, per_runs, {}, 3, 0.1)
    # bench.py prints with compact separators; measure the same bytes
    line = json.dumps(headline, separators=(",", ":"))
    # driver tail capture is ~2 KB; leave headroom for registry growth
    assert len(line) < 1800, f"headline line is {len(line)} bytes"
    assert "runs" not in headline
    assert headline["metric"] == "registry_total_wall"
    assert set(headline["queries"]) == set(per_query)


def test_headline_stays_small_even_with_errors():
    names, per_query, per_runs = _fake_results()
    # a long error message must not bloat the headline: only names go there
    errors = {names[0]: "X" * 500, names[1]: "Y" * 500}
    for n in (names[0], names[1]):
        per_query.pop(n)
        per_runs.pop(n)
    headline, sidecar = build_artifacts(per_query, per_runs, errors, 3, 0.1)
    line = json.dumps(headline, separators=(",", ":"))
    assert len(line) < 1800, f"headline line is {len(line)} bytes"
    assert headline["failed"] == sorted(errors)
    assert all(len(v) == 500 for v in sidecar["errors"].values())


def test_sidecar_carries_full_detail():
    _, per_query, per_runs = _fake_results()
    headline, sidecar = build_artifacts(per_query, per_runs, {}, 3, 0.1)
    assert sidecar["runs"] == per_runs
    assert sidecar["repeat"] == 3
    assert sidecar["sf"] == 0.1
    assert all(
        sidecar["median"][n] == sorted(r)[1] for n, r in per_runs.items()
    )
    # headline best-of must agree with the sidecar's runs (headline is
    # rounded to 3 decimals for the byte budget; sidecar keeps full
    # precision)
    for n, best in headline["queries"].items():
        assert best == round(per_query[n], 3)
