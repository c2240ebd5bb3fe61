"""Driver-contract files stay importable, well-formed — and EXECUTABLE.

Round-4 regression: the dryrun grew two engine compiles and blew the
driver's wall-clock budget (MULTICHIP_r04 rc=124) while this file only
asserted the entry points were importable. The executing test below
would have caught it: it runs the real ``dryrun_multichip(8)`` in a
subprocess (the same re-exec path the driver takes) under a hard
timeout and asserts all three ok lines print.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_graft_entry_shape():
    mod = _load(os.path.join(_REPO, "__graft_entry__.py"), "graft_entry")
    assert callable(mod.entry)
    assert callable(mod.dryrun_multichip)


def test_bench_importable_and_constants():
    mod = _load(os.path.join(_REPO, "bench.py"), "bench_mod")
    assert callable(mod.main)
    assert mod.REFERENCE_CROPS_PER_SEC > 0


def test_bench_output_is_one_json_line_schema():
    # schema-only check (no TPU in CI): the required keys exist in source
    src = open(os.path.join(_REPO, "bench.py")).read()
    for key in ('"metric"', '"value"', '"unit"', '"vs_baseline"'):
        assert key in src


# Budget for the full executed dryrun. The driver's own budget appears
# to be ~600 s (rc=124 at 792 s in round 4; ok at less in round 3), so
# the test bound is set BELOW that: with the persistent compile cache
# (.jax_cache, pre-warmed by any in-round run including this test's
# first execution) the run takes ~1-2 min; a cold 1-core compile of the
# slimmed programs measured ~7 min. The timeout fails the test rather
# than hanging the suite.
_DRYRUN_BUDGET_S = 540


@pytest.mark.slow
def test_dryrun_multichip_executes_within_budget():
    """Run the REAL driver contract end-to-end: dryrun_multichip(8) in a
    fresh process (its own env-based re-exec provisions the 8-device CPU
    mesh), asserting the train + both inference legs complete inside the
    wall-clock budget the driver enforces."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the re-exec child re-adds what it needs
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-u", "-c", code], cwd=_REPO,
        env=env, capture_output=True, text=True,
        timeout=_DRYRUN_BUDGET_S)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout
    assert "estimate_batch" in proc.stdout
    assert "estimate_objects" in proc.stdout
