"""The self-healing polars importer must recover a worker whose polars
import was poisoned (stale submodule `pl` globals after a failed first
import — the RecursionError/`has no attribute 'Series'` mode that took a
Ray worker down for every later polars task). Runs in a subprocess so the
purge/re-import can't disturb this process's healthy polars."""

import subprocess
import sys

SCRIPT = r"""
import sys, types

import polars  # healthy first import
import polars._utils.various as various

# Simulate the poisoned state observed in Ray workers: a cached polars
# submodule whose `pl` global points at a dead partial parent module that
# lacks Series/DataFrame (attribute misses raise, as on the real partial).
dead = types.ModuleType("polars")
various.pl = dead

# The exact crash path from the incident:
try:
    polars.DataFrame({"a": [1, 2]}).filter(polars.col("a") > 1)
    raise SystemExit("expected the poisoned filter to fail")
except AttributeError:
    pass

from raycontract._plsafe import import_polars

pl = import_polars()  # must purge + re-import + pass the canary
assert pl.DataFrame({"a": [1, 2]}).filter(pl.col("a") > 1).height == 1
assert "Series" in vars(pl)
# the rebuilt submodule must reference the fresh parent
assert vars(sys.modules["polars._utils.various"])["pl"] is pl
# second call is the cached fast path
assert import_polars() is pl
print("HEALED")
"""


def test_plsafe_heals_poisoned_polars():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True,
        cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "HEALED" in out.stdout


def test_plsafe_fast_path_returns_healthy_module():
    from raycontract._plsafe import import_polars

    import polars

    pl = import_polars()
    assert pl is polars or "Series" in vars(pl)
    assert import_polars() is pl
