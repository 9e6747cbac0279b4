"""Self-healing polars import for Ray worker processes.

Observed failure mode (polars 1.42, Ray 2.49 workers): the FIRST
``import polars`` inside a long-lived worker can die with a RecursionError
inside polars' lazy module ``__getattr__`` (polars/__init__.py:506-542 —
``import polars.datatypes.group`` re-enters ``__getattr__`` via the
``as``-binding getattr until the stack blows; the Rust side then panics at
``py_modules.rs:19``). importlib removes ``sys.modules['polars']`` on the
failure, but every polars SUBMODULE that finished importing stays cached —
and their ``import polars as pl`` globals keep pointing at the dead partial
parent. Any retry (``import polars``) rebuilds the parent but REUSES the
stale submodules, so internal calls like
``polars._utils.various.is_bool_sequence`` crash forever with
``module 'polars' has no attribute 'Series'``. One poisoned worker then
fails every polars-touching task Ray schedules onto it (seen as 8
correlated test failures from a single pid).

``import_polars()`` guards every worker-side use:

- fast path: the module in ``sys.modules`` is the one we already verified
  (identity check only — no attribute access that could hit ``__getattr__``);
- first call per process: a functional canary that exercises the exact
  crash path (``DataFrame.filter`` → ``is_bool_sequence`` → ``pl.Series``);
- on ANY failure: purge every ``polars*`` entry from ``sys.modules`` and
  import from scratch, so all submodules re-bind their ``pl`` globals to
  the fresh parent, then re-run the canary. Raises ImportError only if the
  fresh import is broken too (never observed).

All attribute probes go through ``vars(module)`` (the module ``__dict__``)
rather than ``getattr``/``hasattr``: on a poisoned partial module, getattr
falls into the recursive ``__getattr__`` and raises RecursionError, which
``hasattr`` does NOT swallow.
"""

from __future__ import annotations

import importlib
import sys

_VERIFIED = None  # the polars module object that passed the canary


def _canary(pl) -> None:
    """Exercise the crash path observed in poisoned workers."""
    if "Series" not in vars(pl) or "DataFrame" not in vars(pl):
        raise ImportError("polars module dict is missing Series/DataFrame")
    df = pl.DataFrame({"a": [1, 2]})
    # filter(expr) routes through polars._utils.various.is_bool_sequence,
    # which touches the (possibly stale) `pl.Series` global of the cached
    # submodule — exactly where poisoned workers die.
    if df.filter(pl.col("a") > 1).height != 1:
        raise ImportError("polars canary produced a wrong result")


def _purge() -> None:
    for k in [k for k in sys.modules if k == "polars" or k.startswith("polars.")]:
        del sys.modules[k]


def import_polars():
    """Return a verified-healthy polars module (heals poisoned workers)."""
    global _VERIFIED
    mod = sys.modules.get("polars")
    if _VERIFIED is not None and mod is _VERIFIED:
        return _VERIFIED
    try:
        pl = importlib.import_module("polars")
        _canary(pl)
    except BaseException:
        # Poisoned (or partially imported) state: rebuild everything so
        # submodule `pl` globals re-bind to the fresh parent.
        _purge()
        pl = importlib.import_module("polars")
        _canary(pl)  # raises if genuinely unrecoverable
    _VERIFIED = pl
    return pl
