"""Idempotent sys.modules stubs for loading reference modules in tests.

Several test files load modules straight out of the read-only reference
checkout (/root/reference/src) without executing the package __init__ chain,
which would drag in neuroposelib/wandb/matplotlib.  Each file used to install
its own stubs guarded by ``if name not in sys.modules`` — so whichever file
pytest collected *first* won, and a later file needing a richer stub (e.g.
``neuroposelib.visualization`` for reference eval/eval.py:10) silently got the
poorer one and ERRORed at fixture setup (round-2 VERDICT W1 / ADVICE high).

This helper is the single place stubs are created.  It *upgrades* whatever is
already present: every attribute any consumer needs is set unconditionally,
so installation order no longer matters.  All stub attributes are inert
dummies — upgrading can never clobber real state.
"""

import pathlib
import sys
import types

REF = pathlib.Path("/root/reference/src")


def _ensure_module(name, path=None):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    if path is not None and not hasattr(mod, "__path__"):
        mod.__path__ = [str(path)]
    return mod


def install_ref_stubs():
    """Install/upgrade every stub the reference-parity tests need.

    Safe to call any number of times from any test file; later calls only
    add missing attributes on the shared stub modules.
    """
    npl = _ensure_module("neuroposelib")
    # reference data/dataset.py: `from neuroposelib import read`
    if not isinstance(getattr(npl, "read", None), types.SimpleNamespace):
        npl.read = types.SimpleNamespace()
    # reference eval/eval.py:10: `from neuroposelib import visualization`
    if not isinstance(
        getattr(npl, "visualization", None), types.SimpleNamespace
    ):
        npl.visualization = types.SimpleNamespace()
    if not hasattr(npl, "DataStruct"):
        npl.DataStruct = object

    wandb = _ensure_module("wandb")
    if not callable(getattr(wandb, "log", None)):
        wandb.log = lambda *a, **k: None

    # Namespace packages pointing into the read-only checkout so
    # `importlib.import_module("scrubvae.<sub>.<mod>")` resolves files
    # without running scrubvae/__init__.py.
    for pkg in (
        "scrubvae",
        "scrubvae.model",
        "scrubvae.train",
        "scrubvae.data",
        "scrubvae.eval",
        "scrubvae.plot",
    ):
        _ensure_module(pkg, REF / pkg.replace(".", "/"))

    # reference eval/metrics.py: `from scrubvae import get` (unused on the
    # tested paths)
    get = _ensure_module("scrubvae.get")
    sys.modules["scrubvae"].get = get
    return types.SimpleNamespace(neuroposelib=npl, wandb=wandb)
