"""Shared fixtures.

- ``ray_session``: ONE Ray session for the whole pytest run (local, 4 CPUs).
- ``ref``: imports reference LightRAG modules from /root/reference (read-only)
  with tiny stubs for its optional network deps, so kernel behavior can be
  compared side-by-side.  The reference is used as an ORACLE only; no code is
  taken from it.
"""

from __future__ import annotations

import sys
import types

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


def _install_reference_stubs() -> None:
    for name in ("json_repair", "httpx"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "json_repair":
                mod.repair_json = lambda s, **k: s
                mod.loads = lambda s, **k: {}
            sys.modules[name] = mod


@pytest.fixture(scope="session")
def ref():
    """Namespace of reference modules (oracle for parity tests)."""
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    _install_reference_stubs()
    import importlib

    ns = types.SimpleNamespace()
    ns.utils = importlib.import_module("lightrag.utils")
    ns.operate = importlib.import_module("lightrag.operate")
    ns.token_size = importlib.import_module("lightrag.chunker.token_size")
    return ns
