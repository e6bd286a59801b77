"""Environment compatibility shims.

``ray.data``'s path resolution probes ``fsspec.implementations.http`` on every
``read_parquet``/``write_parquet`` call.  With aiohttp absent that import
FAILS — and a failed import is retried on every call, so two driver threads
resolving paths concurrently can race on the half-initialized module and leak
a plain ``ImportError`` through Ray's ``ModuleNotFoundError`` guard
(ray/data/datasource/path_util.py:147-153).

Seeding inert placeholder modules for the optional HTTP deps lets
``fsspec.implementations.http`` import once, successfully, and stay cached —
removing the race.  We never use HTTP filesystems; local/S3 paths are
untouched.
"""

from __future__ import annotations

import sys
import types


def install() -> None:
    for name in ("aiohttp", "yarl"):
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = types.ModuleType(name)
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        pass
