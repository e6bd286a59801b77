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
    if "langchain_text_splitters" not in sys.modules:
        # The reference's recursive_character module only reads the parsed
        # config attributes off the splitter object (it re-implements the
        # split itself for span tracking), so a config-holding stand-in is
        # enough to unlock the reference "R"/"P" chunkers as oracles.
        mod = types.ModuleType("langchain_text_splitters")

        class RecursiveCharacterTextSplitter:  # noqa: N801 - mirrors LangChain
            def __init__(
                self,
                chunk_size=4000,
                chunk_overlap=200,
                length_function=len,
                strip_whitespace=True,
                separators=None,
                keep_separator=True,
                is_separator_regex=False,
                **_,
            ):
                if chunk_overlap > chunk_size:
                    raise ValueError(
                        f"Got a larger chunk overlap ({chunk_overlap}) than "
                        f"chunk size ({chunk_size}), should be smaller."
                    )
                self._chunk_size = chunk_size
                self._chunk_overlap = chunk_overlap
                self._length_function = length_function
                self._strip_whitespace = strip_whitespace
                self._separators = separators or ["\n\n", "\n", " ", ""]
                self._keep_separator = keep_separator
                self._is_separator_regex = is_separator_regex

        mod.RecursiveCharacterTextSplitter = RecursiveCharacterTextSplitter
        sys.modules["langchain_text_splitters"] = mod


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
