"""lightrag_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the data-processing capabilities of
HKUDS/LightRAG (reference at /root/reference) expressed as streaming
``ray.data.Dataset`` pipelines: web pages → sanitized docs → token-window
chunks → entity/relation mention tables → canonicalized node/edge tables.

This package never calls ``ray.init()`` — sessions are owned by the caller
(bench.py, CLI, test fixtures).
"""

from lightrag_ray import _compat as _compat

_compat.install()

__version__ = "0.1.0"
