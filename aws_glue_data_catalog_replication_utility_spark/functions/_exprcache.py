"""Context-aware lifetime for cached Column expressions.

Several hot paths memoize UNRESOLVED Column expressions whose
construction costs thousands of Py4J round-trips (the IVF/PQ codebook
literals in `functions/similarity.py`, the canonical-form rewrites in
`operators/merge.py`, the Hive type validator in
`functions/hive_types.py`). An unresolved Column is plan-independent,
but it is NOT process-independent: it wraps a JVM object owned by the
Py4J gateway of the SparkContext that was active when it was built.
After a `spark.stop()` / new-context cycle the cached expression points
at a dead gateway and every use fails with an opaque Py4J error
(ADVICE r05).

Every expression cache registers here; `check_context()` — called on
each cache consult — clears all of them the moment the active
SparkContext is no longer the one the caches were built against. The
identity check is a weakref, so a GC'd old context (whose `id()` could
be reused by the new one) still reads as a change.
"""

from __future__ import annotations

import weakref
from typing import Callable

_caches: list[dict | Callable[[], None]] = []
_ctx_ref: weakref.ref | None = None


def register_cache(cache: dict | Callable[[], None]):
    """Register a dict cache (cleared in place) or a zero-arg clear
    callable (e.g. an lru_cache's `.cache_clear`)."""
    _caches.append(cache)
    return cache


def check_context() -> None:
    """Clear every registered expression cache when the active
    SparkContext has changed since the caches were last (re)built."""
    global _ctx_ref
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    cur = _ctx_ref() if _ctx_ref is not None else None
    if cur is sc:
        return
    for c in _caches:
        if isinstance(c, dict):
            c.clear()
        else:
            c()
    _ctx_ref = weakref.ref(sc) if sc is not None else None
