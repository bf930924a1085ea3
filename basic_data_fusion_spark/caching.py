"""Operator-persist lifecycle registry.

Several operators persist an intermediate relation that BOTH sides of a
downstream self-join consume (LSH banding, shingle-set verification,
IVF assignment, …).  The operators return lazy DataFrames, so they
cannot know when their consumer is done and cannot unpersist themselves.

The contract (documented here, asserted by tests/test_pipeline_ops.py):

- Every operator-internal ``persist()`` goes through :func:`cache_pinned`,
  which registers the DataFrame.  The registry holds STRONG references
  deliberately: a persisted relation's cache entry lives JVM-side, so a
  dead Python wrapper would not free anything — it would only make the
  entry unreachable from Python.  Registry entries are driver-side plan
  handles (bytes each), not data.
- Persisted intermediates default to ``MEMORY_AND_DISK`` and are safe to
  evict at any time — every pipeline is deterministic, so recomputation
  after eviction changes nothing but latency.  A long session therefore
  degrades gracefully (LRU eviction) rather than failing.
- A batch driver that runs many operator invocations (the bench harness,
  a curation service) should call :func:`release_cached` between logical
  jobs — it unpersists every registered relation in one pass and empties
  the registry.  ``spark.catalog.clearCache()`` remains the blunt
  per-session JVM-side reset (it does NOT empty this registry; a later
  ``release_cached`` on an already-cleared relation is a harmless no-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def cache_pinned(df: DataFrame) -> DataFrame:
    """``df.persist()`` + lifecycle registration (see module docstring)."""
    out = df.persist()
    _PINNED.append(out)
    return out


def pinned_count() -> int:
    """Number of registered persisted relations not yet released."""
    return len(_PINNED)


def release_cached() -> int:
    """Unpersist every operator-persisted relation registered since the
    last release.

    Returns the number of relations released.  Blocking is unnecessary:
    unpersist marks the JVM cache entries for removal and later jobs
    simply recompute.
    """
    released = 0
    for df in _PINNED:
        try:
            df.unpersist()
            released += 1
        except Exception:  # session already stopped — nothing to free
            pass
    _PINNED.clear()
    return released
