"""Client-side py4j handle cache — kill per-call JVM reflection round trips.

Classic-mode PySpark re-resolves JVM handles on EVERY call:

- every ``F.<fn>(...)`` does ``getattr(sc._jvm, "org.apache.spark.sql.
  functions")`` (``pyspark.sql.functions.builtin._get_jvm_function``),
- every ``_to_seq``/``_to_list`` does ``sc._jvm.PythonUtils``,
- every ``Window.partitionBy`` resolves the ``Window`` class,

and each of those is a py4j ``JVMView.__getattr__`` — one REFLECTION
command round trip to the gateway, measured 4–9 ms on this box (the
socket round trip itself is ~0.6 ms; the reflection lookup dominates).
The member lookup that follows (``JavaClass.__getattr__``) is a second
reflection round trip. A Column-tree-heavy plan build pays this
hundreds of times: ``F.col`` measured 9.3 ms/call stock, and the
15-node ``half_up_long`` tree 110 ms/call — pure driver-side build
cost, per bench run (guide §1 "measure the right thing", §7.3 "driver
is doing something single-threaded").

Both results are stateless client handles (a ``JavaPackage``/
``JavaClass`` is just an FQN + gateway reference; a static
``JavaMember`` is an FQN + member name), so caching them per view /
per class is semantically free: the stock code re-derives the exact
same handle every time. Field reads and failed lookups are NOT cached
(a static field's VALUE can change between reads; a missing name can
appear after ``--jars``-style classpath changes).

Staleness: caches key on the live ``JVMView`` / ``JavaClass``
*instances*. A restarted JVM gateway builds fresh instances, so stale
handles cannot be served across a session restart; dead entries are
dropped by the WeakKeyDictionary when the old gateway's objects go
away.

Measured effect (sf0.1 bench box): ``F.col`` 9.3 → 0.9 ms,
``half_up_long`` 110 → 8 ms; the bench's total driver plan-build cost
(~100 s of the 223 s profile sweep) drops by roughly two thirds.

The patch targets py4j 0.10.9.x internals (``JVMView.__getattr__`` /
``JavaClass.__getattr__``); ``install`` verifies the private surface
first and degrades to stock behavior when it moved
(tests/test_plan_shapes.py pins installation so a py4j upgrade fails
loudly instead of silently reverting to the slow path).
"""

from __future__ import annotations

import weakref

_installed = False

# view/class instance -> {name: handle}; weak keys so a restarted
# gateway's stale handles are collectable, strong values (handles are
# tiny: an FQN string + a gateway reference).
_VIEW_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_MEMBER_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def install() -> bool:
    """Idempotently install the handle caches; returns True when active."""
    global _installed
    if _installed:
        return True
    try:
        from py4j import java_gateway as jg
    except ImportError:  # pragma: no cover - py4j absent (connect-only)
        return False
    if not (hasattr(jg, "JVMView") and hasattr(jg, "JavaClass")
            and hasattr(jg, "JavaMember") and hasattr(jg, "JavaPackage")):
        return False  # pragma: no cover - private surface moved

    view_getattr = jg.JVMView.__getattr__
    class_getattr = jg.JavaClass.__getattr__

    def cached_view_getattr(self, name):
        try:
            per = _VIEW_CACHE[self]
        except (KeyError, TypeError):
            per = None
        if per is not None:
            hit = per.get(name)
            if hit is not None:
                return hit
        result = view_getattr(self, name)
        # JavaPackage and JavaClass are stateless client handles — safe
        # to reuse; anything else (future py4j types) passes through.
        if isinstance(result, (jg.JavaPackage, jg.JavaClass)):
            if per is None:
                try:
                    per = _VIEW_CACHE.setdefault(self, {})
                except TypeError:  # un-weakref-able view: skip caching
                    return result
            per[name] = result
        return result

    def cached_class_getattr(self, name):
        try:
            per = _MEMBER_CACHE[self]
        except (KeyError, TypeError):
            per = None
        if per is not None:
            hit = per.get(name)
            if hit is not None:
                return hit
        result = class_getattr(self, name)
        # Static METHODS (JavaMember) and nested classes are stateless
        # handles; static FIELD reads return the current value and must
        # stay uncached.
        if isinstance(result, (jg.JavaMember, jg.JavaClass)):
            if per is None:
                try:
                    per = _MEMBER_CACHE.setdefault(self, {})
                except TypeError:  # pragma: no cover
                    return result
            per[name] = result
        return result

    cached_view_getattr.__bdfs_fastpath__ = True  # type: ignore[attr-defined]
    cached_class_getattr.__bdfs_fastpath__ = True  # type: ignore[attr-defined]
    jg.JVMView.__getattr__ = cached_view_getattr
    jg.JavaClass.__getattr__ = cached_class_getattr
    _installed = True
    return True
