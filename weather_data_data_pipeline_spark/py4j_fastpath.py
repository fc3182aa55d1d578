"""Driver-side py4j reflection cache — cuts DataFrame plan-construction
round trips without touching any Spark semantics.

Why this exists (r15 optimization round, measured): PySpark classic mode
resolves ``org.apache.spark.sql.functions`` through TWO py4j REFLECTION
round trips on EVERY ``F.*`` call — ``JVMView.__getattr__`` (class FQN
lookup) plus ``JavaClass.__getattr__`` (static-member lookup) — before
the one CALL round trip that does the work. At the measured ~0.3-0.5 ms
per round trip on this box, a query builder issuing a few hundred
``F.*`` calls pays 2× that in pure, cacheable reflection. Across the
119-query bench one full build sweep issued ~57k py4j commands; roughly
a third were these repeated lookups of the same static members.

All three cached lookups are immutable for the lifetime of a JVM view:

- a JVM class FQN always resolves to the same ``JavaClass``;
- a package segment always resolves to the same ``JavaPackage``;
- a static method always resolves to an equivalent ``JavaMember``
  (py4j already constructs instance members locally without a round
  trip; only the static path reflects per call).

Caches live on the JVMView / JavaClass / JavaPackage INSTANCES, so a
SparkContext restart (new gateway, new view objects) naturally drops
every cached handle — no cross-JVM staleness is possible. Static FIELD
reads are deliberately NOT cached (values can change); only
``JavaMember`` / ``JavaClass`` / ``JavaPackage`` results are.

Install is idempotent and process-local; call :func:`install` once
(session.get_spark / apply_runtime_conf do) before heavy plan building.

Import-order invariant (ADVICE r15): several pyspark modules early-bind
``from py4j.java_gateway import java_import`` at THEIR import time, so
patching ``py4j.java_gateway.java_import`` alone would miss call sites
bound before :func:`install` ran. install() therefore ALSO rebinds any
already-imported module's ``java_import`` attribute that still points at
the original function — after that, cache invalidation is correct
regardless of whether pyspark (or pyspark.streaming) was imported before
or after this package. Modules imported later pick up the patched
function from ``py4j.java_gateway`` directly.
"""

from __future__ import annotations

_INSTALLED = False


def install() -> None:
    global _INSTALLED
    if _INSTALLED:
        return

    import sys

    import py4j.java_gateway as _jg
    from py4j.java_gateway import JavaClass, JavaMember, JavaPackage, JVMView

    # java_import can change what a SHORT name resolves to on a view
    # (pyspark.ml calls it lazily on first use) — drop that view's cache
    # so the next lookup re-reflects. FQN lookups are unaffected but the
    # whole cache is tiny; correctness over cleverness.
    _orig_java_import = _jg.java_import

    def _java_import(jvm_view, import_str):
        jvm_view.__dict__.pop("_wg_attr_cache", None)
        return _orig_java_import(jvm_view, import_str)

    _jg.java_import = _java_import
    # Rebind EARLY-BOUND references (module docstring: pyspark's
    # java_gateway / streaming.context do `from py4j... import
    # java_import` at import time; if they loaded before install(),
    # their calls would bypass the invalidation hook above).
    for _mod in list(sys.modules.values()):
        if _mod is not None and getattr(_mod, "java_import", None) is _orig_java_import:
            try:
                _mod.java_import = _java_import
            except Exception:
                pass

    # -- JVMView: cache class/package resolution per view instance -----
    _view_getattr = JVMView.__getattr__

    def _cached_view_getattr(self, name):
        cache = self.__dict__.get("_wg_attr_cache")
        if cache is None:
            cache = self.__dict__["_wg_attr_cache"] = {}
        hit = cache.get(name)
        if hit is not None:
            return hit
        val = _view_getattr(self, name)
        # A JavaPackage is only cached when it looks like a real package
        # segment: py4j answers "JavaPackage" for ANY name it cannot
        # resolve to a loaded class, so an FQN whose class is not on the
        # classpath YET (e.g. before sc.addJar) must stay re-resolvable
        # (ADVICE r15). Losing the cache for an uppercase-leading segment
        # costs one reflection, never correctness.
        if isinstance(val, JavaClass) or (
            isinstance(val, JavaPackage)
            and not name.rsplit(".", 1)[-1][:1].isupper()
        ):
            cache[name] = val
        return val

    JVMView.__getattr__ = _cached_view_getattr

    # -- JavaPackage: cache sub-package / class resolution --------------
    _pkg_getattr = JavaPackage.__getattr__

    def _cached_pkg_getattr(self, name):
        cache = self.__dict__.get("_wg_attr_cache")
        if cache is None:
            cache = self.__dict__["_wg_attr_cache"] = {}
        hit = cache.get(name)
        if hit is not None:
            return hit
        val = _pkg_getattr(self, name)
        # same unloaded-class guard as the view cache: `pkg.SomeClass`
        # resolving to a JavaPackage means the class is not loaded (yet)
        # — do not freeze that answer
        if isinstance(val, JavaClass) or (
            isinstance(val, JavaPackage) and not name[:1].isupper()
        ):
            cache[name] = val
        return val

    JavaPackage.__getattr__ = _cached_pkg_getattr

    # -- JavaClass: cache static members (methods / nested classes) ----
    _cls_getattr = JavaClass.__getattr__

    def _cached_cls_getattr(self, name):
        cache = self.__dict__.get("_wg_member_cache")
        if cache is None:
            cache = self.__dict__["_wg_member_cache"] = {}
        hit = cache.get(name)
        if hit is not None:
            return hit
        val = _cls_getattr(self, name)
        # JavaMember (static method) and JavaClass (nested class) are
        # stable handles; static FIELD values are returned raw and must
        # not be cached.
        if isinstance(val, (JavaMember, JavaClass)):
            cache[name] = val
        return val

    JavaClass.__getattr__ = _cached_cls_getattr

    # Only now that every patch is applied (ADVICE r15): a mid-install
    # failure above leaves the flag False so a retry re-runs the whole
    # install instead of no-opping on a half-patched process.
    _INSTALLED = True
