"""Composite-state streaming operator on ``transformWithStateInPandas``
(Spark 4's typed-state successor to ``applyInPandasWithState``).

Where :mod:`.stateful`'s running_totals carries one flat tuple per key, this
operator keeps a per-user **profile** out of two independent state variables:

- ``totals``   (ValueState)  — event count + value sum,
- ``by_type``  (MapState)    — per-event-type counters, updated point-wise
  (RocksDB mutates only the touched map entries — the whole point of the new
  API: no read-modify-write of a monolithic state blob as keys widen).

Each micro-batch emits the refreshed profile for every touched user:
``(user_id, n_events, value_sum, n_types, top_type)`` with top_type resolved
deterministically (max count, then lexicographically smallest type).

Requires the RocksDB state store (Spark bundles it);
:func:`user_activity_profile` pins the provider on the session.

**Environment gate:** the TWS state-server protocol needs ``protobuf``, which
is not pip-installed in this container (no installs allowed). r6: the
container DOES carry a vendored pure-python protobuf 6.32 inside the system
google-cloud-sdk tree; :func:`_ensure_protobuf` puts it on ``sys.path`` and
sets protobuf's own documented escape hatch
(``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) for the one-minor-version
gencode/runtime skew (Spark's ``StateMessage_pb2`` is gencoded at 6.33; the
skew is within protobuf's cross-version wire guarantee, and the real TWS
run is oracle-verified end-to-end in ``tests/test_streaming.py``). The shim
runs at module import, which in a Python *worker* happens when the pickled
processor is unpickled — before the API client's lazy
``import StateMessage_pb2`` call sites — so it works even when the driver
harness built the JVM without these env vars. When no vendored protobuf
exists either, :func:`user_activity_profile` transparently falls back to an
``applyInPandasWithState`` implementation with the *identical* output
contract — the map state is carried as two parallel arrays inside the one
state blob, which is exactly the monolithic read-modify-write the typed-state
API exists to avoid. Same operator, same oracle; the backend upgrades itself
where the dependency exists.

Scale posture: state is partitioned by user_id across
``spark.sql.streaming.stateStore`` instances; per-key state is O(distinct
event types) and the map updates are point writes, so a 1000-executor
cluster shards billions of users with no per-batch state rewrite.
"""

from __future__ import annotations

import os
import sys
from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = (
    "user_id long, n_events long, value_sum double, n_types long, top_type string"
)


class UserProfileProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n long, vsum double")
        self._by_type = handle.getMapState("by_type", "etype string", "cnt long")

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: TimerValues
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, vsum = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            vsum += float(pdf["value"].sum())
            for etype, cnt in pdf.groupby("event_type").size().items():
                prev = (
                    self._by_type.getValue((etype,))[0]
                    if self._by_type.containsKey((etype,))
                    else 0
                )
                self._by_type.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n, vsum))

        counts = [(k[0], v[0]) for k, v in self._by_type.iterator()]
        top_type = min(counts, key=lambda kv: (-kv[1], kv[0]))[0] if counts else None
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [vsum],
                "n_types": [len(counts)],
                "top_type": [top_type],
            }
        )

    def close(self) -> None:
        pass


# System-vendored pure-python protobuf runtimes to try, in order, when
# `import google.protobuf` fails outright. The google-cloud-sdk ships one for
# its own tooling; it is plain BSD-licensed protobuf (6.32 here), just not
# pip-visible. Appended (not prepended) to sys.path so a real install always
# wins.
_PROTOBUF_VENDOR_PATHS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


# set when the runtime came from a vendor tree (None = real pip install);
# user_activity_profile propagates it into the Python workers' env.
_PROTOBUF_VENDOR_USED: str | None = None


def _probe_protobuf() -> bool:
    """True iff a REAL protobuf runtime is importable. A stray PEP-420
    namespace ``google`` dir makes bare ``import google.protobuf`` succeed
    vacuously (empty package, no ``__file__``) — exactly the failure observed
    in the TWS driver worker — so probe for the ``descriptor`` module."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _version_skew_ok(max_minor_gap: int = 1) -> bool:
    """True iff the Spark gencode's protobuf version and the loaded runtime
    are the same MAJOR and within ``max_minor_gap`` minors of each other.

    The vendored-runtime path below disables protobuf's own version check
    (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) for a one-minor
    gencode(6.33) > runtime(6.32) skew that is wire-format-safe. That
    escape hatch would also silently mask a REAL incompatibility if a
    future Spark bump jumps the gencode (r6 verdict item 6) — so the skew
    is measured explicitly and the hatch refuses to ride beyond ±1 minor.
    Gencode version read from the pb2 module's stamped header comment
    (``# Protobuf Python Version: X.Y.Z`` — emitted by protoc for every
    generated file); unparsable versions fail closed."""
    import re

    try:
        import inspect

        import google.protobuf as gp
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

        m = re.search(
            r"#\s*Protobuf Python Version:\s*(\d+)\.(\d+)\.", inspect.getsource(sm)
        )
        r = re.match(r"(\d+)\.(\d+)\.", gp.__version__)
        if not m or not r:
            return False
        gmaj, gmin = int(m.group(1)), int(m.group(2))
        rmaj, rmin = int(r.group(1)), int(r.group(2))
        return gmaj == rmaj and abs(gmin - rmin) <= max_minor_gap
    except Exception:
        return False


def _ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, vendoring from a system SDK tree
    if needed (driver side; worker propagation is via the UDF env)."""
    global _PROTOBUF_VENDOR_USED
    if _probe_protobuf():
        return True
    # remember whether WE set the hatch — computed ONCE, before the vendor
    # loop (r8 ADVICE): per-iteration recomputation made a later iteration
    # see the var vendor #1 set, classify it as user-exported, skip the pop,
    # and leave the hatch disabled process-wide despite falling back. A
    # user-exported value must still survive every rejection path.
    _hatch_was_ours = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK" not in os.environ
    for vendor in _PROTOBUF_VENDOR_PATHS:
        if not os.path.isdir(os.path.join(vendor, "google", "protobuf")):
            continue
        # protobuf's own documented escape hatch for gencode(6.33) >
        # runtime(6.32) minor-version skew — within the wire-format
        # cross-version guarantee; the real TWS path is oracle-verified
        # end-to-end under this setting (tests/test_streaming.py).
        # _version_skew_ok below bounds how far the hatch may stretch.
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        if vendor not in sys.path:
            sys.path.append(vendor)
        # a half-imported namespace 'google' caches an empty __path__ —
        # drop it so the vendor portion is (re)discovered
        for mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
            del sys.modules[mod]
        try:
            if _probe_protobuf():
                import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

                if not _version_skew_ok():
                    # loud by design, but NOT a module-import crash (this
                    # runs at import): un-vendor, drop the escape hatch,
                    # warn, and let tws_available() report False so the
                    # applyInPandasWithState fallback takes over
                    import warnings

                    sys.path.remove(vendor)
                    if _hatch_was_ours:
                        os.environ.pop(
                            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", None
                        )
                    # the vendored tree's modules are already cached; leave
                    # them importable for OTHER importers and sys.modules
                    # would hand out the rejected runtime — purge them so
                    # the next import re-resolves against the cleaned path.
                    # Purge ONLY modules that resolve under the vendored
                    # tree plus the gencode leaf (r8 ADVICE): a blanket
                    # google.* sweep would also evict unrelated namespace
                    # packages (google.auth, google.cloud, ...) whose
                    # holders would then diverge from fresh re-imports.
                    vroot = os.path.abspath(vendor) + os.sep
                    for name in [
                        m
                        for m in list(sys.modules)
                        if m == "google"
                        or m.startswith("google.")
                        or m.endswith("StateMessage_pb2")
                    ]:
                        mod = sys.modules.get(name)
                        locs = [getattr(mod, "__file__", None) or ""] + list(
                            getattr(mod, "__path__", None) or []
                        )
                        if name.endswith("StateMessage_pb2") or any(
                            loc and os.path.abspath(loc).startswith(vroot)
                            for loc in locs
                        ):
                            del sys.modules[name]
                    warnings.warn(
                        "vendored protobuf runtime is more than one minor "
                        "version from Spark's gencode — the version-check "
                        "escape hatch is only safe for +/-1 minor; update "
                        f"the vendored runtime at {vendor} or pip-install a "
                        "matching protobuf. Falling back to the non-TWS "
                        "stateful path.",
                        stacklevel=2,
                    )
                    return False
                _PROTOBUF_VENDOR_USED = vendor
                return True
        except Exception:
            return False
    return False


_PROTOBUF_OK = _ensure_protobuf()


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    protocol; resolved at import by :func:`_ensure_protobuf` (pip install
    or system-vendored runtime)."""
    return _PROTOBUF_OK


def _ship_tws_worker_env(spark) -> None:
    """Propagate the env the TWS *driver worker* needs into the workers.

    The TWS driver worker is spawned by the JVM (StreamingPythonRunner) with
    the env vars captured in ``sc.environment`` at UDF-wrap time — NOT the
    driver's live ``os.environ`` (the JVM's env was frozen at launch, which
    the driver harness controls, not us) and NOT the addPyFile includes that
    regular PythonRunner workers receive (verified r6: a vanilla session
    launched from a neutral cwd dies in ``read_command`` with
    ``ModuleNotFoundError: mta_rtf_dbt_spark`` — pytest runs masked this
    because the worker inherits the JVM cwd, which happened to be the repo).
    Mutating ``sc.environment`` before building the TWS plan is the
    runtime-safe channel; PYTHONPATH gets (a) this package's parent dir so
    the pickled-by-reference processor class resolves, and (b) the vendored
    protobuf tree when no real install exists, with the version-check escape
    hatch riding along."""
    try:
        env = spark.sparkContext.environment
    except Exception:
        return  # Spark Connect: no local sparkContext; env must come from deploy
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    extra = [pkg_parent]
    if _PROTOBUF_VENDOR_USED is not None:
        env.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        extra.append(_PROTOBUF_VENDOR_USED)
    pp = env.get("PYTHONPATH", "")
    have = pp.split(os.pathsep) if pp else []
    for p in extra:
        if p not in have:
            have.append(p)
    env["PYTHONPATH"] = os.pathsep.join(have)


def _fallback_profile(df: DataFrame) -> DataFrame:
    """Same profile via applyInPandasWithState: the per-type map rides inside
    the single state tuple as parallel arrays (types, counts) — functionally
    identical, but every batch rewrites the whole blob."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, vsum, types, counts = state.get
            by_type = dict(zip(list(types), list(counts)))
        else:
            n, vsum, by_type = 0, 0.0, {}
        for pdf in pdfs:
            n += len(pdf)
            vsum += float(pdf["value"].sum())
            for etype, cnt in pdf.groupby("event_type").size().items():
                by_type[etype] = by_type.get(etype, 0) + int(cnt)
        state.update((n, vsum, list(by_type.keys()), list(by_type.values())))
        top_type = (
            min(by_type.items(), key=lambda kv: (-kv[1], kv[0]))[0] if by_type else None
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [vsum],
                "n_types": [len(by_type)],
                "top_type": [top_type],
            }
        )

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="n long, vsum double, types array<string>, counts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_activity_profile(df: DataFrame) -> DataFrame:
    """Per-user composite profile over a stream of events. ``df`` must have
    ``user_id``, ``event_type``, ``value`` columns. Uses typed TWS state when
    the environment supports it, else the flat-state fallback."""
    if not tws_available():
        return _fallback_profile(df)
    spark = df.sparkSession
    _ship_tws_worker_env(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return df.groupBy("user_id").transformWithStateInPandas(
        UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
