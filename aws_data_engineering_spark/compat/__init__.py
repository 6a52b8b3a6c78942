"""Environment-compat shims.

``ensure_protobuf()`` makes ``google.protobuf`` importable on hosts where
the PyPI runtime is absent but the google-cloud-sdk ships a vendored
pure-Python runtime (this sandbox: pip/DNS dead, no wheel on disk, but
``/usr/lib/google-cloud-sdk/platform/google_appengine`` carries protobuf
6.32.0). pyspark 4.1's ``transformWithStateInPandas`` state-server gencode
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``) needs that runtime
in BOTH the driver and the Python workers — call this BEFORE creating the
SparkSession so the PYTHONPATH export reaches the JVM (local-mode workers
inherit the JVM's env, which snapshots the driver's env at gateway
launch).
"""

from __future__ import annotations

import os
import sys

_APPENGINE_GOOGLE = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"


def ensure_protobuf() -> bool:
    """True iff ``google.protobuf`` is importable after this call.

    Prefers a real installed runtime; falls back to the path shim in
    ``compat/pb_vendor`` (which redirects the ``google`` namespace to the
    cloud-sdk vendored runtime and relaxes the gencode/runtime check by
    exactly one minor version — pyspark ships 6.33 gencode, the vendored
    runtime is 6.32; the wire format is stable across that gap). Returns
    False when neither exists — callers keep their env-gate."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(_APPENGINE_GOOGLE):
        return False
    shim = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pb_vendor")
    if shim not in sys.path:
        sys.path.insert(0, shim)
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if shim not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([shim] + [p for p in parts if p])
    try:
        import google.protobuf  # noqa: F401

        return True
    except Exception:
        return False


def export_protobuf_to_workers(spark) -> bool:
    """Make the vendored protobuf reachable from Python workers of an
    ALREADY-RUNNING SparkSession (round 9, VERDICT r08 #8).

    The boundary this crosses: the driver harness builds its JVM before
    importing this package, so ``ensure_protobuf``'s ``os.environ``
    PYTHONPATH export never reaches the JVM (workers inherit the JVM's
    env snapshot). But PySpark ships ``sc.environment`` as per-function
    ``envVars`` with every Python UDF/worker launch, and the JVM's
    ``PythonWorkerFactory`` keys its worker pools on ``(pythonExec,
    envVars)`` — so mutating ``sc.environment["PYTHONPATH"]`` on the live
    session spawns FRESH worker daemons that see the shim. Probed round
    9: ``transformWithStateInPandas``'s state-server worker honors it
    (round 8's ``addPyFile`` probe failed because the state server boots
    before pyfile roots are installed). The value is written once and
    kept stable so repeated calls reuse the same worker pool."""
    if not ensure_protobuf():
        return False
    shim = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pb_vendor")
    if shim not in sys.path:
        # a REAL protobuf satisfied ensure_protobuf(): workers inherit it
        # from site-packages already, and prepending the shim would let
        # its regular `google` package SHADOW the site-packages namespace
        # package on every worker — only export when the shim is the
        # active source (code-review round 9)
        return True
    env = spark.sparkContext.environment
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if shim not in parts:
        env["PYTHONPATH"] = os.pathsep.join([shim] + parts)
    return True
