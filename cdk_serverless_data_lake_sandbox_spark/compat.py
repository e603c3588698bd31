"""Environment shims for optional dependencies.

The only one today: ``google.protobuf``, which PySpark's
``transformWithStateInPandas`` Python worker imports (via the
generated ``StateMessage_pb2``). Containers without protobuf would
env-gate that operator, so the repo vendors a clean-room minimal
proto3 runtime (``vendor/google/protobuf`` — wire format per the
public protobuf encoding spec). ``ensure_protobuf()`` makes it
importable in THIS process and in the Python workers the JVM spawns
(workers inherit the JVM's environment, so ``PYTHONPATH`` must be
set before the gateway launches — call this before the first
``SparkSession`` is built).

If a real protobuf install is present it always wins: the vendor
path is only added when the import fails.
"""

from __future__ import annotations

import os
import sys

_VENDOR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor")


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable; returns True if the
    vendored mini-runtime was activated (False: real install)."""
    try:
        import google.protobuf  # noqa: F401

        return False
    except ImportError:
        pass
    if _VENDOR not in sys.path:
        sys.path.insert(0, _VENDOR)
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if _VENDOR not in parts:
        os.environ["PYTHONPATH"] = (
            _VENDOR + (os.pathsep + existing if existing else "")
        )
    import google.protobuf  # noqa: F401

    return True
