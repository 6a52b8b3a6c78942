"""Path shim for the ``google`` namespace (see ``compat.ensure_protobuf``).

Active ONLY when prepended to sys.path on hosts without a real protobuf
install: extends the package __path__ to the pure-Python protobuf runtime
vendored by the host's google-cloud-sdk, then relaxes the protobuf
gencode/runtime version check by exactly one minor version (pyspark 4.1's
state-server gencode is 6.33.0, the vendored runtime 6.32.0; protobuf's
wire format is stable across that gap). Any other mismatch still raises.
"""

import os as _os

_APPENGINE_GOOGLE = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"

if _os.path.isdir(_APPENGINE_GOOGLE):
    __path__.append(_APPENGINE_GOOGLE)

    from google.protobuf import runtime_version as _rv

    _orig_validate = _rv.ValidateProtobufRuntimeVersion

    def _tolerant_validate(domain, major, minor, patch, suffix, location):
        try:
            _orig_validate(domain, major, minor, patch, suffix, location)
        except _rv.VersionError:
            if (major, minor) != (_rv.MAJOR, _rv.MINOR + 1):
                raise

    _rv.ValidateProtobufRuntimeVersion = _tolerant_validate
