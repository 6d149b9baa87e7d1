"""Native (C++) runtime components, loaded via ctypes."""

from pecanpy_tpu.native.loader import (  # noqa: F401
    native_available,
    parse_edgelist_native,
)
