"""Native (C++) host-runtime components, loaded via ctypes.

The shared library is compiled on demand with g++ (cached next to the
source); every entry point has a pure-Python fallback so the package works
without a toolchain.
"""
from .build import get_lib, native_available

__all__ = ["get_lib", "native_available"]
