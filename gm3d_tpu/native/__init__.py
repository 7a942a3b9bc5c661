"""Native (C++) runtime components: threaded prefetching IO."""

from gm3d_tpu.native.native_loader import (
    NativeCloudLoader,
    NativeLabelledCloudLoader,
    native_available,
)

__all__ = ["NativeCloudLoader", "NativeLabelledCloudLoader", "native_available"]
