"""Native host runtime: C++ batch assembly for the data path."""

from confignet_tpu.runtime.native import gather_images, gather_rows, native_available

__all__ = ["gather_images", "gather_rows", "native_available"]
