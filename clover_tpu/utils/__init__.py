"""Debug/introspection utilities (the analog of lib/simd_debug and the
reference's toString dumps)."""

from .debug import compare, format_qvec, format_blocks  # noqa: F401
