"""Reusable column-expression helpers (JVM-side first; UDFs last resort)."""

from .numeric import dsum, davg  # noqa: F401
