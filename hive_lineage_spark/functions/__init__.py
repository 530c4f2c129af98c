"""Shared column-expression helpers (all JVM-side built-ins — no UDFs)."""

from .time_fns import naive_epoch_seconds

__all__ = ["naive_epoch_seconds"]
