"""Plan introspection utilities."""

from .inspect import plan_string

__all__ = ["plan_string"]
