from . import fingerprint

__all__ = ["fingerprint"]
