from . import audit, fingerprint

__all__ = ["audit", "fingerprint"]
