from . import discovery, readers, sink

__all__ = ["discovery", "readers", "sink"]
