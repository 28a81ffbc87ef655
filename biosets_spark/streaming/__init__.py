from . import ingest, stateful

__all__ = ["ingest", "stateful"]
