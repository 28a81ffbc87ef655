from . import lattice, roles

__all__ = ["lattice", "roles"]
