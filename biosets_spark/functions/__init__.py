from . import vectors

__all__ = ["vectors"]
