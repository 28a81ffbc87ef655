from . import concat, joins, labels, split

__all__ = ["concat", "joins", "labels", "split"]
