from . import dedup, quality, relational, similarity

__all__ = ["relational", "quality", "dedup", "similarity"]
