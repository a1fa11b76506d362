from . import textfns, vectors

__all__ = ["textfns", "vectors"]
