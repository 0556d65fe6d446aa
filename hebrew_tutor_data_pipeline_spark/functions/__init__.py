from . import hebrew, similarity, text  # noqa: F401

__all__ = ["hebrew", "similarity", "text"]
