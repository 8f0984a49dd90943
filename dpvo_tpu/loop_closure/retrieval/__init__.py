from .dbow import BinaryBoW
from .retrieval_dbow import RetrievalDBOW
from .image_cache import ImageCache

__all__ = ["BinaryBoW", "RetrievalDBOW", "ImageCache"]
