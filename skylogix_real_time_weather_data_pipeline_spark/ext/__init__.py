from . import dedup, multimodal, similarity, text, url  # noqa: F401
