from . import bucketing, dedup, multimodal, similarity, text  # noqa: F401
