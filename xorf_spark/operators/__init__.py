from . import bucketing, dedup, multimodal, similarity, sink, text  # noqa: F401
