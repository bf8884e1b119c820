from .membership import stream_dedup_filter, stream_membership  # noqa: F401
