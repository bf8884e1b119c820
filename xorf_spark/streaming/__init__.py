from .membership import stream_dedup_filter, stream_membership  # noqa: F401
from .sketch_window import stream_windowed_hll  # noqa: F401
