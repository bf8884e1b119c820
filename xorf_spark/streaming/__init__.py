from .membership import stream_dedup_filter, stream_membership  # noqa: F401
from .sketch_window import (  # noqa: F401
    stream_windowed_hll,
    stream_windowed_sketch,
)
