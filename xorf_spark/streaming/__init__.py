from .filter_refresh import (  # noqa: F401
    compact_key_log,
    latest_version,
    load_latest_filter_table,
    pointer_versions,
    stream_filter_refresh,
)
from .membership import stream_dedup_filter, stream_membership  # noqa: F401
from .sketch_window import (  # noqa: F401
    stream_windowed_hll,
    stream_windowed_sketch,
)
from .delivery import (  # noqa: F401
    stream_training_shards,
    verify_streamed_delivery,
)
from .stateful_dedup import stream_exact_dedup  # noqa: F401
