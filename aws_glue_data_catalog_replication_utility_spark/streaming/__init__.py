"""Streaming leg: event-plane ingest (readStream + foreachBatch MERGE)
and event-time windowed rollups. See ingest.py / rollup.py."""

from .ingest import (  # noqa: F401
    commit_partitions,
    escape_dir_name,
    prune_versions,
    latest_version,
    read_audit,
    read_partitions,
    read_state,
    start_event_stream,
    write_small_planes,
)
from .dedupe import dedupe_events  # noqa: F401
from .embed import start_embed_stream  # noqa: F401
from .neardedup import (  # noqa: F401
    compact_dedup_state,
    read_dedup_decisions,
    start_near_dedup_stream,
)
from .media import read_media_features, start_media_stream  # noqa: F401
from .quality import (  # noqa: F401
    read_gate_outputs,
    start_quality_gate_stream,
)
from .score import start_score_stream  # noqa: F401
from .semdedup import (  # noqa: F401
    read_semantic_decisions,
    start_semantic_dedup_stream,
)
from .close import (  # noqa: F401
    close_near_dedup_state,
    close_semantic_dedup_state,
)
from .enrich import interval_join  # noqa: F401
from .rollup import windowed_rollup  # noqa: F401
from .sessions import session_rollup  # noqa: F401
from .stateful import user_event_progress  # noqa: F401
