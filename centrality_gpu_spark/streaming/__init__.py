"""Structured Streaming surface.

``streaming.transcripts`` implements the incremental transcript
pipeline: append-only parquet stream → watermarked turn dedup →
per-micro-batch invocation deltas (``foreachBatch``) → compacted edge
table → warm-started PageRank snapshots (``pagerank(init_ranks=...)``,
the delta-iteration pattern). Windowed per-tool counts demonstrate the
watermark + tumbling-window append-mode idiom.

``streaming.sessions`` adds the stateful gap-session operator:
``streaming_session_stats`` (native ``session_window`` merging state,
watermark-bounded) provably equals the batch ``session_stats`` on the
same rows (tests/test_streaming.py). ``streaming.progress`` covers the
third stateful idiom — ``applyInPandasWithState`` per-key state in
Spark's state store (``streaming_conversation_progress``: assembled
turn prefixes under out-of-order delivery, idle-timeout finalization,
≡ its batch twin in any delivery order). ``streaming.transitions``
rides the same state-store idiom with DELTA (retraction) emission:
``streaming_tool_transitions`` emits ±1 handoff-pair deltas as tool
turns arrive in any order — an out-of-order insert retracts the pair
it splits — so a downstream ``SUM(delta)`` converges to exactly the
batch ``tool_transitions`` counts (differential-dataflow style,
tested on permuted + replayed delivery).

The reference engine is strictly batch (SURVEY.md §2.8); this module is
the Spark-native extension its transcript source implies at
10¹²-turn scale, where ingestion never finishes. The batch operators
are unchanged — streaming only maintains their *input* incrementally,
and the streamed edge table provably converges to the batch
``sources.transcripts.tool_invocations`` result (delta-count sum ≡
count over distinct turns; tested in tests/test_streaming.py).
"""

from centrality_gpu_spark.streaming.progress import (  # noqa: F401
    conversation_progress,
    streaming_conversation_progress,
)
from centrality_gpu_spark.streaming.sessions import (  # noqa: F401
    streaming_session_stats,
)
from centrality_gpu_spark.streaming.transitions import (  # noqa: F401
    streaming_tool_transitions,
)
from centrality_gpu_spark.streaming.transcripts import (  # noqa: F401
    compact_edge_deltas,
    dedup_turns,
    invocation_deltas,
    read_transcript_stream,
    run_edge_delta_stream,
    snapshot_graph,
    snapshot_pagerank,
    windowed_tool_counts,
)
