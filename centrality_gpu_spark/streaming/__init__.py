"""Streaming surface — intentionally minimal.

The reference is strictly batch (SURVEY.md §2.8: one graph in, one BC
vector out; no watermarks/windows/stateful ops), and the north rule's
"iterative supersteps with checkpoint/resume" maps to the driver-side
iteration loops in ``operators/`` with durable epochs
(``plans/checkpoint.py``), not to Structured Streaming.

What a streaming extension would look like (documented for parity
completeness, not required): ``spark.readStream`` over an append-only
transcripts table → incremental edge builder (stateless projection +
``dropDuplicates`` within watermark) → periodic trigger that merges new
edges into the blocked-CSR store and warm-starts PageRank from the
last checkpointed rank vector (delta-iteration; convergence is fast
from a warm start). All engine pieces needed for that (idempotent edge
canonicalization, resumable iteration state) already exist in batch
form.
"""
