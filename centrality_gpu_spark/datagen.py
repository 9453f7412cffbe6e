"""Deterministic synthetic transcript generator (FIXTURES.md §1/§6).

Schema (BASELINE.json input_hint): ``transcripts(conv_id:string,
turn_idx:int32, role:string, text:string, tool:string, ts:timestamp)``.

Everything is a pure function of (seed, conv_id): each conversation's
RNG is ``np.random.default_rng([seed, conv_index])``, so output is
identical regardless of partitioning or cluster size — the property
that makes the per-turn text-equality invariant testable and the bench
reproducible. Generation runs distributed (``spark.range`` over
conversations → ``mapInPandas``), so the bench tier (~200k convs) never
bottlenecks on the driver.

Tool popularity is Zipf-distributed — the power-law hub fan-in the
north rule's skew handling is tested against.

``embed_samples=True`` appends conversations encoding the four
reference sample graphs: sample vertex u → conversation ``g{name}_v{u}``,
sample edge (u,v) → tool ``g{name}_e{u}_{v}`` invoked by both endpoint
conversations. The co-invocation projection (sources/transcripts.py)
then reproduces each sample graph *exactly*, so the reference BC
goldens carry over to the full transcripts→edges→BC pipeline.
"""

from __future__ import annotations

import itertools
from datetime import datetime, timezone

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

BASE_EPOCH = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp())
ROLES = ("user", "assistant", "tool")
_FILLER = (
    "plan spark shuffle join graph edge vertex rank batch frontier tool "
    "agent turn reply trace span token stream block salt skew check point"
).split()

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)

SAMPLE_DIR = "/root/reference/Codes/sample_input"
SAMPLE_NAMES = ("test1", "test2", "test3", "test4")


def _read_sample(name: str) -> list[tuple[int, int]]:
    with open(f"{SAMPLE_DIR}/{name}.txt") as f:
        lines = f.read().strip().splitlines()
    return [(int(u), int(v)) for u, v, _w in (ln.split() for ln in lines[1:])]


def _conv_rows(seed: int, conv_index: int, n_tools: int,
               min_turns: int, max_turns: int) -> list[tuple]:
    """All turns of one synthetic conversation (pure function of seed+index)."""
    rng = np.random.default_rng([seed, conv_index])
    conv_id = f"conv_{conv_index:06d}"
    n_turns = int(rng.integers(min_turns, max_turns + 1))
    # Zipf tool popularity: tool_00 is the hub
    zipf_w = 1.0 / np.arange(1, n_tools + 1)
    zipf_w /= zipf_w.sum()
    rows = []
    for t in range(n_turns):
        if t % 2 == 0:
            role = "user"
            tool = None
        else:
            # assistant turns sometimes invoke a tool (recorded as a
            # separate 'tool' role turn, mirroring agent traces)
            role = "tool" if rng.random() < 0.35 else "assistant"
            tool = f"tool_{int(rng.choice(n_tools, p=zipf_w)):03d}" if role == "tool" else None
        filler = " ".join(rng.choice(_FILLER, size=6))
        text = f"{conv_id}:{t}:{role} {filler}"
        ts = BASE_EPOCH + conv_index * 1000 + t
        rows.append((conv_id, t, role, text, tool, datetime.fromtimestamp(ts, tz=timezone.utc)))
    return rows


def _sample_rows() -> list[tuple]:
    """Conversations embedding the four reference sample graphs."""
    rows = []
    for gi, name in enumerate(SAMPLE_NAMES):
        edges = _read_sample(name)
        # per sample vertex: one conversation listing its incident edge-tools
        incident: dict[int, list[str]] = {}
        for u, v in edges:
            tool = f"g{name}_e{u}_{v}"
            incident.setdefault(u, []).append(tool)
            incident.setdefault(v, []).append(tool)
        for u, tools in sorted(incident.items()):
            conv_id = f"g{name}_v{u}"
            t = 0
            for tool in tools:
                ts0 = BASE_EPOCH + 500_000_000 + gi * 1_000_000 + u * 1000
                rows.append((conv_id, t, "user", f"{conv_id}:{t}:user invoke",
                             None, datetime.fromtimestamp(ts0 + t, tz=timezone.utc)))
                t += 1
                rows.append((conv_id, t, "tool", f"{conv_id}:{t}:tool {tool}",
                             tool, datetime.fromtimestamp(ts0 + t, tz=timezone.utc)))
                t += 1
    return rows


def generate_transcripts(
    spark: SparkSession,
    n_conversations: int = 50,
    n_tools: int = 8,
    min_turns: int = 4,
    max_turns: int = 12,
    seed: int = 42,
    embed_samples: bool = True,
    out_path: str | None = None,
) -> DataFrame:
    """Distributed deterministic generation; optionally write parquet."""
    conv_ids = spark.range(n_conversations)

    def gen(batches):
        for pdf in batches:
            rows = list(
                itertools.chain.from_iterable(
                    _conv_rows(seed, int(i), n_tools, min_turns, max_turns)
                    for i in pdf["id"]
                )
            )
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    df = conv_ids.mapInPandas(gen, TRANSCRIPT_SCHEMA)
    if embed_samples:
        sample_df = spark.createDataFrame(_sample_rows(), TRANSCRIPT_SCHEMA)
        df = df.unionByName(sample_df)
    if out_path:
        df.write.mode("overwrite").parquet(out_path)
        return spark.read.parquet(out_path)
    return df
