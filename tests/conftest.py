"""Shared fixtures: one SparkSession per test session; golden graphs.

Golden betweenness values are regenerated from networkx at test time
(FIXTURES.md §4) rather than trusting literals. The reference counts
ordered pairs ("To Match with baders results",
``modified_apsp.cpp:209``), i.e. 2× networkx's unnormalized BC.
"""

from __future__ import annotations

import os

import networkx as nx
import pytest

from centrality_gpu_spark.session import get_spark

SAMPLE_DIR = "/root/reference/Codes/sample_input"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = f"{TESTDATA}/sf0.001"
SF_MED = f"{TESTDATA}/sf0.01"


def read_sample_edges(name: str) -> list[tuple[int, int]]:
    """Parse a reference sample graph (header `n m`, rows `u v w`)."""
    with open(f"{SAMPLE_DIR}/{name}.txt") as f:
        lines = f.read().strip().splitlines()
    return [(int(u), int(v)) for u, v, _w in (ln.split() for ln in lines[1:])]


def sample_nx(name: str) -> nx.Graph:
    g = nx.Graph()
    g.add_edges_from(read_sample_edges(name))
    return g


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session", params=["test1", "test2", "test3", "test4"])
def sample_name(request):
    return request.param
