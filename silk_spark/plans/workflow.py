"""Workflow DAG: typed nodes + edges, topologically executed.

Reference: Workflow / LocalWorkflowExecutor (/root/reference/
silk-workspace/.../activity/workflow/Workflow.scala:29-78,
LocalWorkflowExecutor.scala:34-150) and ExecutorRegistry
(silk-core/.../execution/ExecutorRegistry.scala) — whose Executor
scaladoc explicitly anticipates a SparkExecution backend
(silk-core/.../execution/Executor.scala:11).

Spark-first: a node's operator is a plain function
``(dict[str, DataFrame]) -> DataFrame``; data crosses node boundaries
as *lazy DataFrames* (the Catalyst analogue of Silk's lazy
LocalEntities traversables, execution/EntityHolder.scala:11-46), so
the whole DAG collapses into one optimized plan per sink — Catalyst
sees through node boundaries, unlike the reference's per-node
iterator pipeline. Per-node ExecutionReports are collected via
``df.observe`` so reporting adds no extra jobs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class Node:
    name: str
    op: Callable[[dict[str, DataFrame]], DataFrame]
    inputs: list[str] = field(default_factory=list)
    observe_rows: bool = True


class Workflow:
    """DAG of named nodes; `add` wires inputs by node name."""

    def __init__(self):
        self.nodes: dict[str, Node] = {}

    def add(
        self,
        name: str,
        op: Callable[[dict[str, DataFrame]], DataFrame],
        inputs: list[str] | None = None,
        observe_rows: bool = True,
    ) -> "Workflow":
        if name in self.nodes:
            raise ValueError(f"duplicate node {name}")
        self.nodes[name] = Node(name, op, inputs or [], observe_rows)
        return self

    def dataset(self, name: str, df: DataFrame) -> "Workflow":
        """Source node (WorkflowDataset analogue)."""
        return self.add(name, lambda _ins, df=df: df, [], observe_rows=False)

    def topo_order(self) -> list[str]:
        """Topological sort (Workflow.scala:29-78's sorted node list);
        raises on cycles or dangling inputs."""
        indeg = {n: 0 for n in self.nodes}
        for node in self.nodes.values():
            for i in node.inputs:
                if i not in self.nodes:
                    raise ValueError(f"node {node.name} references unknown input {i}")
                indeg[node.name] += 1
        ready = sorted(n for n, d in indeg.items() if d == 0)
        order = []
        while ready:
            n = ready.pop(0)
            order.append(n)
            for m, node in self.nodes.items():
                if n in node.inputs:
                    indeg[m] -= 1
                    if indeg[m] == 0:
                        ready.append(m)
            ready.sort()
        if len(order) != len(self.nodes):
            cyc = set(self.nodes) - set(order)
            raise ValueError(f"workflow has a cycle through {sorted(cyc)}")
        return order

    def execute(self, end_nodes: list[str] | None = None) -> "WorkflowResult":
        """Build every node's DataFrame lazily in topological order.
        Nothing runs until a result is consumed — Catalyst optimizes
        across all node boundaries (column pruning through the DAG)."""
        order = self.topo_order()
        frames: dict[str, DataFrame] = {}
        observations: dict[str, Observation] = {}
        for name in order:
            node = self.nodes[name]
            df = node.op({i: frames[i] for i in node.inputs})
            if node.observe_rows:
                obs = Observation()
                df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
                observations[name] = obs
            frames[name] = df
        wanted = end_nodes or [order[-1]]
        return WorkflowResult({n: frames[n] for n in wanted}, frames, observations)


class WorkflowResult:
    def __init__(self, outputs, all_frames, observations):
        self.outputs: dict[str, DataFrame] = outputs
        self.frames: dict[str, DataFrame] = all_frames
        self._observations: dict[str, Observation] = observations

    def report(self) -> dict[str, dict]:
        """Per-node ExecutionReport (reference execution/
        ExecutionReport.scala): row counts from observations — only
        populated for nodes that participated in an executed action."""
        out = {}
        for name, obs in self._observations.items():
            try:
                out[name] = dict(obs.get)
            except Exception:  # noqa: BLE001 — node never executed
                out[name] = {}
        return out
