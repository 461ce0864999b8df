"""Auxiliary subsystems: profiling, graph inspection, checkpoint/resume.

The reference has none of these (SURVEY.md §5) — its closest artifacts are
BufferPool statistics (BufferPool.cs:133-149), the CurrentBlock probe, and the
GetAllNodes debug walk. Here they are first-class: per-render timing stats,
a graph describe/DOT export, and full engine-state checkpointing (the whole
engine state is a pytree, so a checkpoint is just its serialization).
"""

from graphaudio_tpu.utils.profiling import RenderStats
from graphaudio_tpu.utils.inspect import describe_graph, graph_to_dot
from graphaudio_tpu.utils.checkpoint import save_context_state, load_context_state

__all__ = [
    "RenderStats",
    "describe_graph",
    "graph_to_dot",
    "save_context_state",
    "load_context_state",
]
