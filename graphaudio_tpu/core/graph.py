"""Graph compiler: host node graph -> one jitted superblock render function.

The reference renders by recursive pull with per-node virtual dispatch and
per-block memoization (AudioNode.ProcessInternal, AudioNode.cs:152-183;
AudioNodeOutput.ProcessIfNeeded, AudioNodeOutput.cs:75-78). On TPU that
becomes: topologically sort the DAG once on the host, resolve static channel
counts, then emit a single pure function

    step(states, encs, frame0) -> (new_states, dest_out[f32, channels, T])

that evaluates every node for a superblock of S render quanta (T = S*128
frames). Offline rendering scans this function over superblocks with
``lax.scan``; XLA fuses the whole graph into a handful of kernels.

Cycle detection mirrors the reference's runtime throw (AudioNode.cs:157-160)
but happens at compile time.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphaudio_tpu.core.constants import FRAMES_PER_BLOCK
from graphaudio_tpu.core.mixing import mix_inputs, resolve_channel_count
from graphaudio_tpu.core.params import AutomationRate
from graphaudio_tpu.ops.param_eval import eval_intrinsic


@dataclass(frozen=True)
class StaticRenderInfo:
    """Compile-time render geometry handed to node kernels."""

    sample_rate: int
    superblock: int  # S: quanta per device step

    @property
    def frames(self) -> int:  # T
        return self.superblock * FRAMES_PER_BLOCK


class RenderContext:
    """Per-step traced context: clocks for one superblock.

    Times are float64, matching the reference's double block clock
    (AudioContextBase.cs:17,64-79).
    """

    def __init__(self, info: StaticRenderInfo, frame0):
        self.info = info
        self.sample_rate = info.sample_rate
        self.superblock = info.superblock
        self.frames = info.frames
        self.frame0 = frame0  # i64 scalar: absolute frame index of sample 0
        sr = jnp.float64(info.sample_rate)
        self.dt = 1.0 / sr
        block_offsets = jnp.arange(info.superblock, dtype=jnp.int64) * FRAMES_PER_BLOCK
        # t0 of each 128-frame block in the superblock (reference blockTime).
        self.block_times = (frame0 + block_offsets).astype(jnp.float64) / sr
        self.block_end_times = (
            frame0 + block_offsets + FRAMES_PER_BLOCK
        ).astype(jnp.float64) / sr
        in_block = jnp.arange(FRAMES_PER_BLOCK, dtype=jnp.float64) / sr
        # Per-sample times, exactly blockTime + i*dt per the reference's a-rate
        # evaluation (AudioParam.cs:116-120).
        self.sample_times = (self.block_times[:, None] + in_block[None, :]).reshape(-1)


class ParamSignal:
    """Computed values of one AudioParam for a superblock.

    ``per_sample()`` yields f32[T]; ``per_block()`` yields f32[S] (the value a
    k-rate consumer sees for each 128-frame quantum, reference
    ``GetValues()[0]``).
    """

    def __init__(self, values, is_a_rate: bool, superblock: int):
        self._values = values
        self._a_rate = is_a_rate
        self._S = superblock

    def per_sample(self):
        if self._a_rate:
            return self._values
        return jnp.repeat(self._values, FRAMES_PER_BLOCK, total_repeat_length=self._S * FRAMES_PER_BLOCK)

    def per_block(self):
        if self._a_rate:
            return self._values.reshape(self._S, FRAMES_PER_BLOCK)[:, 0]
        return self._values


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


class CompiledGraph:
    """Static schedule for a graph topology.

    Holds the topo order, resolved per-port channel counts, and param encoding
    capacities. Structure is immutable; re-built when topology changes.
    """

    def __init__(self, context):
        self.context = context
        self.info = StaticRenderInfo(context.sample_rate, context.superblock)
        self.destination = context.destination
        self.topo: List = []
        self.input_channels: Dict[Tuple[int, int], int] = {}  # (nid, in_idx) -> c
        self.output_channels: Dict[Tuple[int, int], int] = {}  # (nid, out_idx) -> c
        self.param_capacity: Dict[Tuple[int, str], int] = {}
        self._build()

    # -- topology -------------------------------------------------------------

    def _build(self) -> None:
        dest = self.destination
        # DFS from the destination through input connections and param
        # modulation sources (reference GetAllNodes, AudioContextBase.cs:191-218,
        # extended to param inputs which the reference reaches via
        # AudioParam._input pulls).
        WHITE, GREY, BLACK = 0, 1, 2
        color: Dict[int, int] = {}
        topo: List = []

        def upstream(node):
            ups = []
            for inp in node.inputs:
                for out in inp.connected_outputs:
                    ups.append(out.owner)
            for param in node.params.values():
                for out in param._mod_outputs:
                    ups.append(out.owner)
            return ups

        def dfs(node):
            c = color.get(node.node_id, WHITE)
            if c == BLACK:
                return
            if c == GREY:
                raise RuntimeError(
                    f"Audio graph cycle detected at node {node.name} (ID: {node.node_id})"
                )
            color[node.node_id] = GREY
            for up in upstream(node):
                dfs(up)
            color[node.node_id] = BLACK
            topo.append(node)

        dfs(dest)
        self.topo = topo

        # Static channel resolution in topo order (replaces the reference's
        # per-block dynamic resolution, AudioNodeInput.cs:140-168).
        for node in topo:
            in_counts = []
            for inp in node.inputs:
                src_counts = [
                    self.output_channels[(o.owner.node_id, o.index)]
                    for o in inp.connected_outputs
                ]
                c = resolve_channel_count(
                    inp.channel_count_mode.value, inp.channel_count, src_counts
                )
                self.input_channels[(node.node_id, inp.index)] = c
                in_counts.append(c)
            out_counts = node.output_channel_counts(in_counts)
            for i, c in enumerate(out_counts):
                self.output_channels[(node.node_id, i)] = c

        # Param encoding capacities (pow2 padding keeps jit cache stable while
        # event lists grow).
        for node in topo:
            for name, p in node.params.items():
                self.param_capacity[(node.node_id, name)] = _next_pow2(
                    max(1, p.event_count())
                )

    # -- state ------------------------------------------------------------------

    def init_states(self) -> Dict[int, dict]:
        return {n.node_id: n.init_state(self.info) for n in self.topo}

    def encode_params(self) -> Dict[str, dict]:
        """Encode all params' event lists; bumps capacities when outgrown."""
        encs = {}
        for node in self.topo:
            for name, p in node.params.items():
                key = (node.node_id, name)
                cap = self.param_capacity[key]
                if p.event_count() > cap:
                    cap = _next_pow2(p.event_count())
                    self.param_capacity[key] = cap
                encs[f"{node.node_id}/{name}"] = p.encode(cap)
        return encs

    # -- the step function ---------------------------------------------------

    def make_step_fn(self):
        info = self.info
        topo = list(self.topo)
        dest = self.destination
        dest_channels = self.input_channels[(dest.node_id, 0)]
        input_channels = dict(self.input_channels)

        def step(states, encs, frame0):
            rc = RenderContext(info, frame0)
            out_table: Dict[Tuple[int, int], jnp.ndarray] = {}
            new_states = {}

            def mixed_input(node, inp):
                srcs = [
                    out_table[(o.owner.node_id, o.index)]
                    for o in inp.connected_outputs
                ]
                c = input_channels[(node.node_id, inp.index)]
                return mix_inputs(srcs, c, rc.frames)

            def mod_signal(param):
                # The hidden modulation input is mono Explicit
                # (AudioParam.cs:68-70): downmix each source to 1 channel, sum.
                srcs = [
                    out_table[(o.owner.node_id, o.index)]
                    for o in param._mod_outputs
                ]
                return mix_inputs(srcs, 1, rc.frames)[0]  # [T]

            for node in topo:
                params = {}
                for name, p in node.params.items():
                    enc = encs[f"{node.node_id}/{name}"]
                    a_rate = p.automation_rate == AutomationRate.A_RATE
                    times = rc.sample_times if a_rate else rc.block_times
                    intrinsic = eval_intrinsic(enc, times)
                    if p._mod_outputs:
                        mod = mod_signal(p)
                        if a_rate:
                            m = mod
                        else:
                            # k-rate reads the modulation at sample 0 of each
                            # block (AudioParam.cs:150-156).
                            m = mod.reshape(info.superblock, FRAMES_PER_BLOCK)[:, 0]
                        vals = jnp.clip(
                            intrinsic + m,
                            jnp.float32(p.min_value),
                            jnp.float32(p.max_value),
                        )
                    else:
                        vals = intrinsic
                    params[name] = ParamSignal(vals, a_rate, info.superblock)

                if node is dest:
                    # Destination is a passthrough sink
                    # (AudioDestinationNode.cs:42-64): its mixed input is the
                    # render output.
                    dest_out = mixed_input(node, node.inputs[0])
                    new_states[node.node_id] = states[node.node_id]
                    continue

                inputs = [mixed_input(node, inp) for inp in node.inputs]
                st, outs = node.process(states[node.node_id], inputs, params, rc)
                new_states[node.node_id] = st
                for i, o in enumerate(outs):
                    expect_c = self.output_channels.get((node.node_id, i))
                    if expect_c is not None and o.shape[0] != expect_c:
                        raise AssertionError(
                            f"node {node.name} output {i}: expected {expect_c} "
                            f"channels, kernel produced {o.shape[0]}"
                        )
                    out_table[(node.node_id, i)] = o

            return new_states, dest_out

        return step, dest_channels

    def make_render_fn(self):
        """Jitted multi-superblock renderer: scan step over frame offsets."""
        step, dest_channels = self.make_step_fn()

        def render(states, encs, frame0s):
            def body(carry, frame0):
                new_states, out = step(carry, encs, frame0)
                return new_states, out

            states, outs = jax.lax.scan(body, states, frame0s)
            # outs: [n_steps, C, T] -> [C, n_steps*T]
            outs = jnp.swapaxes(outs, 0, 1).reshape(outs.shape[1], -1)
            return states, outs

        return jax.jit(render, donate_argnums=(0,)), dest_channels
