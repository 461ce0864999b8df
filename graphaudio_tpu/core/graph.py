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

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphaudio_tpu.core.constants import FRAMES_PER_BLOCK
from graphaudio_tpu.core.mixing import adapt_channels, resolve_channel_count
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


def _is_buffer_source(node) -> bool:
    """Buffer sources batch over a packed sample arena (duck-typed to avoid an
    import cycle with the nodes package)."""
    return hasattr(node, "_process_unity") and hasattr(node, "_buffer")


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
        node_in_counts = {}
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
            node_in_counts[node.node_id] = tuple(in_counts)
            out_counts = node.output_channel_counts(in_counts)
            for i, c in enumerate(out_counts):
                self.output_channels[(node.node_id, i)] = c

        # ---- stage scheduling with voice batching --------------------------
        # Nodes whose upstream dependencies are all emitted and that share a
        # group_key run as one vmapped stage. This collapses N same-type voice
        # nodes (the reference's per-node virtual dispatch) into one kernel.
        emitted = set()
        stages = []
        remaining = [n for n in topo if n is not dest]

        def upstream_ids(node):
            ids = set()
            for inp in node.inputs:
                for o in inp.connected_outputs:
                    ids.add(o.owner.node_id)
            for param in node.params.values():
                for o in param._mod_outputs:
                    ids.add(o.owner.node_id)
            return ids

        while remaining:
            ready = [n for n in remaining if upstream_ids(n) <= emitted]
            if not ready:  # cannot happen on a DAG, but fail loudly
                raise RuntimeError("stage scheduling stalled (cycle?)")
            by_key = {}
            singles = []
            for n in ready:
                key = n.group_key(node_in_counts[n.node_id])
                if key is None:
                    singles.append(n)
                else:
                    by_key.setdefault(key, []).append(n)
            for n in singles:
                stages.append(("single", [n]))
            for key, nodes in by_key.items():
                if len(nodes) == 1:
                    stages.append(("single", nodes))
                else:
                    stages.append(("group", nodes))
            for n in ready:
                emitted.add(n.node_id)
            remaining = [n for n in remaining if n.node_id not in emitted]
        stages.append(("dest", [dest]))
        self.stages = stages

        # Static window bounds compiled into buffer-source kernels; a
        # playbackRate scheduled beyond its bound forces a recompile.
        self.bufsrc_bounds = {
            n.node_id: n.rate_bound()
            for n in topo
            if _is_buffer_source(n) and n._buffer is not None
        }

        # State storage layout: grouped nodes live as ONE stacked pytree entry
        # (key encodes the member composition so preservation across
        # recompiles is exact); singles keep per-node entries. This keeps the
        # scan carry small — per-node leaves made compile time scale linearly
        # with voice count.
        self.state_ref: Dict[int, Tuple[str, object]] = {}
        self.group_keys: Dict[int, str] = {}  # stage index -> state key
        for si, (kind, nodes) in enumerate(stages):
            if kind == "group":
                key = "g(" + ",".join(str(n.node_id) for n in nodes) + ")"
                self.group_keys[si] = key
                for lane, n in enumerate(nodes):
                    self.state_ref[n.node_id] = (key, lane)
            else:
                for n in nodes:
                    self.state_ref[n.node_id] = (str(n.node_id), None)

        # Param encoding capacities (pow2 padding keeps jit cache stable while
        # event lists grow). Group members share one capacity so encodings
        # stack.
        for node in topo:
            for name, p in node.params.items():
                self.param_capacity[(node.node_id, name)] = _next_pow2(
                    max(1, p.event_count())
                )
        for kind, nodes in stages:
            if kind == "group":
                for name in nodes[0].params:
                    cap = max(
                        self.param_capacity[(n.node_id, name)] for n in nodes
                    )
                    for n in nodes:
                        self.param_capacity[(n.node_id, name)] = cap

    def static_config_stale(self) -> bool:
        """True when a param-dependent static choice (e.g. a buffer source's
        compiled rate bound) no longer covers the current param values."""
        for nid, bound in self.bufsrc_bounds.items():
            node = self.context._nodes.get(nid)
            if node is not None and node.rate_bound() > bound:
                return True
        return False

    # -- state ------------------------------------------------------------------

    def _init_node_state(self, node) -> dict:
        st = node.init_state(self.info)
        overrides = getattr(node, "_state_overrides", None)
        if overrides:
            st = dict(st)
            for k, v in overrides.items():
                if k in st:
                    st[k] = np.asarray(v, dtype=np.asarray(st[k]).dtype)
        return st

    def init_states(self) -> Dict:
        states = {}
        for si, (kind, nodes) in enumerate(self.stages):
            if kind == "group":
                members = [self._init_node_state(n) for n in nodes]
                states[self.group_keys[si]] = jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]), *members
                )
            else:
                for n in nodes:
                    states[str(n.node_id)] = self._init_node_state(n)
        # Upstream-only nodes feeding params etc. already appear in stages;
        # any topo node not staged (none today) would be initialized here.
        # Context-level globals (listener transform) travel in the state
        # pytree so they are data, not recompile triggers.
        states["__globals__"] = self.context.global_state()
        return states

    def encode_params(self) -> Dict[str, dict]:
        """Encode all params' event lists; bumps capacities when outgrown.

        Grouped nodes' encodings stack into one [V, ...] entry per param so
        the step evaluates each group param with a single vmapped pass.
        """
        for node in self.topo:
            for name, p in node.params.items():
                key = (node.node_id, name)
                if p.event_count() > self.param_capacity[key]:
                    self.param_capacity[key] = _next_pow2(p.event_count())
        for kind, nodes in self.stages:
            if kind == "group":
                for name in nodes[0].params:
                    cap = max(
                        self.param_capacity[(n.node_id, name)] for n in nodes
                    )
                    for n in nodes:
                        self.param_capacity[(n.node_id, name)] = cap
        encs = {}
        for si, (kind, nodes) in enumerate(self.stages):
            if kind == "group":
                gkey = self.group_keys[si]
                for name in nodes[0].params:
                    per = [
                        n.params[name].encode(
                            self.param_capacity[(n.node_id, name)]
                        )
                        for n in nodes
                    ]
                    encs[f"{gkey}/{name}"] = {
                        k: np.stack([e[k] for e in per]) for k in per[0]
                    }
            else:
                for n in nodes:
                    for name, p in n.params.items():
                        encs[f"{n.node_id}/{name}"] = p.encode(
                            self.param_capacity[(n.node_id, name)]
                        )
        return encs

    # -- the step function ---------------------------------------------------

    def make_step_fn(self):
        info = self.info
        stages = list(self.stages)
        dest = self.destination
        dest_channels = self.input_channels[(dest.node_id, 0)]
        input_channels = dict(self.input_channels)

        # Pre-build per-group host constants (source arenas + geometry) once.
        group_setup = {}
        for si, (kind, nodes) in enumerate(stages):
            if kind == "group" and _is_buffer_source(nodes[0]):
                rep = nodes[0]
                unity = rep._static_unity_rate_cfg()
                bound = max(n.rate_bound() for n in nodes)
                w = type(rep)._window_w(self.info.superblock, bound, unity)
                built = [n.build_region(w) for n in nodes]
                regions = [b[0] for b in built]
                geoms = [b[1] for b in built]
                widths = [r.shape[1] for r in regions]
                offs = np.concatenate([[0], np.cumsum(widths)[:-1]]).astype(np.int32)
                arena = np.concatenate(regions, axis=1)
                stacked = {
                    k: np.stack([g[k] for g in geoms]) for k in geoms[0]
                }
                stacked["off"] = offs
                group_setup[si] = (arena, stacked, w, unity)

        def step(states, encs, feeds, frame0):
            rc = RenderContext(info, frame0)
            rc.globals = states.get("__globals__")
            rc.feeds = feeds
            # out_table values: jnp array [C, T], or ("lane", tensor, v) where
            # tensor is a stacked group output [V, C, T].
            out_table: Dict[Tuple[int, int], object] = {}
            new_states = {"__globals__": states.get("__globals__")}

            def mixed_signal(sources, dst_c):
                """Sum arbitrary outputs (direct arrays + group lanes) into
                one [dst_c, T] block. Lanes of the same group tensor collapse
                into a single axis-0 reduction — the reference's fan-in
                summing junction (AudioNodeInput.cs:100-138) as one op."""
                direct = []
                lanes: Dict[int, Tuple[jnp.ndarray, list]] = {}
                for s in sources:
                    if isinstance(s, tuple) and s[0] == "lane":
                        _, tensor, v = s
                        lanes.setdefault(id(tensor), (tensor, []))[1].append(v)
                    else:
                        direct.append(s)
                parts = [adapt_channels(d, dst_c) for d in direct]
                for tensor, vs in lanes.values():
                    if len(vs) == tensor.shape[0]:
                        summed = jnp.sum(tensor, axis=0)
                    elif len(vs) == 1:
                        summed = tensor[vs[0]]
                    else:
                        summed = jnp.sum(tensor[jnp.asarray(vs)], axis=0)
                    parts.append(adapt_channels(summed, dst_c))
                if not parts:
                    return jnp.zeros((dst_c, rc.frames), dtype=jnp.float32)
                acc = parts[0]
                for p in parts[1:]:
                    acc = acc + p
                return acc

            def port_sources(inp):
                return [
                    out_table[(o.owner.node_id, o.index)]
                    for o in inp.connected_outputs
                ]

            def mixed_input(node, inp):
                c = input_channels[(node.node_id, inp.index)]
                return mixed_signal(port_sources(inp), c)

            def param_values(node, name, p, enc):
                a_rate = p.automation_rate == AutomationRate.A_RATE
                times = rc.sample_times if a_rate else rc.block_times
                intrinsic = eval_intrinsic(enc, times)
                if p._mod_outputs:
                    # Hidden mono Explicit modulation input (AudioParam.cs:66-70).
                    srcs = [
                        out_table[(o.owner.node_id, o.index)]
                        for o in p._mod_outputs
                    ]
                    mod = mixed_signal(srcs, 1)[0]
                    if a_rate:
                        m = mod
                    else:
                        # k-rate reads modulation at sample 0 of each block
                        # (AudioParam.cs:150-156).
                        m = mod.reshape(info.superblock, FRAMES_PER_BLOCK)[:, 0]
                    return jnp.clip(
                        intrinsic + m,
                        jnp.float32(p.min_value),
                        jnp.float32(p.max_value),
                    ), a_rate
                return intrinsic, a_rate

            def run_single(node):
                params = {}
                for name, p in node.params.items():
                    vals, a_rate = param_values(
                        node, name, p, encs[f"{node.node_id}/{name}"]
                    )
                    params[name] = ParamSignal(vals, a_rate, info.superblock)
                inputs = [mixed_input(node, inp) for inp in node.inputs]
                st, outs = node.process(states[str(node.node_id)], inputs, params, rc)
                new_states[str(node.node_id)] = st
                for i, o in enumerate(outs):
                    out_table[(node.node_id, i)] = o

            def stacked_inputs(nodes, inp_idx):
                """[V, C, T] inputs for a group; identity fast path when all
                lanes chain 1:1 from one upstream group tensor."""
                dst_c = input_channels[(nodes[0].node_id, inp_idx)]
                per = [port_sources(n.inputs[inp_idx]) for n in nodes]
                first = per[0]
                if (
                    len(first) == 1
                    and isinstance(first[0], tuple)
                    and all(
                        len(p) == 1
                        and isinstance(p[0], tuple)
                        and p[0][1] is first[0][1]
                        and p[0][2] == v
                        for v, p in enumerate(per)
                    )
                    and first[0][1].shape[0] == len(nodes)
                    and first[0][1].shape[1] == dst_c
                ):
                    return first[0][1]
                return jnp.stack(
                    [mixed_signal(p, dst_c) for p in per], axis=0
                )

            def run_group(si, nodes):
                rep = nodes[0]
                gkey = self.group_keys[si]
                # States live stacked in the carry; params are pre-stacked
                # encodings evaluated with ONE vmapped pass per param.
                states_stacked = states[gkey]
                pvals = {}
                rates = {}
                for name, p in rep.params.items():
                    a_rate = p.automation_rate == AutomationRate.A_RATE
                    times = rc.sample_times if a_rate else rc.block_times
                    enc = encs[f"{gkey}/{name}"]
                    pvals[name] = jax.vmap(eval_intrinsic, in_axes=(0, None))(
                        enc, times
                    )  # [V, T or S]
                    rates[name] = a_rate
                inputs_stacked = [
                    stacked_inputs(nodes, i) for i in range(len(rep.inputs))
                ]

                if _is_buffer_source(rep):
                    arena_np, geoms_np, w, unity = group_setup[si]
                    arena = jnp.asarray(arena_np)
                    geoms = {k: jnp.asarray(v) for k, v in geoms_np.items()}

                    def lane(state, geom, pv):
                        if unity:
                            return rep._process_unity(state, arena, geom, rc, w)
                        return rep._process_resample(
                            state, arena, geom, pv["playbackRate"], rc, w
                        )

                    sts, outs = jax.vmap(lane)(states_stacked, geoms, pvals)
                else:

                    def lane(state, inputs, pv):
                        params = {
                            name: ParamSignal(v, rates[name], info.superblock)
                            for name, v in pv.items()
                        }
                        return rep.process(state, list(inputs), params, rc)

                    sts, outs = jax.vmap(lane)(
                        states_stacked, tuple(inputs_stacked), pvals
                    )

                new_states[gkey] = sts
                for i, o in enumerate(outs):  # o: [V, C, T]
                    for v, n in enumerate(nodes):
                        out_table[(n.node_id, i)] = ("lane", o, v)

            for si, (kind, nodes) in enumerate(stages):
                if kind == "single":
                    run_single(nodes[0])
                elif kind == "group":
                    run_group(si, nodes)
                else:  # destination: passthrough sink (AudioDestinationNode.cs:42-64)
                    dest_out = mixed_input(dest, dest.inputs[0])
                    new_states[str(dest.node_id)] = states[str(dest.node_id)]

            return new_states, dest_out

        return step, dest_channels

    def make_render_fn(self):
        """Jitted multi-superblock renderer: scan step over frame offsets."""
        step, dest_channels = self.make_step_fn()

        def render(states, encs, feeds, frame0s):
            def body(carry, frame0):
                new_states, out = step(carry, encs, feeds, frame0)
                return new_states, out

            states, outs = jax.lax.scan(body, states, frame0s)
            # outs: [n_steps, C, T] -> [C, n_steps*T]
            outs = jnp.swapaxes(outs, 0, 1).reshape(outs.shape[1], -1)
            return states, outs

        return jax.jit(render, donate_argnums=(0,)), dest_channels
