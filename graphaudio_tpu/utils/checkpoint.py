"""Checkpoint / resume: serialize the full engine state.

The reference keeps all state (playback positions, filter states, convolver
delay lines, automation event lists) in-memory only (SURVEY.md §5). Here the
entire engine state is a pytree, so checkpointing is serialization: node
states (flattened to numpy), the block clock, and every param's base value +
event timeline. Restoring into a context with the same graph topology resumes
rendering bit-exactly where it left off.

Format: a single .npz with a JSON manifest (no pickle — safe to load).
"""

from __future__ import annotations

import io
import json

import jax
import numpy as np


def _flatten_states(states):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(states)[0]
    arrays = {}
    manifest = []
    for i, (path, leaf) in enumerate(leaves_with_paths):
        key = f"leaf_{i}"
        arrays[key] = np.asarray(leaf)
        manifest.append(jax.tree_util.keystr(path))
    return arrays, manifest


def save_context_state(context, path) -> None:
    """Write a resumable checkpoint of the context's render state."""
    context._ensure_compiled()
    states = jax.device_get(context._states)
    arrays, leaf_paths = _flatten_states(states)

    params = []
    for node in context._compiled.topo:
        for name, p in node.params.items():
            params.append(
                {
                    "node_id": node.node_id,
                    "name": name,
                    "value": float(p.value),
                    "events": [
                        {"time": e[0], "type": e[2], "value": e[3], "tc": e[4]}
                        for e in p._events
                    ],
                }
            )

    manifest = {
        "format": "graphaudio-tpu-checkpoint-v1",
        "sample_rate": context.sample_rate,
        "superblock": context.superblock,
        "current_frame": context._current_frame,
        "current_time": context._current_time,
        "leaf_paths": leaf_paths,
        "params": params,
        # A render call that isn't a whole number of superblocks leaves
        # already-rendered frames in the host-side carry; dropping them on
        # resume would skip audio (the device clock is already past them).
        "has_carry": context._carry is not None,
    }
    if context._carry is not None:
        arrays["__carry__"] = np.asarray(context._carry)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_context_state(context, path) -> None:
    """Restore a checkpoint into a context with the same graph topology."""
    with np.load(path) as z:
        manifest = json.loads(bytes(z["__manifest__"]).decode())
        if manifest.get("format") != "graphaudio-tpu-checkpoint-v1":
            raise ValueError(
                f"not a graphaudio-tpu checkpoint (format tag: "
                f"{manifest.get('format')!r})"
            )
        leaves = [z[f"leaf_{i}"] for i in range(len(manifest["leaf_paths"]))]
        carry = z["__carry__"] if manifest.get("has_carry") else None
    if manifest["sample_rate"] != context.sample_rate:
        raise ValueError(
            f"checkpoint sample rate {manifest['sample_rate']} != context "
            f"{context.sample_rate}"
        )
    if manifest["superblock"] != context.superblock:
        raise ValueError(
            f"checkpoint superblock {manifest['superblock']} != context "
            f"{context.superblock} (state shapes depend on it)"
        )

    context._drain_commands()
    context._ensure_compiled()
    cur_flat, treedef = jax.tree_util.tree_flatten_with_path(
        jax.device_get(context._states)
    )
    expected = treedef.num_leaves
    if expected != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} state leaves; the current graph "
            f"has {expected} (topology mismatch)"
        )
    # Leaf counts can coincide across different topologies — require each
    # leaf's PATH, shape, and dtype to match so restored arrays can't land
    # in the wrong state slots silently.
    for (path, cur), saved, saved_path in zip(
        cur_flat, leaves, manifest["leaf_paths"]
    ):
        cur_path = jax.tree_util.keystr(path)
        if cur_path != saved_path:
            raise ValueError(
                f"checkpoint state layout mismatch: leaf {saved_path!r} vs "
                f"current graph's {cur_path!r} (different topology?)"
            )
        cur_arr = np.asarray(cur)
        if np.shape(saved) != cur_arr.shape or saved.dtype != cur_arr.dtype:
            raise ValueError(
                f"checkpoint leaf {saved_path!r} is {np.shape(saved)}/"
                f"{saved.dtype}; current graph expects "
                f"{cur_arr.shape}/{cur_arr.dtype}"
            )
    context._states = jax.tree_util.tree_unflatten(treedef, leaves)
    context._carry = carry
    context._current_frame = int(manifest["current_frame"])
    # Older checkpoints predate the accumulated clock; the frame-derived
    # value differs only at the ~1e-13 level.
    context._current_time = float(
        manifest.get("current_time",
                     context._current_frame / context.sample_rate)
    )

    by_key = {(p["node_id"], p["name"]): p for p in manifest["params"]}
    for node in context._compiled.topo:
        for name, p in node.params.items():
            saved = by_key.get((node.node_id, name))
            if saved is None:
                continue
            p._value = saved["value"]
            p._events = [
                (e["time"], i, e["type"], e["value"], e["tc"])
                for i, e in enumerate(saved["events"])
            ]
            p._seq = len(p._events)
            p._version += 1
    context._encs = None  # force re-encode from restored event lists
