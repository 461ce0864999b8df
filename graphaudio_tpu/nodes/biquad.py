"""Biquad filter node (parity: GraphAudio.Core/Nodes/BiQuadFilterNode.cs:10).

Eight RBJ-cookbook filter types; a-rate ``frequency``/``q`` params, k-rate
``gain`` (dB, shelving/peaking). The sequential per-sample IIR recurrence
becomes a parallel associative scan (see ops/biquad.py).

Documented deviation: the reference recomputes coefficients lazily when the
frequency moved by >0.001 Hz / Q by >0.0001 (:126-134); this implementation
computes coefficients every sample (identical for constant params, strictly
more accurate for automated ones).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from graphaudio_tpu.core.constants import FRAMES_PER_BLOCK
from graphaudio_tpu.core.node import AudioNode
from graphaudio_tpu.core.params import AutomationRate
from graphaudio_tpu.ops.biquad import (
    FILTER_TYPES,
    biquad_apply,
    rbj_coefficients,
    rbj_coefficients_dyn,
)


class FilterType(enum.Enum):
    """Parity: BiQuadFilterNode.cs:288-298."""

    LOWPASS = "lowpass"
    HIGHPASS = "highpass"
    BANDPASS = "bandpass"
    NOTCH = "notch"
    ALLPASS = "allpass"
    PEAKING = "peaking"
    LOWSHELF = "lowshelf"
    HIGHSHELF = "highshelf"


class BiQuadFilterNode(AudioNode):
    def __init__(self, context, type: FilterType = FilterType.LOWPASS):
        super().__init__(context, input_count=1, output_count=1, name="BiQuadFilter")
        self._type = type
        self.frequency = self.create_audio_param(
            "frequency",
            1000.0,
            min_value=1.0,
            max_value=context.sample_rate / 2.0,
            automation_rate=AutomationRate.A_RATE,
        )
        self.q = self.create_audio_param(
            "Q", 1.0, min_value=0.001, max_value=1000.0,
            automation_rate=AutomationRate.A_RATE,
        )
        # Constant frequency/Q compile a single-pass scan; the first scheduled
        # event recompiles with the time-varying correction pass.
        self.frequency.notify_first_event = True
        self.q.notify_first_event = True
        self.gain = self.create_audio_param(
            "gain", 0.0, min_value=-60.0, max_value=60.0,
            automation_rate=AutomationRate.K_RATE,
        )
        # Gain enters the a1/a2 DENOMINATOR for peaking/shelving types, so
        # its first event must also recompile out of the constant-pole path
        # (other types ignore gain entirely — no recompile for them).
        self.gain.notify_first_event = type in self._GAIN_IN_POLES
        self._channels = 2

    _GAIN_IN_POLES = (FilterType.PEAKING, FilterType.LOWSHELF,
                      FilterType.HIGHSHELF)

    def _time_varying(self) -> bool:
        """True when the recurrence's POLE coefficients (a1/a2) can change
        over time: frequency/Q always enter them; gain only for the
        peaking/shelving types (RBJ: A reaches the denominator there)."""
        tv = bool(
            self.frequency._had_events
            or self.q._had_events
            or self.frequency._mod_outputs
            or self.q._mod_outputs
        )
        if self._type in self._GAIN_IN_POLES:
            tv = tv or bool(
                self.gain._had_events or self.gain._mod_outputs
            )
        return tv

    @property
    def type(self) -> FilterType:
        return self._type

    @type.setter
    def type(self, value: FilterType) -> None:
        if value != self._type:
            self._type = value
            self.gain.notify_first_event = value in self._GAIN_IN_POLES
            self._config_changed()  # filter formulas are baked into the kernel

    def output_channel_counts(self, input_channels):
        c = input_channels[0] if input_channels else 2
        self._channels = c
        return [c]

    def group_key(self, input_channels):
        return ("biquad", self._type, input_channels[0],
                self._time_varying(), self._mod_signature())

    def chain_key(self, input_channels):
        """Chain-fusion compatibility key: the TYPE is excluded — a
        mixed-type serial EQ cascade (lowpass -> peaking -> ... ) fuses
        into ONE pipelined stage whose kernel selects coefficients from
        the per-lane "__type_sel__" one-hot (rbj_coefficients_dyn). Pipes
        whose lanes all share one type keep the static single-branch
        kernel (bit-exact vs the unfused graph; the dynamic where-chain
        compiles with different FMA choices, so it is reserved for chains
        that could not fuse at all otherwise)."""
        key = self.group_key(input_channels)
        if key is None:
            return None
        return ("biquad", input_channels[0], self._time_varying())

    def _type_onehot(self) -> np.ndarray:
        v = np.zeros(len(FILTER_TYPES), np.float32)
        v[FILTER_TYPES.index(self._type.value)] = 1.0
        return v

    def init_state(self, info):
        return {
            "w1": np.zeros((self._channels,), np.float32),
            "w2": np.zeros((self._channels,), np.float32),
            # Config-derived type selector (see config_state): data, so
            # mixed-type lanes share one kernel.
            "__type_sel__": self._type_onehot(),
        }

    def config_state(self):
        """Leaves that must always reflect the CURRENT config: state
        migration preserves running filter state across recompiles, but a
        type edit must never carry the old selector along."""
        return {"__type_sel__": self._type_onehot()}

    def process(self, state, inputs, params, rc):
        x = inputs[0]
        # Per-sample clamps mirror the in-loop clamps (BiQuadFilterNode.cs:123-124).
        f = jnp.clip(
            params["frequency"].per_sample(), 1.0, rc.sample_rate / 2.0
        )
        q = jnp.maximum(params["Q"].per_sample(), 0.001)
        # k-rate gain: one value per 128-frame block, expanded per sample.
        g = jnp.repeat(
            params["gain"].per_block(), FRAMES_PER_BLOCK,
            total_repeat_length=rc.frames,
        )
        if getattr(rc, "mixed_config", False):
            # Mixed-type fused chain: select the type's coefficients from
            # the per-lane one-hot (all lanes share this one kernel).
            coeffs = rbj_coefficients_dyn(
                state["__type_sel__"], f, q, g, rc.sample_rate
            )
        else:
            # Static type (single stage, same-type group, same-type pipe):
            # one branch compiles — bit-exact across fused/unfused.
            coeffs = rbj_coefficients(
                self._type.value, f, q, g, rc.sample_rate
            )
        # The correction pass for automated coefficients only compiles in
        # when the poles can actually vary (first event/modulation on
        # frequency/Q — or on gain for peaking/shelving types — recompiles).
        time_varying = self._time_varying()
        y, w1, w2 = biquad_apply(
            x, coeffs, state["w1"], state["w2"], time_varying=time_varying,
            constant=not time_varying,
        )
        return {
            "w1": w1, "w2": w2, "__type_sel__": state["__type_sel__"],
        }, [y]
