"""Smoke tests for the shipped examples.

Every example must at least import (catches API drift), and the
self-contained ones must run end-to-end on CPU. multichip_scene needs a
multi-device mesh and measured_hrtf_flac expects an HRIR asset on disk, so
those two are import-only here (multichip is exercised by
__graft_entry__.dryrun_multichip and tests/test_parallel.py).
"""

import importlib
import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")


@pytest.fixture(autouse=True)
def _examples_on_path():
    sys.path.insert(0, EXAMPLES)
    yield
    sys.path.remove(EXAMPLES)


@pytest.mark.parametrize(
    "name",
    [
        "game_audio",
        "measured_hrtf_flac",
        "multichip_scene",
        "offline_mixdown",
        "pcm_delivery_opus",
        "timed_automation",
    ],
)
def test_example_imports(name):
    mod = importlib.import_module(name)
    assert callable(mod.main)


def test_offline_mixdown_runs(tmp_path):
    mod = importlib.import_module("offline_mixdown")
    out = str(tmp_path / "mix.wav")
    mod.main(out)
    assert os.path.getsize(out) > 44  # WAV header + audio


def test_timed_automation_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # main() writes timed_automation.wav to cwd
    importlib.import_module("timed_automation").main()
    assert os.path.getsize(tmp_path / "timed_automation.wav") > 44


def test_game_audio_runs(tmp_path):
    mod = importlib.import_module("game_audio")
    out = str(tmp_path / "scene.wav")
    mod.main(out)
    assert os.path.getsize(out) > 44


def test_pcm_delivery_opus_runs(tmp_path):
    mod = importlib.import_module("pcm_delivery_opus")
    out = str(tmp_path / "tone.opus")
    try:
        mod.main(out)
    except RuntimeError as e:
        # libopus/libogg are dlopen'd; absence is an environment gap, not a
        # code failure.
        pytest.skip(f"opus libs unavailable: {e}")
    data = open(out, "rb").read(4)
    assert data == b"OggS"
