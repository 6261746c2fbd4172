"""The main.m:78-118 figure analog (examples/run_demo.py --plot):
four panels, target vs per-span reproduced pressure, written to disk."""

import importlib.util
import os

import numpy as np


def _load_demo():
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "run_demo.py"
    )
    spec = importlib.util.spec_from_file_location("run_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_save_pressure_figure_writes_png(tmp_path):
    demo = _load_demo()
    rng = np.random.default_rng(0)
    n, mics = 600, 3
    spans = (1, 4, 8)
    target_a = rng.standard_normal((n, mics))
    target_b = rng.standard_normal((n, mics))
    pressures = {
        s: tuple(rng.standard_normal((n, mics)) * 0.1 for _ in range(4))
        for s in spans
    }
    out = tmp_path / "fig.png"
    demo.save_pressure_figure(str(out), spans, target_a, target_b, pressures)
    assert out.exists() and out.stat().st_size > 10_000
