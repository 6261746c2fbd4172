"""Driver contract: __graft_entry__.entry compiles single-device and
dryrun_multichip runs the sharded step on the virtual CPU mesh."""

import importlib.util
import os

import jax


def _load():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles():
    mod = _load()
    fn, args = mod.entry()
    state, outputs = jax.jit(fn)(*args)
    assert outputs.out_a.shape == (50, 800, 8)


def test_dryrun_multichip_eight():
    _load().dryrun_multichip(8)


def test_dryrun_multichip_two():
    _load().dryrun_multichip(2)
