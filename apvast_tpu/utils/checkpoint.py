"""Checkpoint / resume for the streaming engine.

The reference has no persistence; its ~30 mutable instance arrays are the
whole run state (survey §5 notes `make_python_test.m:19-24` snapshots them
all via `properties()` — proof the state set is serializable-complete).
Here the state is already one flat pytree, so a checkpoint is just its
leaves: save/restore via ``.npz`` (zero-dependency) or hand the pytree to
orbax for production checkpoint management. Resume is exact because the
noise init is keyed (see ``init_state``) — no unseeded randomness.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from apvast_tpu.config import ApVastConfig
from apvast_tpu.engine.state import ApVastState


def save_state(path: str, state: ApVastState) -> None:
    """Write all state leaves to one ``.npz`` file (None fields skipped)."""
    arrays = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
        if getattr(state, f.name) is not None
    }
    np.savez(path, **arrays)


def load_state(
    path: str,
    config: ApVastConfig | None = None,
    state_cls: type = ApVastState,
) -> ApVastState:
    """Restore a state pytree; validates shapes against ``config`` if
    given (a mismatched config would silently corrupt the stream).
    ``state_cls`` selects the engine family (ApVastState or the
    frequency-domain engine's FdState)."""
    data = np.load(path)
    fields = {name: jnp.asarray(data[name]) for name in data.files}
    state = state_cls(**fields)
    if state_cls is not ApVastState:
        return state
    if config is not None:
        expected = init_shapes(config)
        for name, shape in expected.items():
            leaf = getattr(state, name, None)
            if shape is None:
                continue
            got = None if leaf is None else leaf.shape
            if got != shape:
                raise ValueError(
                    f"checkpoint field {name} has shape {got}, config expects {shape}"
                )
    return state


def init_shapes(config: ApVastConfig) -> dict[str, tuple[int, ...]]:
    """Expected state-leaf shapes for a config (used for validation)."""
    from apvast_tpu.engine.state import init_state

    ref = jax.eval_shape(lambda: init_state(config))
    return {
        f.name: (None if getattr(ref, f.name) is None else getattr(ref, f.name).shape)
        for f in dataclasses.fields(ref)
    }
