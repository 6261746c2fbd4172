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

# Complex leaves (the FD engine's cov/cross/spec_hist) are split into a
# stacked (real, imag) float pair ON DEVICE before host transfer: the
# axon runtime cannot host-transfer complex arrays (see engine/plan.py),
# so a complex np.asarray would fail exactly on the production backend.
_REIM_SUFFIX = "__reim"


def save_state(path: str, state) -> None:
    """Write all state leaves to one ``.npz`` file (None fields skipped).
    Accepts any engine state dataclass (ApVastState or FdState)."""
    arrays = {}
    for f in dataclasses.fields(state):
        leaf = getattr(state, f.name)
        if leaf is None:
            continue
        if jnp.iscomplexobj(leaf):
            pair = jnp.stack([jnp.real(leaf), jnp.imag(leaf)])
            arrays[f.name + _REIM_SUFFIX] = np.asarray(pair)
        else:
            arrays[f.name] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_state(
    path: str,
    config: ApVastConfig | None = None,
    state_cls: type = ApVastState,
):
    """Restore a state pytree; validates shapes against ``config`` if
    given (a mismatched config would silently corrupt the stream).
    ``state_cls`` selects the engine family (ApVastState or the
    frequency-domain engine's FdState); validation covers both."""
    data = np.load(path)
    fields = {}
    for name in data.files:
        if name.endswith(_REIM_SUFFIX):
            pair = jnp.asarray(data[name])
            fields[name[: -len(_REIM_SUFFIX)]] = jax.lax.complex(
                pair[0], pair[1]
            )
        else:
            fields[name] = jnp.asarray(data[name])
    state = state_cls(**fields)
    if config is not None:
        expected = init_shapes(config, state_cls=state_cls)
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


def init_shapes(
    config: ApVastConfig, state_cls: type = ApVastState
) -> dict[str, tuple[int, ...]]:
    """Expected state-leaf shapes for a config (used for validation)."""
    if state_cls is ApVastState:
        from apvast_tpu.engine.state import init_state as init_fn
    else:
        from apvast_tpu.engine.fd_hop import init_fd_state as init_fn

    ref = jax.eval_shape(lambda: init_fn(config))
    return {
        f.name: (None if getattr(ref, f.name) is None else getattr(ref, f.name).shape)
        for f in dataclasses.fields(ref)
    }
