"""Serve many independent scenes/streams on one program.

The per-chip throughput story for production: a batch of independent
two-zone scenes (different rooms, programs, or hyperparameter settings)
advances in lockstep under one jit — the scene axis vmapped and, given a
mesh, sharded (optionally together with the microphone axis; see
``parallel.mesh``). The reference processes exactly one scene per
process (survey §2: no parallelism of any kind).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from apvast_tpu.config import ApVastConfig
from apvast_tpu.engine import build_plan, init_state
from apvast_tpu.parallel.mesh import (
    shard_plan,
    shard_scene_batch,
    sharded_multi_scene_hop,
)


class MultiSceneApVast:
    """A batch of AP-VAST streams with one shared config.

    Args:
        config: shared scene geometry/hyperparameters.
        rir_pairs: list of (rir_a, rir_b) arrays, one per scene.
        mesh: optional ``jax.sharding.Mesh`` with 'scene' and/or 'mic'
            axes for multi-device execution.

    Lockstep invariant (tracking solver): the tracking whitening's
    rebuild cadence is one UNBATCHED scalar derived from scene 0's
    carried hop counter (``parallel/mesh.py``), so all scenes MUST share
    the same ``gevd_hop`` — true by construction here, and preserved by
    :meth:`process_input_buffers` (every scene advances together). If
    you swap or reset ONE scene's state in-place mid-serving, its warmup
    window would silently follow the others' cadence; reset ALL scenes
    together (or call :meth:`check_lockstep` after mutating
    ``self.states`` to validate — one host fetch, debug use only).
    """

    def __init__(self, config: ApVastConfig, rir_pairs, mesh=None, keys=None):
        self.config = config
        self.mesh = mesh
        stack = lambda trees: jax.tree.map(lambda *x: jnp.stack(x), *trees)
        plans = [build_plan(config, ra, rb) for ra, rb in rir_pairs]
        if keys is None:
            keys = [jax.random.key(i) for i in range(len(rir_pairs))]
        states = [init_state(config, key=k) for k in keys]
        self.plans = stack(plans)
        self.states = stack(states)
        if mesh is not None:
            self.plans = shard_plan(self.plans, mesh)
            self.states = shard_scene_batch(self.states, mesh)
        self._hop_fn = sharded_multi_scene_hop(config, mesh)

    @property
    def num_scenes(self) -> int:
        return self.states.input_blocks.shape[0]

    def check_lockstep(self) -> None:
        """Assert all scenes share one gevd_hop (see class docstring).

        Costs one device->host fetch; call after any manual
        ``self.states`` surgery, not per hop."""
        gh = getattr(self.states, "gevd_hop", None)
        if gh is None:
            return
        import numpy as np

        gh = np.asarray(gh)
        if gh.size and gh.min() != gh.max():
            raise RuntimeError(
                "scene states are not lockstep (gevd_hop spans "
                f"[{gh.min()}, {gh.max()}]); the tracking rebuild cadence "
                "is shared — reset all scenes together"
            )

    def process_input_buffers(self, hops_a, hops_b):
        """Advance every scene one hop. ``hops_a``/``hops_b``:
        (num_scenes, hop). Returns HopOutputs with a leading scene axis."""
        hops_a = jnp.asarray(hops_a)
        hops_b = jnp.asarray(hops_b)
        expected = (self.num_scenes, self.config.hop)
        if hops_a.shape != expected or hops_b.shape != expected:
            raise ValueError(f"hop batches must be {expected}")
        self.states, outputs = self._hop_fn(self.plans, self.states, hops_a, hops_b)
        return outputs
