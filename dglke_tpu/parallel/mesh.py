"""Device mesh + sharding plans.

The reference scales via hogwild processes over shared memory (single
machine) and a parameter server (multi machine).  Here both collapse into
one SPMD program over a `jax.sharding.Mesh`:

  * axis ``dp``: the batch axis is sharded — each device scores its chunk
    slice of positives/negatives (the P1/P2/P6 strategies of SURVEY.md §2c).
  * tables are either replicated (small vocab: XLA turns the sparse update
    into an all-gathered scatter, comm ∝ batch not table) or vocab-sharded
    over ``dp`` rows (large vocab: gathers/scatters become collective
    lookups — the P5 parameter-server equivalent, with XLA inserting the
    all-to-alls that DGL-KE did through its KVStore RPC).

Multi-host: the same plan works under `jax.distributed.initialize` where
`jax.devices()` spans hosts; each host feeds its local batch shard
(`put_batch` uses host-local addressable shards).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dglke_tpu.models.ke_model import TrainState
from dglke_tpu.ops.embedding import EmbeddingState


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


@dataclasses.dataclass
class ShardingPlan:
    mesh: Mesh
    table_sharding: str = "replicated"  # 'replicated' | 'vocab'
    axis: str = "dp"

    def _sh(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def n(self) -> int:
        return self.mesh.devices.size

    # -- state ---------------------------------------------------------------

    def table_spec(self, vocab_shardable: bool) -> NamedSharding:
        if self.table_sharding == "vocab" and vocab_shardable:
            return self._sh(self.axis, None)
        return self._sh()

    def state_shardings(self, has_projection: bool) -> TrainState:
        ent = EmbeddingState(
            emb=self.table_spec(True),
            state_sum=self._sh(self.axis)
            if self.table_sharding == "vocab" else self._sh())
        # relation tables are small: replicate (the reference's rel_part
        # strategies exist to fit GPU memory; HBM-resident replication +
        # deterministic updates make them unnecessary)
        rel = EmbeddingState(emb=self._sh(), state_sum=self._sh())
        proj = (EmbeddingState(emb=self._sh(), state_sum=self._sh())
                if has_projection else None)
        return TrainState(entity=ent, relation=rel, projection=proj,
                          step=self._sh())

    def put_state(self, state: TrainState) -> TrainState:
        if self.table_sharding == "vocab":
            # Pallas row kernels are opaque to the SPMD partitioner; the
            # vocab-sharded path must keep XLA gather/scatter so the
            # partitioner can turn them into all-to-alls.
            from dglke_tpu.ops.embedding import set_pallas_rows
            set_pallas_rows("off")
        sh = self.state_shardings(state.projection is not None)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, s), state, sh,
            is_leaf=lambda x: x is None)

    # -- batches -------------------------------------------------------------

    def put_batch(self, arrs: Dict[str, np.ndarray]):
        out = {}
        for k, v in arrs.items():
            if v.ndim == 1:
                out[k] = jax.device_put(v, self._sh(self.axis))
            else:  # [B, F] filter arrays: shard rows
                out[k] = jax.device_put(v, self._sh(self.axis, None))
        return out
