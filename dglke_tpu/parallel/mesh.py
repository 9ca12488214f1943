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
    if jax.process_count() > 1:
        # vocab-sharded put_state slices the host table by process; that
        # mapping assumes each process owns one contiguous run of mesh rows
        pids = [d.process_index for d in devs]
        assert pids == sorted(pids), (
            "jax.devices() must be process-contiguous for the dist mesh")
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
        n = self.n

        def pad_vocab(x, s):
            """Pad dim 0 of vocab-sharded leaves to a multiple of the mesh
            size (vocab counts like Freebase's 86,054,151 do not divide
            device counts).  Padded rows hold zeros; ids never reference
            them, and ranking/save paths use model.n_entities, not the
            table shape."""
            spec = s.spec
            if x.ndim >= 1 and len(spec) and spec[0] == self.axis:
                rem = (-x.shape[0]) % n
                if rem:
                    pad = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
                    x = np.pad(np.asarray(x), pad)
            return x

        if jax.process_count() == 1:
            return jax.tree.map(
                lambda x, s: None if x is None
                else jax.device_put(pad_vocab(np.asarray(x), s), s),
                state, sh, is_leaf=lambda x: x is None)

        # Multi-host: every process holds the FULL host state (same seed /
        # same checkpoint); each contributes only its devices' rows.
        pid, nproc = jax.process_index(), jax.process_count()

        def put(x, s):
            if x is None:
                return None
            x = pad_vocab(np.asarray(x), s)
            spec = s.spec
            if x.ndim >= 1 and len(spec) and spec[0] == self.axis:
                per = x.shape[0] // nproc  # process-contiguous mesh rows
                local = x[pid * per:(pid + 1) * per]
            else:
                local = x  # replicated leaf: local data == global data
            return jax.make_array_from_process_local_data(s, local, x.shape)

        return jax.tree.map(put, state, sh, is_leaf=lambda x: x is None)

    # -- batches -------------------------------------------------------------

    def put_batch(self, arrs: Dict[str, np.ndarray]):
        """Single-process: dp-sharded device_put.  Multi-host: each process
        passes its LOCAL batch slice (its partition's sample, 1/nproc of the
        global batch); the global dp-sharded array is assembled from the
        process-local pieces — the SPMD equivalent of the reference's
        per-machine async minibatches (kvclient.py:140-156)."""
        multi = jax.process_count() > 1
        out = {}
        for k, v in arrs.items():
            sh = (self._sh(self.axis) if v.ndim == 1
                  else self._sh(self.axis, None))
            if multi:
                gshape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
                out[k] = jax.make_array_from_process_local_data(sh, v, gshape)
            else:
                out[k] = jax.device_put(v, sh)
        return out
