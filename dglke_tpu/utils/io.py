"""Checkpoint / config I/O.

Artifact-compatible with the reference (utils.py:35-57 +
general_models.py:290-306): embeddings are saved as
``{dataset}_{model}_entity.npy`` / ``_relation.npy`` (+ ``projection.npy``
for TransR) next to a ``config.json`` of all args and id-map filenames, so
the reference's downstream tooling can read our checkpoints and vice versa.
Adagrad state is additionally saved (``*_state.npy``) to support true
training resume, which the reference lacks (train_pytorch.py:101-102
asserts on resume).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dglke_tpu.config import KGEConfig
from dglke_tpu.models.ke_model import KEModel, TrainState
from dglke_tpu.ops.embedding import EmbeddingState


def _atomic_save(path: str, arr: np.ndarray) -> None:
    """np.save via tmp-file + os.replace so a crash mid-write never
    corrupts an existing artifact (the periodic --save_interval
    fault-tolerance checkpoint overwrites in place; it must survive the
    very crash it exists to recover from)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, arr)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


_STREAM_THRESHOLD = 256 << 20   # tables above this stream chunkwise
_STREAM_CHUNK = 64 << 20        # device->host fetch granularity (bytes)
_STREAM_WORKERS = 4             # concurrent in-flight fetches


def _atomic_save_rows(path: str, get_chunk, n_rows: int, row_shape,
                      dtype=np.float32) -> None:
    """Stream an [n_rows, *row_shape] array into an npy file from a
    row-chunk fetcher, atomically (same tmp+replace contract as
    _atomic_save).

    Big-table checkpoint saves are bottlenecked by the device->host
    fetch, not the disk write (the r4 12M-entity record burned 376 s+
    per 6.1 GB save fetching the whole table in one blocking
    device_get).  Chunked fetches through a small thread pool (a) keep a
    bounded number of transfers in flight so a multiplexing link
    overlaps them, (b) overlap the fetch with the file write, and
    (c) never hold more than workers x chunk bytes of staging memory —
    the monolithic path held TWO table-size host copies (device_get
    result + astype copy)."""
    import concurrent.futures as cf

    dtype = np.dtype(dtype)
    row_bytes = int(np.prod(row_shape, dtype=np.int64)) * dtype.itemsize \
        if row_shape else dtype.itemsize
    chunk_rows = max(1, _STREAM_CHUNK // max(row_bytes, 1))
    starts = list(range(0, n_rows, chunk_rows))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.lib.format.write_array_header_2_0(
            f, {"descr": np.lib.format.dtype_to_descr(dtype),
                "fortran_order": False,
                "shape": (n_rows,) + tuple(row_shape)})
        with cf.ThreadPoolExecutor(_STREAM_WORKERS) as ex:
            pending = []
            for s in starts:
                pending.append(ex.submit(get_chunk, s,
                                         min(s + chunk_rows, n_rows)))
                # sliding window: write the oldest chunk once the pool
                # is saturated, keeping fetch-ahead (and host staging)
                # bounded while later fetches proceed concurrently
                while len(pending) > _STREAM_WORKERS:
                    f.write(np.ascontiguousarray(
                        pending.pop(0).result(), dtype=dtype).tobytes())
            for fut in pending:
                f.write(np.ascontiguousarray(
                    fut.result(), dtype=dtype).tobytes())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _save_table(path: str, emb, n_rows: int, dim: int) -> None:
    """Persist a (possibly padded, possibly bf16, possibly on-device)
    embedding table as the fp32 npy artifact, streaming when big.

    The device->host wire carries the table's STORED dtype (bf16 tables
    transfer at 2 bytes/elem; the fp32 upcast happens on host), and the
    row/lane padding is sliced off ON DEVICE so padded bytes never cross
    the link."""
    nbytes = int(n_rows) * int(dim) * 4
    if not isinstance(emb, jax.Array) or nbytes < _STREAM_THRESHOLD:
        arr = np.asarray(jax.device_get(emb))[:n_rows, :dim]
        _atomic_save(path, arr.astype(np.float32, copy=False))
        return

    def get_chunk(a, b):
        return np.asarray(emb[a:b, :dim]).astype(np.float32, copy=False)

    _atomic_save_rows(path, get_chunk, n_rows, (dim,), np.float32)


def save_model(config: KGEConfig, model: KEModel, state: TrainState,
               save_path: Optional[str] = None, emap_file=None,
               rmap_file=None, save_opt_state: bool = True) -> str:
    path = save_path or config.save_path
    os.makedirs(path, exist_ok=True)
    prefix = f"{config.dataset}_{config.model_name}_"
    # vocab-sharded tables carry mesh-padding rows and Pallas-path tables
    # carry lane-padding columns; never persist either.  bf16-stored tables
    # are upcast: the npy artifact contract (and the reference's tooling)
    # is fp32.  Big tables stream chunkwise (_save_table) — the
    # monolithic device_get of the whole state cost 376 s+ per 6.1 GB
    # save over the tunneled link and held two table-size host copies.
    _save_table(os.path.join(path, prefix + "entity.npy"),
                state.entity.emb, model.n_entities, model.entity_dim)
    _save_table(os.path.join(path, prefix + "relation.npy"),
                state.relation.emb, model.n_relations, model.relation_dim)
    if state.projection is not None:
        # the reference spells this WITHOUT the separating underscore
        # (TransRScore.save: name + 'projection', score_fun.py:179-180);
        # match it so reference tooling can read our TransR checkpoints
        _save_table(os.path.join(path, prefix[:-1] + "projection.npy"),
                    state.projection.emb,
                    int(state.projection.emb.shape[0]), model.proj_dim)
    if save_opt_state:
        ent_ss = np.asarray(
            jax.device_get(state.entity.state_sum))[:model.n_entities]
        _atomic_save(os.path.join(path, prefix + "entity_state.npy"),
                     ent_ss)
        _atomic_save(os.path.join(path, prefix + "relation_state.npy"),
                     np.asarray(jax.device_get(state.relation.state_sum)))
        if state.projection is not None:
            _atomic_save(
                os.path.join(path, prefix + "projection_state.npy"),
                np.asarray(jax.device_get(state.projection.state_sum)))
        _atomic_save(os.path.join(path, prefix + "step.npy"),
                     np.asarray(jax.device_get(state.step)))
    config.save(path, emap_file, rmap_file)
    return path


def table_artifact_arrays(config: KGEConfig, path: str, name: str):
    """Resolve and read one table's npy artifacts as HOST arrays — the
    single source of truth for the checkpoint naming contract
    ({dataset}_{model}_{name}.npy, the reference's no-underscore
    projection spelling score_fun.py:179-180, optional {name}_state.npy
    Adagrad extras).  Shared by the device loader below and
    host_table.load_host_state (which must NOT device_put the table).
    Returns (emb, state_sum) numpy arrays."""
    prefix = f"{config.dataset}_{config.model_name}_"
    fname = os.path.join(path, prefix + f"{name}.npy")
    if name == "projection" and not os.path.exists(fname):
        fname = os.path.join(path, prefix[:-1] + "projection.npy")
    emb = np.load(fname)
    state_file = os.path.join(path, prefix + f"{name}_state.npy")
    if os.path.exists(state_file):
        ss = np.load(state_file)
    else:
        ss = np.zeros((emb.shape[0],), np.float32)
    return emb, ss


def saved_step(config: KGEConfig, path: str) -> int:
    """The step counter saved alongside the tables (0 when absent —
    reference-produced checkpoints have no step artifact)."""
    step_file = os.path.join(
        path, f"{config.dataset}_{config.model_name}_step.npy")
    return int(np.load(step_file)) if os.path.exists(step_file) else 0


def load_model_state(config: KGEConfig, model: KEModel, path: str
                     ) -> TrainState:
    def load_table(name) -> EmbeddingState:
        emb, ss = table_artifact_arrays(config, path, name)
        # the npy artifact is fp32; restore the configured storage dtype
        # and the lane-padded layout init_embedding would have chosen.
        # One donated jit fuses cast+pad so the fp32 staging buffer frees
        # as the stored table materializes (at 10M x 400 the eager
        # astype-then-pad chain holds three table-scale buffers at once).
        from dglke_tpu.ops.embedding import _should_pad_features, padded_dim
        edt = (jnp.bfloat16 if config.emb_dtype == "bfloat16"
               else jnp.float32)
        num, dim = emb.shape
        pad = (padded_dim(dim) - dim) if _should_pad_features(num, dim) \
            else 0

        def convert(x):
            x = x.astype(edt)
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad)))
            return x

        emb = jax.jit(convert, donate_argnums=0)(jnp.asarray(emb))
        return EmbeddingState(emb=emb,
                              state_sum=jnp.asarray(ss, jnp.float32))

    entity = load_table("entity")
    relation = load_table("relation")
    projection = None
    if model.is_transr:
        projection = load_table("projection")
    step = jnp.asarray(saved_step(config, path), jnp.int32)
    return TrainState(entity=entity, relation=relation, projection=projection,
                      step=step)


def load_raw_emb(path: str, prefix: str, name: str) -> np.ndarray:
    return np.load(os.path.join(path, f"{prefix}_{name}.npy"))


def load_config(path: str) -> KGEConfig:
    return KGEConfig.load(os.path.join(path, "config.json"))


def load_config_json(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


# -- sharded checkpointing (orbax) -------------------------------------------
#
# The npy artifact contract above replicates tables to host memory — fine for
# benchmark graphs, impossible for Freebase-scale vocab-sharded tables
# (86M x 400 fp32 = 137 GB).  The sharded path writes each host's table
# shards directly (orbax OCDBT), never materializing the full table
# anywhere, and restores onto the SAME mesh/sharding layout.  The reference
# has no equivalent (its kvservers only ever persist via the machine-0 pull,
# train_pytorch.py:282-335).

SHARDED_DIRNAME = "sharded_state"


def save_sharded(state: TrainState, path: str) -> str:
    """Write a sharded TrainState checkpoint under path/sharded_state.

    Collective: every process must call this (each writes its own shards).
    """
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(path, SHARDED_DIRNAME))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, state, force=True)
    return ckpt_dir


def has_sharded(path: str) -> bool:
    return os.path.isdir(os.path.join(path, SHARDED_DIRNAME))


def load_sharded(template_state: TrainState, path: str) -> TrainState:
    """Restore a sharded TrainState into `template_state`'s exact layout
    (shapes incl. mesh/lane padding, dtypes, shardings).

    Collective: every process must call this.  Callers pass a freshly
    initialized (and plan.put_state-sharded) state — exactly what resume
    builds anyway — so every padding/sharding decision is reproduced
    rather than reconstructed.
    """
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(path, SHARDED_DIRNAME))
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        template_state)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(ckpt_dir, abstract)
