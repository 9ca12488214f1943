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


def save_model(config: KGEConfig, model: KEModel, state: TrainState,
               save_path: Optional[str] = None, emap_file=None,
               rmap_file=None, save_opt_state: bool = True) -> str:
    path = save_path or config.save_path
    os.makedirs(path, exist_ok=True)
    prefix = f"{config.dataset}_{config.model_name}_"
    state = jax.device_get(state)
    # vocab-sharded tables carry mesh-padding rows and Pallas-path tables
    # carry lane-padding columns; never persist either
    ent_emb = np.asarray(state.entity.emb)[:model.n_entities,
                                           :model.entity_dim]
    ent_ss = np.asarray(state.entity.state_sum)[:model.n_entities]
    np.save(os.path.join(path, prefix + "entity.npy"), ent_emb)
    np.save(os.path.join(path, prefix + "relation.npy"),
            np.asarray(state.relation.emb)[:, :model.relation_dim])
    if state.projection is not None:
        np.save(os.path.join(path, prefix + "projection.npy"),
                np.asarray(state.projection.emb)[:, :model.proj_dim])
    if save_opt_state:
        np.save(os.path.join(path, prefix + "entity_state.npy"), ent_ss)
        np.save(os.path.join(path, prefix + "relation_state.npy"),
                np.asarray(state.relation.state_sum))
        if state.projection is not None:
            np.save(os.path.join(path, prefix + "projection_state.npy"),
                    np.asarray(state.projection.state_sum))
        np.save(os.path.join(path, prefix + "step.npy"),
                np.asarray(state.step))
    config.save(path, emap_file, rmap_file)
    return path


def load_model_state(config: KGEConfig, model: KEModel, path: str
                     ) -> TrainState:
    prefix = f"{config.dataset}_{config.model_name}_"

    def load_table(name) -> EmbeddingState:
        emb = np.load(os.path.join(path, prefix + f"{name}.npy"))
        state_file = os.path.join(path, prefix + f"{name}_state.npy")
        if os.path.exists(state_file):
            ss = np.load(state_file)
        else:
            ss = np.zeros((emb.shape[0],), np.float32)
        # restore the lane-padded layout init_embedding would have chosen
        from dglke_tpu.ops.embedding import maybe_pad_features
        return EmbeddingState(emb=maybe_pad_features(jnp.asarray(emb)),
                              state_sum=jnp.asarray(ss))

    entity = load_table("entity")
    relation = load_table("relation")
    projection = None
    if model.is_transr:
        projection = load_table("projection")
    step_file = os.path.join(path, prefix + "step.npy")
    step = (jnp.asarray(np.load(step_file)) if os.path.exists(step_file)
            else jnp.zeros((), jnp.int32))
    return TrainState(entity=entity, relation=relation, projection=projection,
                      step=step)


def load_raw_emb(path: str, prefix: str, name: str) -> np.ndarray:
    return np.load(os.path.join(path, f"{prefix}_{name}.npy"))


def load_config(path: str) -> KGEConfig:
    return KGEConfig.load(os.path.join(path, "config.json"))


def load_config_json(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)
