"""dglke_tpu — a TPU-native knowledge-graph embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of awslabs/dgl-ke
(reference: /root/reference). Instead of DGL graph objects, hogwild shared
memory, and a parameter-server KVStore, the whole hot path is one SPMD program:

  * Embedding tables (entity / relation / projection) live in HBM as plain
    jnp arrays, replicated or vocab-sharded over a `jax.sharding.Mesh`.
  * A host-side numpy sampler produces integer (head, rel, tail, negative-id)
    batches; there is no graph object on the device at all.
  * One jitted train step does: gather -> chunked negative scoring (MXU
    einsums) -> loss (self-adversarial / pairwise / ...) -> jax.grad over the
    gathered rows -> sorted-segment-sum dedup -> row-sparse Adagrad scatter.

Public surface mirrors the reference's tools:
  train / eval / predict (topK link prediction) / emb_sim / partition / convert.
"""

__version__ = "0.1.0"

from dglke_tpu.config import KGEConfig  # noqa: F401
