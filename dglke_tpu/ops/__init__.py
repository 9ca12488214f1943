from dglke_tpu.ops.embedding import (  # noqa: F401
    EmbeddingState, init_embedding, sparse_adagrad_update, segment_dedup,
    gather_rows)
