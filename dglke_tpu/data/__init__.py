from dglke_tpu.data.dataset import KGDataset, get_dataset, synthetic_dataset  # noqa: F401
from dglke_tpu.data.sampler import (  # noqa: F401
    TrainSampler, EvalSampler, FilterIndex, random_partition,
    balanced_relation_partition, soft_relation_partition)
