from dglke_tpu.models.score_functions import make_score_function  # noqa: F401
from dglke_tpu.models.loss import LossGenerator  # noqa: F401
from dglke_tpu.models.ke_model import KEModel, TrainState, metrics_from_ranks  # noqa: F401
from dglke_tpu.models.ge_model import (  # noqa: F401
    BasicGEModel,
    ComplExModel,
    DistMultModel,
    GNNModel,
    KGEModel,
    RESCALModel,
    RotatEModel,
    TransE_l1Model,
    TransE_l2Model,
    TransEModel,
    TransRModel,
    TripleSet,
)
