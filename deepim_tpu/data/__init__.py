from deepim_tpu.data.loader import TestLoader, TrainLoader  # noqa: F401
from deepim_tpu.data.pairdb import (  # noqa: F401
    LM_CLASSES,
    LM_IDX2CLASS,
    SYMMETRIC_CLASSES,
    PairDB,
    load_gt_pairdb,
    merge_pairdb,
)
