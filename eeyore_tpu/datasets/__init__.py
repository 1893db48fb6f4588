from eeyore_tpu.datasets.batches import BatchSchedule, as_schedule
from eeyore_tpu.datasets.counter import DataCounter
from eeyore_tpu.datasets.mld_batcher import MLDBatcher, MLDClassificationBatcher
from eeyore_tpu.datasets.xydataset import (
    EmptyXYDataset,
    IDataset,
    XYDataset,
    XYIDataset,
    data_paths,
    one_hot,
)
