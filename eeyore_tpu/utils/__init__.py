from eeyore_tpu.utils.dtypes import default_float
from eeyore_tpu.utils.itertools import chunk_evenly
