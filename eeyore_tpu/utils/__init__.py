from eeyore_tpu.utils.dtypes import default_float
from eeyore_tpu.utils.itertools import chunk_evenly
from eeyore_tpu.utils.profiling import PhaseTimer, device_trace, timed
