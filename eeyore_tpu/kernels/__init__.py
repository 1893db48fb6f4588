from eeyore_tpu.kernels.function_kernels import (
    HomogeneousKernel,
    IsoSEKernel,
    PeriodicKernel,
    RQKernel,
)
from eeyore_tpu.kernels.proposal_kernels import (
    DEMCKernel,
    MultivariateNormalKernel,
    NormalKernel,
)
