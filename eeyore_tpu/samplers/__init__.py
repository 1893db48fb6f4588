from eeyore_tpu.samplers.am import AM, AMState
from eeyore_tpu.samplers.base import TransitionKernel
from eeyore_tpu.samplers.demc import DEMC, DEMCState
from eeyore_tpu.samplers.gibbs import Gibbs, GibbsState
from eeyore_tpu.samplers.harness import SamplerHarness
from eeyore_tpu.samplers.hmc import HMC, HMCState
from eeyore_tpu.samplers.mala import MALA, MALAState
from eeyore_tpu.samplers.mh import MetropolisHastings, MHState
from eeyore_tpu.samplers.monitor import summarize_run
from eeyore_tpu.samplers.nuts import NUTS, NUTSState, choose_max_depth
from eeyore_tpu.samplers.population import PopulationKernel, sample_population
from eeyore_tpu.samplers.ram import RAM, RAMState
from eeyore_tpu.samplers.power_posterior import (
    PowerPosteriorSampler,
    categorical_swap_probs,
    default_temperatures,
)
from eeyore_tpu.samplers.runner import run_fn, sample_chain, sample_chains
from eeyore_tpu.samplers.smc import SMCSampler, SMCState, systematic_resample_indices
