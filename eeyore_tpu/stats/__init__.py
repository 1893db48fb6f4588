from eeyore_tpu.stats.cov import cor, cor_from_cov, cov
from eeyore_tpu.stats.discrepancy import mmd, squared_mmd
from eeyore_tpu.stats.ess import multi_ess
from eeyore_tpu.stats.mc_cov import inse_mc_cov, mc_cor, mc_cov, mc_se, mc_se_from_cov
from eeyore_tpu.stats.means import recursive_cov, recursive_mean, running_mean
from eeyore_tpu.stats.metrics import softabs
from eeyore_tpu.stats.random import choose, choose_from_subset
from eeyore_tpu.stats.rhat import multi_rhat

# Loss re-exports for reference-API parity (eeyore.stats.binary_cross_entropy)
from eeyore_tpu.models.losses import binary_cross_entropy
