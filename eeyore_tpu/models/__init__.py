from eeyore_tpu.models import logistic_regression, mlp
from eeyore_tpu.models.losses import (
    binary_cross_entropy,
    cross_entropy,
    loss_functions,
)
from eeyore_tpu.models.mlp import MLP
from eeyore_tpu.models.logistic_regression import LogisticRegression
from eeyore_tpu.models.model import BayesianModel, DistributionModel, LogTargetModel
from eeyore_tpu.models.priors import IIDNormalPrior
