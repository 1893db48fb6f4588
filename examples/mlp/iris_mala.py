"""MALA over the weights of an MLP(4,3,3) iris classifier — the reference's
flagship example — with in-memory and file-backed chain storage.

Mirrors /root/reference/examples/samplers/mlp/iris/mala_cpu_chainlist.py and
mala_cpu_chainfile.py (11000 epochs, 1000 burn-in, step 0.003, N(0, sqrt(3))
prior, float32).
"""


import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from eeyore_tpu.chains import ChainFile
from eeyore_tpu.datasets import XYDataset
from eeyore_tpu.models import IIDNormalPrior, MLP, loss_functions, mlp
from eeyore_tpu.samplers import MALA, SamplerHarness


def main():
    iris = XYDataset.from_eeyore("iris", yonehot=True)
    data = (jnp.asarray(iris.x, jnp.float32), jnp.asarray(iris.y, jnp.float32))

    model = MLP(
        loss=loss_functions["multiclass_classification"],
        hparams=mlp.Hyperparameters(dims=[4, 3, 3], activations=[mlp.sigmoid, None]),
        dtype=jnp.float32)
    model.prior = IIDNormalPrior.isotropic(model.num_params, np.sqrt(3.0),
                                           dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    theta0 = model.prior.sample(key)

    harness = SamplerHarness(MALA(model, step=0.003), data, theta0=theta0, key=key)
    chain = harness.run(num_epochs=11000, num_burnin_epochs=1000, verbose=True)

    print("acceptance rate:", chain.acceptance_rate())
    print("Monte Carlo mean:", chain.mean().round(3))
    print("Monte Carlo SE:", chain.mc_se().round(3))
    print("multivariate ESS:", round(chain.multi_ess()))

    # file-backed storage round trip (the reference's chainfile variant)
    with tempfile.TemporaryDirectory() as tmp:
        chain.to_chainfile(path=tmp, mode="w")
        back = ChainFile(keys=("sample", "target_val", "accepted"), path=tmp).to_chainlist()
        print("chainfile round-trip samples:", len(back))


if __name__ == "__main__":
    main()
