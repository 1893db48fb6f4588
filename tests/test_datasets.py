"""Dataset layer tests: bundled CSVs, one-hot loading, DataCounter
epoch/iteration accounting, batch schedules, the MLD batcher, and the
posterior-predictive integrator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eeyore_tpu.datasets import (
    BatchSchedule,
    DataCounter,
    EmptyXYDataset,
    MLDClassificationBatcher,
    XYDataset,
    XYIDataset,
    one_hot,
)
from eeyore_tpu.integrators import MCIntegrator


class TestBundledData:
    def test_xor(self):
        ds = XYDataset.from_eeyore("xor")
        assert ds.x.shape == (4, 2)
        assert ds.y.shape == (4, 1)
        np.testing.assert_array_equal(ds.y.ravel(), [0, 1, 1, 0])

    def test_iris_onehot(self):
        ds = XYDataset.from_eeyore("iris", yonehot=True)
        assert ds.x.shape == (150, 4)
        assert ds.y.shape == (150, 3)
        np.testing.assert_array_equal(ds.y.sum(axis=1), np.ones(150))
        np.testing.assert_array_equal(ds.y.sum(axis=0), [50, 50, 50])

    def test_banknotes(self):
        ds = XYDataset.from_eeyore("banknotes")
        assert ds.x.shape == (200, 6)
        assert set(np.unique(ds.y)) == {0.0, 1.0}

    def test_getitem_and_len(self):
        ds = XYDataset.from_eeyore("xor")
        assert len(ds) == 4
        x0, y0 = ds[0]
        np.testing.assert_array_equal(x0, [0, 0])

    def test_xyidataset(self):
        ds = XYIDataset(np.zeros((5, 2)), np.zeros((5, 1)))
        _, _, idx = ds[3]
        assert idx == 3

    def test_empty_dataset(self):
        ds = EmptyXYDataset()
        assert len(ds) == 1
        assert ds.x.shape == (1, 0)

    def test_one_hot(self):
        out = one_hot(np.array([0, 2, 1]), num_classes=3)
        np.testing.assert_array_equal(out, np.eye(3)[[0, 2, 1]])


class TestDataCounter:
    def test_epoch_iteration_roundtrip(self):
        c = DataCounter(batch_size=10, sample_size=35)
        assert c.num_batches == 4  # uneven last batch kept
        c.set_epoch_info(100, 10)
        assert c.num_iters == 400
        assert c.num_burnin_iters == 40
        c.set_iter_info(401, 41)
        assert c.num_epochs == 101  # ceil
        assert c.num_burnin_epochs == 11

    def test_drop_last(self):
        c = DataCounter(batch_size=10, sample_size=35, drop_last=True)
        assert c.num_batches == 3

    def test_idx(self):
        c = DataCounter(batch_size=1, sample_size=4)
        c.increment_idx()
        c.increment_idx(3)
        assert c.idx == 4
        c.reset()
        assert c.idx == 0


class TestBatchSchedule:
    def test_full_batch(self):
        sched = BatchSchedule.full_batch(np.zeros((6, 2)), np.zeros((6, 1)))
        assert sched.num_batches == 1

    def test_minibatch_shapes(self):
        ds = XYDataset(np.arange(24).reshape(12, 2).astype(float), np.zeros((12, 1)))
        sched = BatchSchedule.from_dataset(ds, batch_size=4)
        assert sched.num_batches == 3
        xb, yb = sched.batch(1)
        assert xb.shape == (4, 2)

    def test_shuffle_with_key(self):
        ds = XYDataset(np.arange(12).reshape(6, 2).astype(float), np.zeros((6, 1)))
        s1 = BatchSchedule.from_dataset(ds, batch_size=3, key=jax.random.PRNGKey(0))
        s2 = BatchSchedule.from_dataset(ds, batch_size=3)
        assert not np.array_equal(np.asarray(s1.x), np.asarray(s2.x))

    def test_uneven_raises(self):
        ds = XYDataset(np.zeros((7, 2)), np.zeros((7, 1)))
        with pytest.raises(ValueError):
            BatchSchedule.from_dataset(ds, batch_size=3, drop_last=False)


class TestMLDBatcher:
    def test_stratified_batch(self):
        from eeyore_tpu.models import MLP, loss_functions, mlp

        rng = np.random.default_rng(0)
        x = rng.normal(size=(60, 4))
        labels = np.repeat([0, 1, 2], 20)
        y = np.eye(3)[labels]
        ds = XYDataset(x, y)
        model = MLP(loss=loss_functions["multiclass_classification"],
                    hparams=mlp.Hyperparameters(dims=[4, 3, 3],
                                                activations=[mlp.sigmoid, None]))
        batcher = MLDClassificationBatcher(num_batches=4, chunk_sizes=[9, 6], dataset=ds)
        assert batcher.batch_size() == 15
        params = [rng.normal(size=model.num_params) for _ in range(2)]
        xb, yb = batcher.get_batch(model, params)
        assert xb.shape == (15, 4)
        assert yb.shape == (15, 3)
        # stratification: roughly balanced classes
        counts = yb.sum(axis=0)
        assert counts.min() >= 3


class TestMCIntegrator:
    def test_running_mean_equivalence(self):
        vals = np.array([1.0, 2.0, 3.0, np.nan, 4.0])
        integ = MCIntegrator(f=lambda s, x, y: s[0], samples=jnp.asarray(vals)[:, None])
        integral, dropped = integ.integrate(None, None)
        assert dropped == 1
        np.testing.assert_allclose(float(integral), 2.5)

    def test_integrate_from_dataset(self):
        ds = XYIDataset(np.arange(10).reshape(5, 2).astype(float), np.zeros((5, 1)))
        integ = MCIntegrator(f=lambda s, x, y: jnp.sum(x) + s[0],
                             samples=jnp.ones((3, 1)))
        integrals, indices, dropped = integ.integrate_from_dataset(ds, num_points=5, shuffle=False)
        assert integrals.shape == (5,)
        np.testing.assert_array_equal(dropped, np.zeros(5))
        np.testing.assert_allclose(integrals[0], 1.0 + 0.0 + 1.0)
