"""Chain storage tests: in-memory stats delegation, CSV file round-trips
(reference-compatible formats), multi-chain container, save/load."""

import numpy as np

from eeyore_tpu.chains import ChainFile, ChainList, ChainLists

RNG = np.random.default_rng(11)


def make_chain(n=50, p=3, seed=0):
    rng = np.random.default_rng(seed)
    chain = ChainList(keys=("sample", "target_val", "accepted"))
    for i in range(n):
        chain.update({
            "sample": rng.normal(size=p),
            "target_val": float(rng.normal()),
            "accepted": int(rng.integers(0, 2)),
        })
    return chain


class TestChainList:
    def test_accessors(self):
        chain = make_chain(20, 3)
        assert len(chain) == 20
        assert chain.num_params() == 3
        assert chain.get_samples().shape == (20, 3)
        assert chain.get_param(1).shape == (20,)
        np.testing.assert_allclose(chain.mean(), chain.get_samples().mean(0))

    def test_acceptance_rate(self):
        chain = ChainList()
        for a in [1, 0, 1, 1]:
            chain.update({"sample": np.zeros(2), "target_val": 0.0, "accepted": a})
        assert chain.acceptance_rate() == 0.75

    def test_block_acceptance_rate(self):
        chain = ChainList()
        for a in [[1, 0], [1, 1]]:
            chain.update({"sample": np.zeros(2), "target_val": 0.0, "accepted": np.array(a)})
        np.testing.assert_allclose(chain.block_acceptance_rate(), [1.0, 0.5])

    def test_from_arrays(self):
        arrays = {"sample": RNG.normal(size=(10, 4)), "target_val": RNG.normal(size=10),
                  "accepted": np.ones(10, dtype=int)}
        chain = ChainList.from_arrays(arrays)
        assert len(chain) == 10
        np.testing.assert_array_equal(chain.get_samples(), arrays["sample"])

    def test_to_kanga(self, monkeypatch):
        """to_kanga builds a kanga ChainArray when kanga is importable and
        raises a clear ImportError otherwise (kanga is optional)."""
        import sys
        import types

        chain = make_chain(10, 2)
        if "kanga" not in sys.modules:
            captured = {}

            class FakeChainArray:
                def __init__(self, vals):
                    captured.update(vals)

            kanga = types.ModuleType("kanga")
            kanga_chains = types.ModuleType("kanga.chains")
            kanga_chains.ChainArray = FakeChainArray
            kanga.chains = kanga_chains
            monkeypatch.setitem(sys.modules, "kanga", kanga)
            monkeypatch.setitem(sys.modules, "kanga.chains", kanga_chains)
            chain.to_kanga()
            assert captured["sample"].shape == (10, 2)
            assert captured["accepted"].shape == (10,)
            assert "grad_val" not in captured

            monkeypatch.delitem(sys.modules, "kanga.chains")
            monkeypatch.delitem(sys.modules, "kanga")
            import pytest

            with pytest.raises(ImportError, match="kanga"):
                chain.to_kanga()

    def test_save_load(self, tmp_path):
        chain = make_chain(30, 2)
        chain.save(tmp_path / "chain.npz")
        loaded = ChainList()
        loaded.load(tmp_path / "chain.npz")
        np.testing.assert_allclose(loaded.get_samples(), chain.get_samples())

    def test_stats_run(self):
        chain = make_chain(400, 2)
        assert chain.multi_ess() > 0
        assert chain.mc_se().shape == (2,)
        assert chain.mc_cov().shape == (2, 2)
        assert chain.running_means().shape == (400, 2)


class TestChainFile:
    def test_roundtrip(self, tmp_path):
        chain = make_chain(25, 3)
        chain.to_chainfile(path=tmp_path, mode="w")
        assert (tmp_path / "sample.csv").exists()
        back = ChainFile(keys=("sample", "target_val", "accepted"), path=tmp_path).to_chainlist()
        np.testing.assert_allclose(back.get_samples(), chain.get_samples(), rtol=1e-15)
        np.testing.assert_allclose(back.get_target_vals(), chain.get_target_vals(), rtol=1e-15)
        assert back.vals["accepted"] == chain.vals["accepted"]

    def test_native_writer_roundtrip(self, tmp_path):
        """The C++ chainstore writer must produce numpy-parseable CSVs that
        round-trip exactly (%.18e covers float64)."""
        from eeyore_tpu import native

        if native.get_chainstore() is None:
            import pytest

            pytest.skip("no native toolchain")
        arrays = {"sample": RNG.normal(size=(500, 7)), "target_val": RNG.normal(size=500),
                  "accepted": RNG.integers(0, 2, 500)}
        cf = ChainFile(keys=tuple(arrays.keys()), path=tmp_path, mode="w")
        cf.update_all(arrays)
        back = ChainFile(keys=tuple(arrays.keys()), path=tmp_path).to_chainlist()
        np.testing.assert_array_equal(back.get_samples(), arrays["sample"])
        np.testing.assert_array_equal(back.get_target_vals(), arrays["target_val"])
        assert back.vals["accepted"] == list(arrays["accepted"])

    def test_native_reader_matches_loadtxt(self, tmp_path):
        """The C++ strtod parser must agree exactly with numpy.loadtxt on
        %.18e float and %d int CSVs (it backs ChainFile.to_chainlist)."""
        from eeyore_tpu import native

        if native.get_chainstore() is None:
            import pytest

            pytest.skip("no native toolchain")
        f64 = RNG.normal(size=(200, 5)) * 10.0 ** RNG.integers(-30, 30, (200, 5))
        np.savetxt(tmp_path / "f.csv", f64, fmt="%.18e", delimiter=",")
        got = native.read_csv(tmp_path / "f.csv")
        ref = np.loadtxt(tmp_path / "f.csv", delimiter=",", ndmin=2)
        np.testing.assert_array_equal(got, ref)

        ints = RNG.integers(0, 2, (50, 1))
        np.savetxt(tmp_path / "i.csv", ints, fmt="%d", delimiter=",")
        got = native.read_csv(tmp_path / "i.csv")
        np.testing.assert_array_equal(got[:, 0].astype(np.int64), ints[:, 0])

    def test_update_all(self, tmp_path):
        arrays = {"sample": RNG.normal(size=(15, 2)), "target_val": RNG.normal(size=15),
                  "accepted": np.ones(15, dtype=int)}
        cf = ChainFile(keys=tuple(arrays.keys()), path=tmp_path, mode="w")
        cf.update_all(arrays)
        back = ChainFile(keys=tuple(arrays.keys()), path=tmp_path).to_chainlist()
        np.testing.assert_allclose(back.get_samples(), arrays["sample"], rtol=1e-15)


class TestCheckpoint:
    def test_full_sampler_state_roundtrip(self, tmp_path):
        """Resume an HMC run mid-flight: tuner averages, step size and RNG-
        derived state all survive the checkpoint (the reference loses them,
        SURVEY.md section 5)."""
        import jax
        import jax.numpy as jnp

        from eeyore_tpu.chains import load_state, save_state
        from eeyore_tpu.models import DistributionModel
        from eeyore_tpu.samplers import HMC, sample_chain
        from eeyore_tpu.tuners.dual_averaging import HMCDATuner

        model = DistributionModel(lambda t, x, y: -0.5 * jnp.sum(t**2), num_params=2)
        data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
        kern = HMC(model, tuner=HMCDATuner(l=1.0, e0=0.2))
        chain, state = sample_chain(kern, jax.random.PRNGKey(0), jnp.ones(2),
                                    data, 200, 100, return_state=True)
        save_state(tmp_path / "ckpt.npz", state)

        fresh = kern.init(jnp.ones(2), *data)
        restored = load_state(tmp_path / "ckpt.npz", fresh)
        assert float(restored.step) == float(state.step)
        assert float(restored.tuner.logbare) == float(state.tuner.logbare)
        np.testing.assert_array_equal(np.asarray(restored.sample), np.asarray(state.sample))

    def test_vmapped_state_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from eeyore_tpu.chains import load_state, save_state
        from eeyore_tpu.models import DistributionModel
        from eeyore_tpu.samplers import MALA, sample_chains

        model = DistributionModel(lambda t, x, y: -0.5 * jnp.sum(t**2), num_params=2)
        data = (jnp.zeros((1, 0)), jnp.zeros((1, 0)))
        kern = MALA(model, step=0.3)
        _, state = sample_chains(kern, jax.random.PRNGKey(0), jnp.zeros((4, 2)),
                                 data, 50, 0, return_state=True)
        save_state(tmp_path / "ckpt.npz", state)
        restored = load_state(tmp_path / "ckpt.npz", state)
        np.testing.assert_array_equal(np.asarray(restored.sample), np.asarray(state.sample))


class TestChainLists:
    def test_from_chain_list_and_stats(self):
        chains = [make_chain(300, 2, seed=s) for s in range(4)]
        cl = ChainLists.from_chain_list(chains)
        assert cl.num_chains() == 4
        assert cl.num_samples() == 300
        assert cl.get_samples().shape == (4, 300, 2)
        rhat, *_ = cl.multi_rhat(method="iid")
        assert abs(rhat - 1.0) < 0.25
        summary = cl.summary(keys=("mean", "mc_se", "acceptance", "multi_ess", "multi_rhat"), method="iid")
        assert set(summary) == {"mean", "mc_se", "acceptance", "multi_ess", "multi_rhat"}

    def test_from_file(self, tmp_path):
        paths = []
        for s in range(2):
            p = tmp_path / f"chain{s}"
            make_chain(20, 2, seed=s).to_chainfile(path=p, mode="w")
            paths.append(p)
        cl = ChainLists.from_file(paths)
        assert cl.num_chains() == 2
        assert cl.num_samples() == 20

    def test_from_arrays(self):
        arrays = {"sample": RNG.normal(size=(3, 40, 2)), "target_val": RNG.normal(size=(3, 40)),
                  "accepted": np.ones((3, 40), dtype=int)}
        cl = ChainLists.from_arrays(arrays)
        assert cl.num_chains() == 3
        assert cl.get_samples().shape == (3, 40, 2)
