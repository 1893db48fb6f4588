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

    def test_update_all(self, tmp_path):
        arrays = {"sample": RNG.normal(size=(15, 2)), "target_val": RNG.normal(size=15),
                  "accepted": np.ones(15, dtype=int)}
        cf = ChainFile(keys=tuple(arrays.keys()), path=tmp_path, mode="w")
        cf.update_all(arrays)
        back = ChainFile(keys=tuple(arrays.keys()), path=tmp_path).to_chainlist()
        np.testing.assert_allclose(back.get_samples(), arrays["sample"], rtol=1e-15)


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
