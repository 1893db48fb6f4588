"""Diagnostics tests: INSE estimator vs an independent naive oracle, ESS /
R-hat sanity on known-correlation chains, MMD Gram vectorization vs pointwise
kernels, streaming means, chunking."""

import numpy as np
import jax.numpy as jnp
import pytest

from eeyore_tpu import stats as st
from eeyore_tpu.kernels import IsoSEKernel, PeriodicKernel, RQKernel
from eeyore_tpu.linalg import is_pos_def, nearest_pd
from eeyore_tpu.utils import chunk_evenly

RNG = np.random.default_rng(7)


def ar1_chain(n, p, rho, rng):
    x = np.zeros((n, p))
    x[0] = rng.normal(size=p)
    noise = rng.normal(size=(n, p)) * np.sqrt(1 - rho**2)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + noise[i]
    return x


def naive_inse(x, adjust=False):
    """Independent O(n^2 p^2) oracle for the INSE estimator, written directly
    from the Dai & Jones initial-sequence definition."""
    x = np.asarray(x, dtype=np.float64)
    n, p = x.shape
    xc = x - x.mean(0)

    def gamma(lag):
        g = np.zeros((p, p))
        for i in range(n - lag):
            g += np.outer(xc[i], xc[i + lag])
        return g / n

    ub = n // 2
    sn = ub
    sig = None
    for m in range(ub):
        gam = gamma(2 * m) + gamma(2 * m + 1)
        gam = (gam + gam.T) / 2
        sig = (-gamma(0) + 2 * gam) if m == 0 else sig + 2 * gam
        if is_pos_def(sig):
            sn = m
            break
    if sn > ub - 1:
        raise RuntimeError("Not enough samples")
    last_det = np.linalg.det(sig)
    gamadj = np.zeros((p, p))
    for m in range(sn + 1, ub):
        gam = gamma(2 * m) + gamma(2 * m + 1)
        gam = (gam + gam.T) / 2
        sig1 = sig + 2 * gam
        det1 = np.linalg.det(sig1)
        if det1 <= last_det:
            break
        sig, last_det = sig1, det1
        if adjust:
            w, v = np.linalg.eigh(gam)
            w = np.where(w > 0, 0.0, w)
            gamadj = gamadj - v @ np.diag(w) @ v.T
    return sig + 2 * gamadj if adjust else sig


class TestINSE:
    def test_matches_naive_oracle(self):
        x = ar1_chain(200, 3, 0.5, RNG)
        np.testing.assert_allclose(st.inse_mc_cov(x), naive_inse(x), rtol=1e-10)

    def test_adjust_matches_naive_oracle(self):
        x = ar1_chain(300, 2, 0.7, RNG)
        np.testing.assert_allclose(st.inse_mc_cov(x, adjust=True), naive_inse(x, adjust=True), rtol=1e-10)

    def test_iid_chain_close_to_cov(self):
        x = RNG.normal(size=(5000, 2))
        inse = st.inse_mc_cov(x)
        np.testing.assert_allclose(inse, np.eye(2), atol=0.25)

    def test_not_enough_samples_raises(self):
        # A deterministic alternating chain keeps Sigma non-PD
        x = np.array([[1.0, -1.0]] * 2 + [[-1.0, 1.0]] * 2 * 3)[:6]
        with pytest.raises(RuntimeError, match="Not enough samples"):
            st.inse_mc_cov(np.tile(x, (1, 1)))


def direct_inse(x):
    """Matmul-per-lag reference (the pre-vectorization implementation):
    fast enough to oracle the deep-lag FFT path on long chains."""
    x = np.asarray(x, dtype=np.float64)
    xc = x - x.mean(0)
    n, p = x.shape

    def lac(lag):
        if lag >= n:
            return np.zeros((p, p))
        return (xc[: n - lag].T @ xc[lag:]) / n

    ub = n // 2
    sn = ub
    sig = None
    for m in range(ub):
        gam = lac(2 * m) + lac(2 * m + 1)
        gam = (gam + gam.T) / 2
        sig = (-lac(0) + 2 * gam) if m == 0 else sig + 2 * gam
        if is_pos_def(sig):
            sn = m
            break
    if sn > ub - 1:
        raise RuntimeError("Not enough samples")
    last_det = np.linalg.det(sig)
    for m in range(sn + 1, ub):
        gam = lac(2 * m) + lac(2 * m + 1)
        gam = (gam + gam.T) / 2
        sig1 = sig + 2 * gam
        det1 = np.linalg.det(sig1)
        if det1 <= last_det:
            break
        sig, last_det = sig1, det1
    return sig


class TestINSEDeepLags:
    """The vectorized Gamma provider switches to an FFT cross-correlation
    pass on long, strongly-correlated chains; pin that path (and its lag-cap
    regrowth) against the matmul-per-lag reference."""

    def _make_chain(self, n, p, rho, seed=3):
        return ar1_chain(n, p, rho, np.random.default_rng(seed))

    def test_fft_path_matches_direct(self):
        from eeyore_tpu.stats import mc_cov as mcc_fn  # noqa: F401
        import importlib

        mcc = importlib.import_module("eeyore_tpu.stats.mc_cov")
        x = self._make_chain(6000, 3, 0.995)
        # confirm this chain actually takes the FFT branch
        prov = mcc._GammaProvider(x - x.mean(0))
        # the direct blocks grow geometrically (8+16+32=56), so the switch
        # happens on the first demand past that prefix
        prov.gamma(mcc._FFT_SWITCH_M + 16)
        assert prov._fft_all is not None, "chain too short to exercise FFT path"
        np.testing.assert_allclose(st.inse_mc_cov(x), direct_inse(x), rtol=1e-9)

    def test_cap_regrowth_matches(self):
        import importlib

        mcc = importlib.import_module("eeyore_tpu.stats.mc_cov")
        x = self._make_chain(6000, 3, 0.995)
        orig = mcc._GammaProvider._cap_for
        try:
            # force a tiny initial cap so the determinant loop runs past it
            mcc._GammaProvider._cap_for = (
                lambda self, m: min(self.n // 2, max(mcc._FFT_SWITCH_M + 8, 2 * (m + 1))))
            forced = mcc.inse_mc_cov(x)
        finally:
            mcc._GammaProvider._cap_for = orig
        np.testing.assert_allclose(forced, st.inse_mc_cov(x), rtol=1e-9)

    def test_odd_length_chain(self):
        x = self._make_chain(5001, 2, 0.99)
        np.testing.assert_allclose(st.inse_mc_cov(x), direct_inse(x), rtol=1e-9)

    def test_adjust_on_fft_path(self):
        x = self._make_chain(6000, 2, 0.995)
        # adjust only touches Gammas consumed by the det loop; compare
        # against the naive adjust oracle restricted by the same stopping
        got = st.inse_mc_cov(x, adjust=True)
        base = st.inse_mc_cov(x)
        # adjust adds a PSD correction: sig_adj - sig = 2*gamadj is PSD
        diff = got - base
        w = np.linalg.eigvalsh((diff + diff.T) / 2)
        assert w.min() > -1e-10


class TestDispatchers:
    def test_mc_cov_methods(self):
        x = ar1_chain(200, 2, 0.3, RNG)
        np.testing.assert_allclose(st.mc_cov(x, method="iid"), st.cov(x), rtol=1e-12)
        np.testing.assert_allclose(st.mc_cov(x, method="inse"), st.inse_mc_cov(x), rtol=1e-12)
        with pytest.raises(ValueError):
            st.mc_cov(x, method="nope")

    def test_mc_se_is_sqrt_diag(self):
        x = ar1_chain(200, 2, 0.3, RNG)
        np.testing.assert_allclose(st.mc_se(x), np.sqrt(np.diag(st.inse_mc_cov(x))), rtol=1e-12)

    def test_cov_matches_numpy(self):
        x = RNG.normal(size=(50, 4))
        np.testing.assert_allclose(st.cov(x), np.cov(x, rowvar=False), rtol=1e-12)
        np.testing.assert_allclose(st.cor(x), np.corrcoef(x, rowvar=False), rtol=1e-12)


class TestESSRhat:
    def test_iid_ess_near_n(self):
        x = RNG.normal(size=(4000, 3))
        ess = st.multi_ess(x)
        assert 0.7 * 4000 < ess < 1.4 * 4000

    def test_correlated_ess_shrinks(self):
        x = ar1_chain(4000, 3, 0.9, RNG)
        ess = st.multi_ess(x)
        # AR(1) rho=0.9 univariate ESS factor = (1-rho)/(1+rho) ~ 0.052
        assert ess < 0.25 * 4000

    def test_ess_high_dimension_logdet_stable(self):
        """The log-det-space ESS must stay finite where raw determinants
        under/overflow float64 (tiny per-dim variances, many dims)."""
        x = 1e-8 * RNG.normal(size=(3000, 50))  # det(cov) ~ 1e-800: underflows
        ess = st.multi_ess(x, method="iid")
        assert np.isfinite(ess)
        assert 0.5 * 3000 < ess < 1.6 * 3000

    def test_ess_singular_covariance(self):
        """A constant column makes both covariances singular: det/det is 0/0
        and the estimate is nan — the reference's raw determinant ratio
        (multi_ess.py:6-14) yields exactly the same."""
        x = RNG.normal(size=(500, 3))
        x[:, 2] = 1.0
        with np.errstate(invalid="ignore"):
            assert np.isnan(st.multi_ess(x, method="iid"))

    def test_rhat_converged_near_one(self):
        x = RNG.normal(size=(4, 2000, 3))
        rhat, imag, w, b, w_pd, b_pd = st.multi_rhat(x, method="iid")
        assert abs(rhat - 1.0) < 0.1
        assert imag == 0.0

    def test_rhat_diverged_large(self):
        x = RNG.normal(size=(4, 500, 2))
        x[0] += 10.0
        rhat, *_ = st.multi_rhat(x, method="iid")
        assert rhat > 2.0


class TestMMD:
    def test_gram_matches_pointwise(self):
        for kernel in [IsoSEKernel(scale=2.0, l=0.5), PeriodicKernel(l=0.8, p=1.5), RQKernel(a=2.0)]:
            x1 = RNG.normal(size=(5, 3))
            x2 = RNG.normal(size=(4, 3))
            gram = np.asarray(kernel.gram(jnp.asarray(x1), jnp.asarray(x2)))
            for i in range(5):
                for j in range(4):
                    np.testing.assert_allclose(
                        gram[i, j], float(kernel.k(jnp.asarray(x1[i]), jnp.asarray(x2[j]))),
                        rtol=1e-8, atol=1e-10)

    def test_mmd_same_dist_small(self):
        kernel = IsoSEKernel()
        x1 = RNG.normal(size=(200, 2))
        x2 = RNG.normal(size=(200, 2))
        x3 = RNG.normal(size=(200, 2)) + 5.0
        near = float(st.mmd(jnp.asarray(x1), jnp.asarray(x2), kernel))
        far = float(st.mmd(jnp.asarray(x1), jnp.asarray(x3), kernel))
        assert near < 0.15
        assert far > 5 * near

    def test_unbiased_sq_mmd(self):
        kernel = IsoSEKernel()
        x1 = RNG.normal(size=(50, 2))
        x2 = RNG.normal(size=(60, 2))
        b = float(st.squared_mmd(jnp.asarray(x1), jnp.asarray(x2), kernel, biased=True))
        u = float(st.squared_mmd(jnp.asarray(x1), jnp.asarray(x2), kernel, biased=False))
        assert abs(b - u) < 0.1


class TestStreamingMeans:
    def test_recursive_mean(self):
        xs = RNG.normal(size=(20, 3))
        mean = jnp.zeros(3)
        for n, x in enumerate(xs, start=1):
            mean = st.recursive_mean(mean, n, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(mean), xs.mean(0), rtol=1e-10)

    def test_running_mean(self):
        xs = RNG.normal(size=(10, 2))
        rm = np.asarray(st.running_mean(jnp.asarray(xs), axis=0))
        expected = np.cumsum(xs, axis=0) / np.arange(1, 11)[:, None]
        np.testing.assert_allclose(rm, expected, rtol=1e-12)

    def test_recursive_cov(self):
        """The recursion preserves cov_k = (sum_i x_i x_i' - (k+1) m_k m_k')/k
        — the same closed form AM's set_recursive_cov uses (reference
        am.py:57-59) — when seeded with cov_1 = -x_1 x_1'."""
        xs = RNG.normal(size=(30, 2))
        mean = jnp.asarray(xs[0])
        cov = -jnp.outer(mean, mean)
        for n in range(2, 31):
            new_mean = st.recursive_mean(mean, n, jnp.asarray(xs[n - 1]))
            cov = st.recursive_cov(cov, new_mean, mean, n, jnp.asarray(xs[n - 1]))
            mean = new_mean
        k = 30
        m = xs.mean(0)
        expected = (xs.T @ xs - (k + 1) * np.outer(m, m)) / k
        np.testing.assert_allclose(np.asarray(cov), expected, rtol=1e-8)


class TestSoftAbs:
    def test_pd_ification(self):
        a = np.diag([2.0, -1.0, 0.5])
        out = np.asarray(st.softabs(jnp.asarray(a), a=1000.0))
        np.testing.assert_allclose(np.diag(out), [2.0, 1.0, 0.5], rtol=1e-3)
        assert is_pos_def((out + out.T) / 2)


class TestNearestPD:
    def test_projects_to_pd(self):
        a = np.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
        out = nearest_pd(a)
        assert is_pos_def(out)

    def test_pd_input_unchanged(self):
        a = np.array([[2.0, 0.3], [0.3, 1.0]])
        np.testing.assert_allclose(nearest_pd(a), a, atol=1e-12)


class TestChunkEvenly:
    @pytest.mark.parametrize("total,n,expected", [
        (7, 3, [[0, 1, 2, 3], [4, 5, 6]]),
        (6, 3, [[0, 1, 2], [3, 4, 5]]),
        (8, 3, [[0, 1, 2, 3], [4, 5, 6, 7]]),
        (2, 3, []),
        (3, 3, [[0, 1, 2]]),
    ])
    def test_cases(self, total, n, expected):
        assert list(chunk_evenly(list(range(total)), n)) == expected


class TestChooseFromSubset:
    def test_never_picks_excluded(self):
        import jax

        keys = jax.random.split(jax.random.PRNGKey(0), 200)
        picks = [int(st.choose_from_subset(k, 6, [1, 4])) for k in keys]
        assert set(picks) <= {0, 2, 3, 5}
        assert len(set(picks)) == 4
