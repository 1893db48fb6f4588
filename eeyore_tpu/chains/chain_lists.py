"""Multi-chain container for cross-chain diagnostics.

Reference: /root/reference/eeyore/chains/chain_lists.py:7-155. Samples stack to
[num_chains, num_iters, num_params]; ``multi_rhat`` and the summary aggregator
operate on the full stack.
"""

import numpy as np

import eeyore_tpu.stats as st

from eeyore_tpu.chains.chain_file import ChainFile


class ChainLists:
    def __init__(self, keys=("sample", "target_val", "accepted"), vals=None):
        self.reset(keys=keys, vals=vals)

    def reset(self, keys=("sample", "target_val", "accepted"), vals=None):
        if vals is None:
            self.vals = {key: [] for key in keys}
        else:
            self.vals = vals

    @classmethod
    def from_chain_list(cls, chain_lists, keys=("sample", "target_val", "accepted")):
        common = set.intersection(*[set(c.vals.keys()) for c in chain_lists])
        class_keys = set(keys) & common
        vals = {key: [c.vals[key] for c in chain_lists] for key in class_keys}
        return cls(keys=tuple(class_keys), vals=vals)

    @classmethod
    def from_arrays(cls, arrays):
        """{key: [num_chains, num_iters, ...]} from a vmapped run."""
        vals = {k: [list(np.asarray(chain)) for chain in np.asarray(v)] for k, v in arrays.items()}
        return cls(keys=tuple(arrays.keys()), vals=vals)

    @classmethod
    def from_file(cls, paths, keys=("sample", "target_val", "accepted"), mode="a", dtype=np.float64):
        chain_lists = [ChainFile(keys=keys, path=p, mode=mode).to_chainlist(dtype=dtype) for p in paths]
        return cls.from_chain_list(chain_lists, keys=keys)

    def __repr__(self):
        return f"{len(self)} Markov chains, each containing {self.num_samples()} samples."

    def __len__(self):
        return self.num_chains()

    def num_params(self):
        return len(self.vals["sample"][0][0])

    def num_samples(self):
        return len(self.vals["sample"][0])

    def num_chains(self):
        return len(self.vals["sample"])

    def get_chain(self, idx, key="sample"):
        return np.stack(self.vals[key][idx])

    def get_samples(self):
        return np.stack([self.get_chain(i) for i in range(self.num_chains())])

    def get_target_vals(self):
        return np.stack([self.get_chain(i, key="target_val") for i in range(self.num_chains())])

    def get_grad_vals(self):
        return np.stack([self.get_chain(i, key="grad_val") for i in range(self.num_chains())])

    def mean(self):
        return self.get_samples().mean(axis=1)

    def mean_summary(self, g=lambda x: np.mean(x, axis=0)):
        return g(self.mean())

    def mc_se(self, mc_cov_mat=None, method="inse", adjust=False):
        return np.stack([
            st.mc_se(self.get_chain(i), method=method, adjust=adjust, rowvar=False)
            if mc_cov_mat is None else st.mc_se_from_cov(mc_cov_mat[i])
            for i in range(self.num_chains())
        ])

    def mc_se_summary(self, g=lambda x: np.mean(x, axis=0), mc_cov_mat=None, method="inse", adjust=False):
        return g(self.mc_se(mc_cov_mat=mc_cov_mat, method=method, adjust=adjust))

    def mc_cov(self, method="inse", adjust=False):
        return np.stack([
            st.mc_cov(self.get_chain(i), method=method, adjust=adjust, rowvar=False)
            for i in range(self.num_chains())
        ])

    def mc_cov_summary(self, g=lambda m: np.mean(m, axis=0), method="inse", adjust=False):
        return g(self.mc_cov(method=method, adjust=adjust))

    def mc_cor(self, mc_cov_mat=None, method="inse", adjust=False):
        return np.stack([
            st.mc_cor(self.get_chain(i), method=method, adjust=adjust, rowvar=False)
            if mc_cov_mat is None else st.cor_from_cov(mc_cov_mat[i])
            for i in range(self.num_chains())
        ])

    def mc_cor_summary(self, g=lambda m: np.mean(m, axis=0), mc_cov_mat=None, method="inse", adjust=False):
        return g(self.mc_cor(mc_cov_mat=mc_cov_mat, method=method, adjust=adjust))

    def acceptance(self):
        return [float(np.sum(self.vals["accepted"][i]) / self.num_samples()) for i in range(self.num_chains())]

    def acceptance_summary(self, g=lambda x: sum(x) / len(x)):
        return g(self.acceptance())

    def multi_ess(self, mc_cov_mat=None, method="inse", adjust=False):
        return [
            st.multi_ess(
                self.get_chain(i),
                mc_cov_mat=None if mc_cov_mat is None else mc_cov_mat[i],
                method=method,
                adjust=adjust,
            )
            for i in range(self.num_chains())
        ]

    def multi_ess_summary(self, g=lambda x: sum(x) / len(x), mc_cov_mat=None, method="inse", adjust=False):
        return g(self.multi_ess(mc_cov_mat=mc_cov_mat, method=method, adjust=adjust))

    def multi_rhat(self, mc_cov_mat=None, method="inse", adjust=False):
        return st.multi_rhat(self.get_samples(), mc_cov_mat=mc_cov_mat, method=method, adjust=adjust)

    def summary(self, keys=("multi_ess", "multi_rhat"),
                g_mean_summary=lambda x: np.mean(x, axis=0),
                g_mc_se_summary=lambda x: np.mean(x, axis=0),
                g_acceptance_summary=lambda x: sum(x) / len(x),
                g_multi_ess_summary=lambda x: sum(x) / len(x),
                mc_cov_mat=None, method="inse", adjust=False):
        summaries = {}
        if any(k in keys for k in ("mc_se", "multi_ess", "multi_rhat")) and mc_cov_mat is None:
            mc_cov_mat = self.mc_cov(method=method, adjust=adjust)
        for key in keys:
            if key == "mean":
                summaries[key] = self.mean_summary(g=g_mean_summary)
            elif key == "mc_se":
                summaries[key] = self.mc_se_summary(g=g_mc_se_summary, mc_cov_mat=mc_cov_mat)
            elif key == "acceptance":
                summaries[key] = self.acceptance_summary(g=g_acceptance_summary)
            elif key == "multi_ess":
                summaries[key] = self.multi_ess_summary(g=g_multi_ess_summary, mc_cov_mat=mc_cov_mat)
            elif key == "multi_rhat":
                summaries[key] = self.multi_rhat(mc_cov_mat=mc_cov_mat)[0]
        return summaries
