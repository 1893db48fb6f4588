"""In-memory chain storage + statistics delegation.

Reference: /root/reference/eeyore/chains/chain_list.py:12-141. Two usage modes:
- streaming ``update(state)`` appends (OO-compatible with the reference),
- ``from_arrays`` wraps the stacked outputs of a scanned sampler wholesale
  (the TPU-native path: the whole chain materializes as [n_iter, ...] arrays
  out of one ``lax.scan``).
"""

import numpy as np

from pathlib import Path

import eeyore_tpu.stats as st
from eeyore_tpu.chains.chain import Chain, _to_host


class ChainList(Chain):
    def __init__(self, keys=("sample", "target_val", "accepted"), vals=None):
        self.reset(keys=keys, vals=vals)

    def reset(self, keys=("sample", "target_val", "accepted"), vals=None):
        if vals is None:
            self.vals = {key: [] for key in keys}
        else:
            self.vals = {k: list(v) for k, v in vals.items()}

    @classmethod
    def from_arrays(cls, arrays):
        """Wrap stacked arrays {key: [n_iter, ...]} from a scanned run."""
        chain = cls(keys=tuple(arrays.keys()))
        for key, stacked in arrays.items():
            stacked = np.asarray(stacked)
            chain.vals[key] = list(stacked)
        return chain

    def __repr__(self):
        return f"Markov chain containing {len(self)} samples."

    def __len__(self):
        return self.num_samples()

    def num_params(self):
        return len(self.get_sample(0))

    def num_samples(self):
        return len(self.vals["sample"])

    def get_param(self, idx):
        return self.get_samples()[:, idx]

    def get_sample(self, idx):
        return self.vals["sample"][idx]

    def get_samples(self):
        return np.stack(self.vals["sample"])

    def get_target_vals(self):
        return np.stack(self.vals["target_val"])

    def get_grad_val(self, idx):
        return self.vals["grad_val"][idx]

    def get_grad_vals(self):
        return np.stack(self.vals["grad_val"])

    def state(self, idx=-1):
        current = {}
        for key, val in self.vals.items():
            try:
                current[key] = val[idx]
            except IndexError:
                print(f"WARNING: chain does not have values for {key}.")
        return current

    def update(self, state):
        for key in self.vals.keys():
            self.vals[key].append(state[key])

    # ---- statistics delegation (reference chain_list.py:69-102) ----

    def mean(self):
        return self.get_samples().mean(axis=0)

    def running_mean(self, idx):
        return np.asarray(st.running_mean(self.get_param(idx)))

    def running_means(self):
        return np.asarray(st.running_mean(self.get_samples(), axis=0))

    def mc_se(self, mc_cov_mat=None, method="inse", adjust=False):
        if mc_cov_mat is None:
            return st.mc_se(self.get_samples(), method=method, adjust=adjust, rowvar=False)
        return st.mc_se_from_cov(mc_cov_mat)

    def mc_cov(self, method="inse", adjust=False):
        return st.mc_cov(self.get_samples(), method=method, adjust=adjust, rowvar=False)

    def mc_cor(self, mc_cov_mat=None, method="inse", adjust=False):
        if mc_cov_mat is None:
            return st.mc_cor(self.get_samples(), method=method, adjust=adjust, rowvar=False)
        return st.cor_from_cov(mc_cov_mat)

    def acceptance_rate(self):
        return float(np.sum(self.vals["accepted"]) / self.num_samples())

    def block_acceptance_rate(self):
        return np.stack(self.vals["accepted"]).sum(axis=0) / self.num_samples()

    def multi_ess(self, mc_cov_mat=None, method="inse", adjust=False):
        return st.multi_ess(self.get_samples(), mc_cov_mat=mc_cov_mat, method=method, adjust=adjust)

    # ---- persistence (reference chain_list.py:104-141) ----

    def save(self, path):
        np.savez(path, **{k: np.stack(v) if len(v) else np.array([]) for k, v in self.vals.items()})

    def load(self, path):
        with np.load(path if str(path).endswith(".npz") else str(path) + ".npz") as data:
            self.vals = {k: list(data[k]) for k in data.files}

    def to_chainfile(self, keys=None, path=None, mode="a",
                     fmt=None):
        from eeyore_tpu.chains.chain_file import ChainFile

        path = Path(path) if path is not None else Path.cwd()
        chainfile = ChainFile(keys=keys or self.vals.keys(), path=path, mode=mode)
        fmt = fmt or {"sample": "%.18e", "target_val": "%.18e", "grad_val": "%.18e", "accepted": "%d"}
        for i in range(len(self)):
            chainfile.update(self.state(i), reset=False, close=False, fmt=fmt)
        chainfile.close()
        return chainfile

    def to_kanga(self, keys=None):
        """Convert to a ``kanga.chains.ChainArray`` for kanga's diagnostics/
        plotting (reference chain_list.py:126-141). kanga is an optional
        dependency — this raises a clear ImportError when it is absent."""
        try:
            from kanga.chains import ChainArray
        except ImportError as e:
            raise ImportError(
                "ChainList.to_kanga requires the optional 'kanga' package "
                "(pip install kanga)") from e

        keys = set(keys or self.vals.keys()) & {
            "sample", "target_val", "grad_val", "accepted"}
        vals = {}
        for key in keys:
            if key == "sample":
                vals[key] = self.get_samples()
            elif key == "target_val":
                vals[key] = self.get_target_vals()
            elif key == "grad_val":
                vals[key] = self.get_grad_vals()
            elif key == "accepted":
                vals[key] = np.asarray(self.vals["accepted"])
        return ChainArray(vals)
