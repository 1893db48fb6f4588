"""Columnar in-memory chain record.

The canonical representation here is ONE stacked array per recorded key,
because on TPU a whole chain materializes at once out of ``lax.scan``
(``from_arrays``). A streaming ``update(state)`` path is kept for
reference-style row-at-a-time recording (reference API:
/root/reference/eeyore/chains/chain_list.py:12-141, which stores python lists
of tensors); appended rows live in a staging buffer that is consolidated into
the column arrays on first read.
"""

import numpy as np

from pathlib import Path

import eeyore_tpu.stats as st
from eeyore_tpu.chains.chain import Chain

_EMPTY = np.zeros((0,))


class ChainList(Chain):
    def __init__(self, keys=("sample", "target_val", "accepted"), vals=None):
        self.reset(keys=keys, vals=vals)

    def reset(self, keys=("sample", "target_val", "accepted"), vals=None):
        if vals is not None:
            keys = tuple(vals.keys())
        self._keys = tuple(keys)
        self._columns = {}
        self._staging = {k: list(vals[k]) if vals is not None else [] for k in self._keys}

    @classmethod
    def from_arrays(cls, arrays):
        """Adopt stacked arrays {key: [n_iter, ...]} from a scanned run
        wholesale — zero-copy beyond the device->host transfer."""
        chain = cls(keys=tuple(arrays))
        chain._columns = {k: np.asarray(v) for k, v in arrays.items()}
        return chain

    # ---- columnar core ----

    def keys(self):
        return self._keys

    def column(self, key):
        """The consolidated [n_iter, ...] array for one recorded key."""
        pending = self._staging.get(key)
        if pending:
            tail = np.stack([np.asarray(r) for r in pending])
            head = self._columns.get(key)
            self._columns[key] = tail if head is None or head.size == 0 \
                else np.concatenate([head, tail], axis=0)
            pending.clear()
        got = self._columns.get(key)
        return _EMPTY if got is None else got

    @property
    def vals(self):
        """Reference-compatible dict-of-rows view of the columns."""
        return {k: list(self.column(k)) for k in self._keys}

    def update(self, state):
        for k in self._keys:
            self._staging[k].append(state[k])

    # ---- shape / row accessors ----

    def __repr__(self):
        return f"Markov chain containing {len(self)} samples."

    def __len__(self):
        head = self._columns.get("sample")
        return len(self._staging.get("sample", ())) + (0 if head is None else head.shape[0])

    def num_samples(self):
        return len(self)

    def num_params(self):
        return self.column("sample").shape[-1]

    def get_samples(self):
        return self.column("sample")

    def get_sample(self, idx):
        return self.column("sample")[idx]

    def get_param(self, idx):
        return self.column("sample")[:, idx]

    def get_target_vals(self):
        return self.column("target_val")

    def get_grad_vals(self):
        return self.column("grad_val")

    def get_grad_val(self, idx):
        return self.column("grad_val")[idx]

    def state(self, idx=-1):
        current = {}
        for k in self._keys:
            col = self.column(k)
            if -len(col) <= idx < len(col):
                current[k] = col[idx]
            else:
                print(f"WARNING: chain does not have values for {k}.")
        return current

    # ---- statistics (same surface as reference chain_list.py:69-102) ----

    def mean(self):
        return self.get_samples().mean(axis=0)

    def running_mean(self, idx):
        return np.asarray(st.running_mean(self.get_param(idx)))

    def running_means(self):
        return np.asarray(st.running_mean(self.get_samples(), axis=0))

    def mc_cov(self, method="inse", adjust=False):
        return st.mc_cov(self.get_samples(), method=method, adjust=adjust, rowvar=False)

    def mc_se(self, mc_cov_mat=None, method="inse", adjust=False):
        if mc_cov_mat is not None:
            return st.mc_se_from_cov(mc_cov_mat)
        return st.mc_se(self.get_samples(), method=method, adjust=adjust, rowvar=False)

    def mc_cor(self, mc_cov_mat=None, method="inse", adjust=False):
        if mc_cov_mat is not None:
            return st.cor_from_cov(mc_cov_mat)
        return st.mc_cor(self.get_samples(), method=method, adjust=adjust, rowvar=False)

    def multi_ess(self, mc_cov_mat=None, method="inse", adjust=False):
        return st.multi_ess(self.get_samples(), mc_cov_mat=mc_cov_mat,
                            method=method, adjust=adjust)

    def acceptance_rate(self):
        return float(np.sum(self.column("accepted")) / len(self))

    def block_acceptance_rate(self):
        return self.column("accepted").mean(axis=0)

    # ---- persistence / conversion ----

    def save(self, path):
        np.savez(path, **{k: self.column(k) for k in self._keys})

    def load(self, path):
        name = str(path)
        with np.load(name if name.endswith(".npz") else name + ".npz") as data:
            self._keys = tuple(data.files)
            self._columns = {k: data[k] for k in data.files}
            self._staging = {k: [] for k in data.files}

    def to_chainfile(self, keys=None, path=None, mode="a", fmt=None):
        """Stream every recorded column to reference-format CSVs (one file per
        key) in a single pass per key via ChainFile.update_all."""
        from eeyore_tpu.chains.chain_file import ChainFile

        keys = tuple(keys) if keys is not None else self._keys
        chainfile = ChainFile(keys=keys, path=Path(path) if path else Path.cwd(), mode=mode)
        chainfile.update_all({k: self.column(k) for k in keys}, fmt=fmt)
        chainfile.close()
        return chainfile

    def to_kanga(self, keys=None):
        """Convert to ``kanga.chains.ChainArray`` for kanga's plotting stack
        (reference chain_list.py:126-141); kanga is an optional dependency."""
        try:
            from kanga.chains import ChainArray
        except ImportError as e:
            raise ImportError(
                "ChainList.to_kanga requires the optional 'kanga' package "
                "(pip install kanga)") from e

        wanted = set(keys or self._keys) & {"sample", "target_val", "grad_val", "accepted"}
        return ChainArray({k: self.column(k) for k in wanted})
