"""Streaming CSV chain persistence: one file per key in a directory.

Reference: /root/reference/eeyore/chains/chain_file.py:9-81 — per-key CSV files
(sample.csv, target_val.csv, ...) with %.18e float / %d int formats, append
mode by default, parse-back via ``to_chainlist``. This is the checkpoint /
large-run-output mechanism; formats are kept CSV-compatible with the
reference so chains interoperate.

Unlike the reference (which opens and closes every file per update), files
stay open across updates unless ``close=True`` — and ``update_all`` streams a
whole stacked chain through numpy.savetxt in one call.
"""

import numpy as np

from pathlib import Path

from eeyore_tpu.chains.chain import Chain

DEFAULT_FMT = {"sample": "%.18e", "target_val": "%.18e", "grad_val": "%.18e",
               "momentum": "%.18e", "hamiltonian": "%.18e", "accepted": "%d"}


class ChainFile(Chain):
    def __init__(self, keys=("sample", "target_val", "accepted"), path=None, mode="a"):
        self.path = Path(path) if path is not None else Path.cwd()
        self.mode = mode
        self.path.mkdir(parents=True, exist_ok=True)
        self.reset(keys=keys)

    def reset(self, keys=("sample", "target_val", "accepted")):
        self.vals = {key: open(self.path / (key + ".csv"), self.mode) for key in keys}

    def close(self):
        for f in self.vals.values():
            f.close()

    def update(self, state, reset=True, close=True, fmt=None):
        fmt = fmt or DEFAULT_FMT
        if reset:
            self.reset(keys=self.vals.keys())
        for key, f in self.vals.items():
            v = state[key]
            if hasattr(v, "__array__"):
                np.savetxt(f, np.asarray(v).ravel()[np.newaxis], fmt=fmt.get(key, "%.18e"), delimiter=",")
            else:
                f.write(str(v) + "\n")
        if close:
            self.close()

    def update_all(self, arrays, fmt=None):
        """Stream stacked arrays {key: [n_iter, ...]} in one pass per key —
        through the native C++ writer (eeyore_tpu.native.chainstore) when
        available, else numpy.savetxt."""
        from eeyore_tpu import native

        fmt = fmt or DEFAULT_FMT
        self.close()  # the native writer appends to the files directly
        for key in self.vals.keys():
            a = np.asarray(arrays[key])
            a2 = a.reshape(a.shape[0], -1)
            path = self.path / (key + ".csv")
            if not native.write_csv(path, a2, mode=self.mode):
                with open(path, self.mode) as f:
                    np.savetxt(f, a2, fmt=fmt.get(key, "%.18e"), delimiter=",")

    def to_chainlist(self, keys=None, dtype=np.float64):
        from eeyore_tpu import native
        from eeyore_tpu.chains.chain_list import ChainList

        def load(fpath):
            """Native strtod parser when available, numpy.loadtxt otherwise;
            always a 2-D float64 [rows, cols] array."""
            parsed = native.read_csv(fpath)
            if parsed is None:
                parsed = np.loadtxt(fpath, delimiter=",", dtype=np.float64, ndmin=2)
            return parsed

        keys = set(keys or self.vals.keys()) & {"sample", "target_val", "grad_val", "accepted"}
        vals = {}
        for key in keys:
            rows = load(self.path / (key + ".csv"))
            if key == "accepted":
                vals[key] = [int(r) for r in rows[:, 0]]
            elif key == "target_val":
                vals[key] = list(rows[:, 0].astype(dtype))
            else:  # sample / grad_val: vector rows
                vals[key] = list(rows.astype(dtype))
        return ChainList(keys=tuple(vals.keys()), vals=vals)
