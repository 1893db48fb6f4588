"""Chain storage base (reference: /root/reference/eeyore/chains/chain.py)."""

import numpy as np


def _to_host(v):
    """Detach-and-copy: device arrays -> host numpy (the analog of the
    reference's clone().detach() before storing, chain.py:12-13)."""
    if hasattr(v, "__array__"):
        return np.asarray(v)
    return v


class Chain:
    def reset(self):
        raise NotImplementedError

    def update(self, state):
        raise NotImplementedError

    def detach_and_update(self, state):
        self.update({k: _to_host(v) for k, v in state.items()})
