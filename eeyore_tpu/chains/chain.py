"""Chain storage protocol (reference: /root/reference/eeyore/chains/chain.py).

A chain backend needs ``reset`` and ``update(state)``; ``detach_and_update``
is the device-boundary variant — it copies JAX device arrays to host numpy
before recording (the analog of the reference's clone().detach(),
chain.py:12-13) so stored samples never pin device memory.
"""

import numpy as np


def _to_host(value):
    return np.asarray(value) if hasattr(value, "__array__") else value


class Chain:
    def reset(self):
        raise NotImplementedError

    def update(self, state):
        raise NotImplementedError

    def detach_and_update(self, state):
        self.update({key: _to_host(val) for key, val in state.items()})
