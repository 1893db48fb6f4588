import jax.numpy as jnp


def default_float():
    """Default floating dtype: float64 when x64 is enabled (parity runs on
    CPU), else float32 (TPU speed runs).

    The reference defaults to torch.float64 (/root/reference/eeyore/models/model.py:7);
    on TPU f64 is emulated and slow, so speed runs use f32.
    """
    return jnp.zeros((), dtype=float).dtype
