import numpy as np
import jax.numpy as jnp

from biograph_tpu.ops.pallas_rank import rank_cum_pallas, rank_cum_reference


def test_pallas_rank_cum_matches_reference(rng):
    for n in (1, 100, 2048, 5000, 70000):
        w = rng.integers(0, 2**32, size=n, dtype=np.uint32)
        a = np.asarray(rank_cum_pallas(jnp.asarray(w), interpret=True))
        b = np.asarray(rank_cum_reference(jnp.asarray(w)))
        assert (a == b).all(), n
