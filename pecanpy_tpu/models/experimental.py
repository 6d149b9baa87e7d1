"""Experimental walk modes."""
import jax.numpy as jnp

from pecanpy_tpu.models.modes import _DenseModeBase
from pecanpy_tpu.ops import sampling, transition


class Node2vecPlusPlus(_DenseModeBase):
    """Continuous node2vec++ bias walks (experimental).

    Reference: ``experimental.py:8-102``. Uses the dedicated continuous
    bias kernel for every 2nd-order step; first steps are plain 1st-order.
    Always consumes the noise thresholds (independent of ``extend``).
    """

    def make_step_fns(self):
        p, q = self.p, self.q

        def first_fn(dg, aux, key, cur):
            weights = transition.first_order_weights(dg, cur)
            choice = sampling.categorical_rows(key, weights)
            return jnp.take_along_axis(dg.nbr[cur], choice[:, None], axis=1)[:, 0]

        def step_fn(dg, aux, key, cur, prev):
            weights = transition.node2vec_pp_weights(dg, cur, prev, p, q)
            choice = sampling.categorical_rows(key, weights)
            return jnp.take_along_axis(dg.nbr[cur], choice[:, None], axis=1)[:, 0]

        return first_fn, step_fn
