"""Experimental walk modes."""
from pecanpy_tpu.models.modes import _DenseModeBase
from pecanpy_tpu.ops import sampling, transition


class Node2vecPlusPlus(_DenseModeBase):
    """Continuous node2vec++ bias walks (experimental).

    Reference: ``experimental.py:8-102``. Uses the dedicated continuous
    bias kernel for every 2nd-order step; first steps are plain 1st-order.
    Always consumes the noise thresholds (independent of ``extend``).
    """

    def _build_device_graph(self):
        # Always pack the neighbor-threshold channel (independent of
        # extend); dense-only mode, so fused rows stay uncapped.
        from pecanpy_tpu.ops.layout import device_csr_from_dense

        return device_csr_from_dense(
            self.data, gamma=self.gamma, with_thresholds=True,
            degree_cap=None,
        )

    def make_step_fns(self):
        p, q = self.p, self.q

        def first_fn(dg, aux, key, cur, cur_rows):
            weights = transition.first_order_weights_rows(dg, cur_rows)
            choice = sampling.categorical_rows(key, weights)
            return sampling.pick_int_columns(dg.rows_nbr(cur_rows), choice)

        def step_fn(dg, aux, key, cur, prev, cur_rows, prev_rows):
            weights = transition.node2vec_pp_weights_rows(
                dg, cur_rows, prev_rows, prev, p, q
            )
            choice = sampling.categorical_rows(key, weights)
            return sampling.pick_int_columns(dg.rows_nbr(cur_rows), choice)

        return first_fn, step_fn
