"""The batched walk engine: one ``lax.scan`` over steps, B walkers at once.

The reference drives each walk with a scalar Python loop compiled by Numba
(``Base._random_walks``, ``pecanpy.py:164-210``), parallelized with
``prange`` threads over walks. The TPU formulation inverts the loop nest:
the *batch* axis holds thousands of walkers advancing in lockstep, and the
sequential walk-length axis is a compiled ``lax.scan``.

Memory discipline (the perf-critical design point): the fused rows of the
current AND previous node ride in the scan carry, so each step performs
exactly ONE table gather — fetching the fused row of the node just stepped
to. The previous node's row is last step's current row, renamed. On v5e
this single >=256-byte-row gather hits XLA's fast gather path; the
membership test, bias, CDF sampling, and the next-node pick are all pure
VPU work on register-resident rows (measured ~7x over the naive
4-gathers-per-step formulation).

Every mode plugs into the engine through two step callables:

    first_fn(key, cur, cur_rows)                  -> next   (1st-order)
    step_fn(key, cur, prev, cur_rows, prev_rows)  -> next   (2nd-order)

Walk semantics preserved from the reference (``pecanpy.py:180-206``):

* column 0 holds the start node; steps fill columns 1..L;
* a walker whose current node has no neighbors stops: the *effective
  length* records how many valid entries the walk has (L+1 when it never
  stopped, j when the node reached at column j-1 had no out-edges);
* dead walkers keep emitting their resting node, which is never read
  because consumers cut each walk at its effective length.
"""
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from pecanpy_tpu.ops.layout import DeviceCSR

FirstFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]
StepFn = Callable[
    [jax.Array, jax.Array, jax.Array, jax.Array, jax.Array], jax.Array
]


def generate_walks(
    graph: DeviceCSR,
    first_fn: FirstFn,
    step_fn: StepFn,
    start: jax.Array,
    key: jax.Array,
    walk_length: int,
) -> Tuple[jax.Array, jax.Array]:
    """Advance a batch of walkers ``walk_length`` steps.

    Args:
        graph: fused device CSR.
        first_fn / step_fn: mode-specific transition samplers (see module
            docstring for signatures).
        start: [B] int32 start nodes.
        key: PRNG key for the whole batch.
        walk_length: number of steps L (static).

    Returns:
        walks: [B, L + 1] int32 node indices, column 0 = start.
        eff_len: [B] int32 effective walk lengths in [1, L + 1].
    """
    sentinel = graph.num_nodes
    key_first, key_rest = jax.random.split(key)

    start_rows = graph.gather_rows(start)
    alive0 = graph.rows_nbr(start_rows)[:, 0] != sentinel
    first = first_fn(key_first, start, start_rows)
    col1 = jnp.where(alive0, first, start)
    eff0 = jnp.where(alive0, walk_length + 1, 1).astype(jnp.int32)

    if walk_length == 1:
        return jnp.stack([start, col1], axis=1), eff0

    col1_rows = graph.gather_rows(col1)

    def body(carry, inp):
        cur, prev, cur_rows, prev_rows, alive, eff = carry
        step_idx, step_key = inp
        has = graph.rows_nbr(cur_rows)[:, 0] != sentinel
        eff = jnp.where(alive & ~has, step_idx, eff)
        alive = alive & has
        nxt = step_fn(step_key, cur, prev, cur_rows, prev_rows)
        nxt = jnp.where(alive, nxt, cur)
        nxt_rows = graph.gather_rows(nxt)  # THE one gather per step
        return (nxt, cur, nxt_rows, cur_rows, alive, eff), nxt

    step_ids = jnp.arange(2, walk_length + 1, dtype=jnp.int32)
    step_keys = jax.random.split(key_rest, walk_length - 1)
    carry0 = (col1, start, col1_rows, start_rows, alive0, eff0)
    (_, _, _, _, _, eff_len), cols = jax.lax.scan(
        body, carry0, (step_ids, step_keys)
    )

    walks = jnp.concatenate(
        [start[:, None], col1[:, None], cols.T.astype(jnp.int32)], axis=1
    )
    return walks, eff_len
