"""Degree-independent sampling for hub nodes: alias draws + rejection.

The fused-row kernels (``ops/transition.py``) are O(dpad) per walker per
step — unbeatable for bounded degrees, impossible for power-law hubs. For
steps touching a hub (degree > degree_cap) this module samples the *exact*
same transition distribution with O(1) memory transactions per trial,
regardless of degree:

1. **Proposal**: draw x ~ w(cur, .) — the first-order distribution. Hub
   rows draw from their packed alias rows (ONE 8-lane gather: the row
   carries the acceptance probability plus the neighbor/weight of the slot
   and of its alias target, ``ops/hubs.py``); capped rows draw from their
   carried fused row (pure VPU cumsum, no memory).
2. **Bias evaluation** for the single candidate x: the node2vec factor
   alpha(x) in {1/p, 1, 1/q} (or the node2vec+ continuous alpha) needs one
   membership test "is x a neighbor of prev" — ONE 8-lane gather of the
   hub's hash bucket, or a compare against prev's carried fused row.
3. **Accept** with probability alpha(x) / alpha_max where
   alpha_max = max(1/p, 1, 1/q) bounds every factor; otherwise retry.

This is the classic rejection formulation of second-order walks (used by
CPU/GPU systems like KnightKing) recast for TPU. The batch dimension makes
the naive loop-until-everyone-accepts catastrophic — the max of B~1e5
geometric variables is ~30 rounds — so the sampler:

* draws ``T`` candidates per walker per round and keeps the first
  accepted (iid trials, so still exact rejection);
* after the first full-batch round, *compacts* the unaccepted lanes into
  a 4x smaller sub-batch each ``while_loop`` sweep, so tail rounds cost a
  fraction of a full round.

A safety cap bounds the loop for degenerate p/q; lanes still unaccepted
at the cap keep their last proposal (probability <= (1-a)^(cap*T) —
negligible for any sane bias).
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pecanpy_tpu.ops import hubs as hubs_lib
from pecanpy_tpu.ops import sampling
from pecanpy_tpu.ops.layout import DeviceCSR
from pecanpy_tpu.ops.transition import row_thresholds

_EPS = 1e-30
_KNUTH = np.uint32(2654435761)  # plain numpy: no backend init at import

# Knobs swept on v5e (benchmarks/tune_rejection.py, 1M-node Chung-Lu
# mixed batch): sweeps dominate the cost, so round 0 stays lean (2
# trials), the compacted sub-batch is small (B/8), and each sweep packs
# 16 trials per lane to drain its queue in one pass. 84.5 -> 41.7 ms per
# step vs the round-1 defaults (4, 8, 4).
FIRST_ROUND_TRIALS = 2  # candidates per lane in the full-batch round
SWEEP_TRIALS = 16  # candidates per lane in each compacted sweep
COMPACT_FRACTION = 8  # sub-batch = B / COMPACT_FRACTION
SWEEP_CAP = 256  # hard bound on while_loop sweeps (safety, never hit)


def alias_propose(
    dg: DeviceCSR, key: jax.Array, cur_rows: jax.Array, shape
) -> Tuple[jax.Array, jax.Array]:
    """Hub-path proposal: one packed alias-row gather per candidate.

    Args:
        shape: candidate shape, either (B,) or (B, T).

    Returns (x, w(cur, x)); only meaningful where the row is a hub.
    """
    k_slot, k_acc = jax.random.split(key)
    deg = dg.rows_degree(cur_rows)
    base = dg.rows_edge_base(cur_rows)
    if len(shape) == 2:
        deg = deg[:, None]
        base = base[:, None]
    kk = jax.random.randint(k_slot, shape, 0, jnp.maximum(deg, 1))
    rows = dg.fetch_edge_slots(base + kk.astype(jnp.int32))
    take_self = (
        jax.random.uniform(k_acc, shape) < rows[..., hubs_lib.EP_ACCEPT]
    )
    nbr_pair = jax.lax.bitcast_convert_type(
        rows[..., [hubs_lib.EP_NBR_SELF, hubs_lib.EP_NBR_ALIAS]], jnp.int32
    )
    x = jnp.where(take_self, nbr_pair[..., 0], nbr_pair[..., 1])
    w = jnp.where(
        take_self,
        rows[..., hubs_lib.EP_WGT_SELF],
        rows[..., hubs_lib.EP_WGT_ALIAS],
    )
    return x, w


def fused_propose(
    dg: DeviceCSR, key: jax.Array, cur_rows: jax.Array, shape, use_cdf: bool
) -> Tuple[jax.Array, jax.Array]:
    """Capped-row proposal from the carried fused row (pure VPU)."""
    if use_cdf:
        cdf = dg.rows_cdf(cur_rows)
    else:
        cdf = jnp.cumsum(dg.rows_wgt(cur_rows), axis=-1)
    total = cdf[:, -1:]
    u = jax.random.uniform(key, shape, dtype=cdf.dtype)
    if len(shape) == 2:
        c = jnp.sum(cdf[:, None, :] < (u[..., None] * total[:, None]), -1)
    else:
        c = jnp.sum(cdf < u[:, None] * total, -1)
    c = jnp.minimum(c, cdf.shape[-1] - 1)
    cols = jnp.arange(cdf.shape[-1], dtype=jnp.int32)
    onehot = cols == c[..., None]
    nbr = dg.rows_nbr(cur_rows)
    wgt = dg.rows_wgt(cur_rows)
    if len(shape) == 2:
        nbr, wgt = nbr[:, None, :], wgt[:, None, :]
    x = jnp.sum(jnp.where(onehot, nbr, 0), -1)
    w = jnp.sum(jnp.where(onehot, wgt, 0.0), -1)
    return x, w


def propose(
    dg: DeviceCSR,
    key: jax.Array,
    cur_rows: jax.Array,
    shape=None,
    use_cdf: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """First-order draw x ~ w(cur, .), hub and capped paths combined."""
    if shape is None:
        shape = (cur_rows.shape[0],)
    k_hub, k_small = jax.random.split(key)
    x_s, w_s = fused_propose(dg, k_small, cur_rows, shape, use_cdf)
    if not dg.has_hubs:
        return x_s, w_s
    x_h, w_h = alias_propose(dg, k_hub, cur_rows, shape)
    is_hub = dg.rows_is_hub(cur_rows)
    if len(shape) == 2:
        is_hub = is_hub[:, None]
    return jnp.where(is_hub, x_h, x_s), jnp.where(is_hub, w_h, w_s)


def uniform_propose(
    dg: DeviceCSR, key: jax.Array, cur_rows: jax.Array
) -> jax.Array:
    """Uniform neighbor draw (FirstOrderUnweighted), hub-aware."""
    deg = dg.rows_degree(cur_rows)
    kk = jax.random.randint(
        key, deg.shape, 0, jnp.maximum(deg, 1)
    ).astype(jnp.int32)
    x_s = sampling.pick_int_columns(dg.rows_nbr(cur_rows), kk)
    if not dg.has_hubs:
        return x_s
    rows = dg.fetch_edge_slots(dg.rows_edge_base(cur_rows) + kk)
    x_h = jax.lax.bitcast_convert_type(
        rows[..., hubs_lib.EP_NBR_SELF], jnp.int32
    )
    return jnp.where(dg.rows_is_hub(cur_rows), x_h, x_s)


def membership(
    dg: DeviceCSR,
    x: jax.Array,
    prev_rows: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """(x in nbr(prev), w(prev, x)) — bucket probe or carried-row compare.

    The degree-independent replacement for the reference's sorted-merge
    ``isnotin`` / ``isnotin_extended`` (``sparse_rw.py:142-295``) for
    per-walker candidates. ``x`` may be [B] or [B, T].
    """
    batched = x.ndim == 2
    pn = dg.rows_nbr(prev_rows)
    pw = dg.rows_wgt(prev_rows)
    if batched:
        pn, pw = pn[:, None, :], pw[:, None, :]
    eq = pn == x[..., None]
    found_s = jnp.any(eq, axis=-1)
    w_s = jnp.sum(jnp.where(eq, pw, 0.0), axis=-1)
    if not dg.has_hubs:
        return found_s, w_s

    hbase, hlog = dg.rows_hash_meta(prev_rows)
    if batched:
        hbase, hlog = hbase[:, None], hlog[:, None]
    mask = (
        jnp.uint32(1) << jnp.clip(hlog, 0, 30).astype(jnp.uint32)
    ) - jnp.uint32(1)
    bucket = hbase + ((x.astype(jnp.uint32) * _KNUTH) & mask).astype(
        jnp.int32
    )
    keys, vals = dg.fetch_bucket(bucket)  # one 64-lane gather
    hit = keys == x[..., None]
    found_h = jnp.any(hit, axis=-1)
    w_h = jnp.sum(jnp.where(hit, vals, 0.0), axis=-1)

    is_hub = dg.rows_is_hub(prev_rows)
    if batched:
        is_hub = is_hub[:, None]
    return (
        jnp.where(is_hub, found_h, found_s),
        jnp.where(is_hub, w_h, w_s),
    )


def _bias(
    dg: DeviceCSR,
    x: jax.Array,
    wx: jax.Array,
    prev: jax.Array,
    cur_rows: jax.Array,
    prev_rows: jax.Array,
    p: float,
    q: float,
    extend: bool,
) -> jax.Array:
    """node2vec / node2vec+ bias factor alpha(x) for single candidates.

    Mirrors the fused kernels (``transition.node2vec_weights_rows`` /
    ``node2vec_plus_weights_rows``) evaluated per candidate. ``x`` may be
    [B] or [B, T].
    """
    batched = x.ndim == 2
    found, wpx = membership(dg, x, prev_rows)
    is_prev = x == (prev[:, None] if batched else prev)
    inv_q = 1.0 / q
    if not extend:
        return jnp.where(is_prev, 1.0 / p, jnp.where(found, 1.0, inv_q))

    theta_x = jnp.maximum(dg.threshold[x], _EPS)
    theta_cur = row_thresholds(dg, cur_rows, dg.gamma)
    if dg.has_hubs:
        theta_cur = jnp.where(
            dg.rows_is_hub(cur_rows),
            dg.rows_hub_threshold(cur_rows),
            theta_cur,
        )
    if batched:
        theta_cur = theta_cur[:, None]

    loose = wpx < theta_x
    is_out = jnp.where(found, loose, True) & ~is_prev
    t = jnp.where(found & is_out, wpx / theta_x, 0.0)
    alpha_out = inv_q + (1.0 - inv_q) * t
    noisy = wx < theta_cur
    alpha_out = jnp.where(noisy, jnp.minimum(1.0, inv_q), alpha_out)
    return jnp.where(is_prev, 1.0 / p, jnp.where(is_out, alpha_out, 1.0))


def _trial_block(
    dg, key, prev, cur_rows, prev_rows, p, q, extend, alpha_np, trials,
    theta=None, wp=None,
):
    """T iid proposals per lane; return (first accepted or last, any ok).

    ``alpha_np`` bounds the bias over non-return candidates
    (max(1, 1/q)). With the return-edge atom (``theta``/``wp`` set), a
    proposal is the previous node with probability theta and a
    first-order draw otherwise; x == prev always accepts (see module
    docstring — exactness verified against the plain construction).
    Without the atom, alpha_np must also bound 1/p.
    """
    b = prev.shape[0]
    k_prop, k_acc, k_atom = jax.random.split(key, 3)
    x, wx = propose(dg, k_prop, cur_rows, (b, trials))
    if theta is not None:
        atom = jax.random.uniform(k_atom, (b, trials)) < theta[:, None]
        x = jnp.where(atom, prev[:, None], x)
        wx = jnp.where(atom, wp[:, None], wx)
    alpha = _bias(dg, x, wx, prev, cur_rows, prev_rows, p, q, extend)
    accept = alpha / alpha_np
    if theta is not None:
        accept = jnp.where(x == prev[:, None], 1.0, accept)
    ok = jax.random.uniform(k_acc, (b, trials)) < accept
    first = jnp.argmax(ok, axis=1)  # first True column (0 if none)
    chosen_ok = sampling.pick_int_columns(x, first.astype(jnp.int32))
    chosen = jnp.where(jnp.any(ok, 1), chosen_ok, x[:, -1])
    return chosen, jnp.any(ok, 1)


def second_order_sample(
    dg: DeviceCSR,
    key: jax.Array,
    cur: jax.Array,
    prev: jax.Array,
    cur_rows: jax.Array,
    prev_rows: jax.Array,
    p: float,
    q: float,
    extend: bool,
    active: jax.Array,
) -> jax.Array:
    """Exact 2nd-order transition draw by rejection, O(1) per trial.

    Args:
        active: [B] bool — lanes that need a rejection-path sample (the
            rest are pre-accepted so the loop never waits on them).

    Returns [B] int32 samples (valid where active).
    """
    b = cur.shape[0]
    alpha_np = max(1.0, 1.0 / q)  # bound over non-return candidates
    excess = max(1.0 / p - alpha_np, 0.0)
    if excess > 0.0:
        # return-edge atom: propose x = prev with the exact mixture mass,
        # removing the 1/p factor from the rejection bound
        _, wp = membership(dg, prev, cur_rows)
        wsum = jnp.sum(dg.rows_wgt(cur_rows), axis=-1)
        if dg.has_hubs:
            wsum = jnp.where(
                dg.rows_is_hub(cur_rows), dg.rows_hub_wsum(cur_rows), wsum
            )
        theta = wp * excess / (wp * excess + alpha_np * jnp.maximum(wsum, _EPS))
        wp_arr = wp
    else:
        theta, wp_arr = None, None

    def sub(arr, idx):
        return None if arr is None else arr[idx]

    # round 0: full batch, T candidates each
    x0, ok0 = _trial_block(
        dg,
        jax.random.fold_in(key, 0),
        prev,
        cur_rows,
        prev_rows,
        p,
        q,
        extend,
        alpha_np,
        FIRST_ROUND_TRIALS,
        theta,
        wp_arr,
    )
    nxt = jnp.where(active, x0, cur)
    accepted = ~active | ok0

    # compacted sweeps: only the unaccepted lanes, S = B / COMPACT_FRACTION
    s = min(max(-(-b // COMPACT_FRACTION), 8), b)
    lanes = jnp.arange(b, dtype=jnp.int32)

    # When the hub tables are row-sharded (parallel/distgraph.py), every
    # fetch inside the sweep is a collective — all shards must take the
    # same number of sweeps or the collectives deadlock, so the loop
    # condition is the psum-shared global pending count.
    sync_axis = getattr(dg, "loop_sync_axis", None)

    def pending_of(accepted):
        n_pend = jnp.sum(~accepted)
        if sync_axis is not None:
            n_pend = jax.lax.psum(n_pend, sync_axis)
        return n_pend

    def cond(state):
        # the count is computed in the body and carried (a collective in
        # the cond itself would not lower under shard_map)
        _, _, pend, t = state
        return (pend > 0) & (t < SWEEP_CAP)

    def body(state):
        nxt, accepted, _, t = state
        unacc = ~accepted
        pos = jnp.cumsum(unacc) - 1
        slot_lane = (
            jnp.zeros(b, dtype=jnp.int32)
            .at[jnp.where(unacc, pos, b)]
            .set(lanes, mode="drop")
        )
        idx = slot_lane[:s]  # first S unaccepted lanes
        valid = jnp.arange(s) < jnp.sum(unacc)

        x_sub, ok_sub = _trial_block(
            dg,
            jax.random.fold_in(key, 1 + t),
            prev[idx],
            cur_rows[idx],
            prev_rows[idx],
            p,
            q,
            extend,
            alpha_np,
            SWEEP_TRIALS,
            sub(theta, idx),
            sub(wp_arr, idx),
        )
        take = valid & ok_sub
        scatter_to = jnp.where(take, idx, b)
        nxt = nxt.at[scatter_to].set(x_sub, mode="drop")
        accepted = accepted.at[scatter_to].set(True, mode="drop")
        # safety-cap fallback: keep the freshest proposal
        fb_to = jnp.where(valid & ~ok_sub & (t + 1 >= SWEEP_CAP), idx, b)
        nxt = nxt.at[fb_to].set(x_sub, mode="drop")
        return nxt, accepted, pending_of(accepted), t + 1

    nxt, accepted, _, _ = jax.lax.while_loop(
        cond, body, (nxt, accepted, pending_of(accepted), jnp.int32(0))
    )
    return nxt
