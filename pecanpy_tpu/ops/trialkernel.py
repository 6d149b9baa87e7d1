"""Fused trial-block kernels for the amortized hub walker (TPU Pallas).

One rejection trial in XLA materializes ~10 intermediates in HBM —
the [B, dpad] CDF/compare tensors of the fused-row proposal, the
[B, 64] -> [B, 8] alias sub-row selects, the bucket-key compares, and a
chain of [B] selects. Each is a separate HLO op with its own HBM round
trip, and together they cost more than the (irreducible,
descriptor-bound) gathers themselves: the measured amortized round is
~13.6 ms at T=2 / 131k lanes while its gathers account for ~7.8 ms
(``benchmarks/diag_amortized.py``).

This module fuses ALL the VPU math of a trial block into two Pallas
kernels, keeping the gathers on XLA's native path (a per-lane Pallas DMA
cannot beat the hardware gather engine — issuing 131k small async
copies costs ~µs each against the gather's ~10 ns/row descriptor rate):

    K1 "propose":  carried fused rows + prefetched alias super-rows +
                   per-trial uniforms  ->  (x, w(cur, x)) per trial
    [XLA]          hash-bucket row index from x; one bucket gather
    K2 "accept":   carried prev rows + bucket super-rows + uniforms
                   ->  accept bit per trial

Each kernel reads its fused-row inputs exactly once per round; every
select, compare, prefix-sum, and coin lives in VMEM/registers.

Mosaic layout notes (each learned from a miscompile or lowering error):
per-lane scalars ride as [L, 1] columns (1-D vectors — especially 1-D
bools — do not lower); membership flags stay int32 through selects
(selecting i1 vectors does not lower); and every per-trial operand is
its own ref (multi-column [L, T]/[L, T*64] blocks sliced by trial index
silently produced wrong values for t >= 1 on real hardware).

RNG parity: the wrapper derives the identical `jax.random` stream as
``rejection._single_trial`` (same key-split tree, same draw shapes), so
the kernel path samples the exact same transition law — bit-equal when
the CDF sums are exact (integer weights; the in-kernel log-step prefix
sum and XLA's cumsum then agree), distribution-equal otherwise (float
sum association may differ by 1 ulp at category boundaries).

Scope: plain node2vec (extend=False) on single-device hub graphs — the
power-law hot path. Everything else uses ``rejection._trial_block``
unchanged (``models/engine.py`` routes).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pecanpy_tpu.ops import hubs as hubs_lib
from pecanpy_tpu.ops import rejection
from pecanpy_tpu.ops.layout import EP_SUPER, HB_SUPER, DeviceCSR

LANES = 512  # lanes per grid step (VMEM: ~1.5 MB of row tiles at dpad=128)


def _prefix_sum_lanes(x, width):
    """Inclusive prefix sum along the minor (lane) axis.

    ``jnp.cumsum`` has no Pallas TPU lowering; this is the log-step
    Hillis-Steele form (7 shifted adds at 128 lanes). Association
    differs from XLA's cumsum — identical results for integer weights
    (exact f32 sums), 1-ulp boundary noise for float weights (see
    module docstring).
    """
    acc = x
    s = 1
    while s < width:
        shifted = jnp.pad(acc, ((0, 0), (s, 0)))[:, :width]
        acc = acc + shifted
        s *= 2
    return acc


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _bitcast_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _k1_propose(
    *refs,
    num_nodes: int,
    dpad: int,
    cdf_off: int,  # lane offset of the cdf channel; -1 = sum the wgt
    use_atom: bool,
    trials: int,
):
    """Proposal kernel. Ref layout (all VMEM blocks):

    inputs:  cur [L, C*dpad],
             per trial: alias_t [L, 64], sub_t [L,1] i32,
                        usmall_t [L,1], uself_t [L,1], uatom_t [L,1],
             theta [L,1], wp [L,1], prev [L,1] i32
    outputs: per trial: x_t [L,1] i32, wx_t [L,1] f32
    """
    cur_ref = refs[0]
    per = refs[1 : 1 + 5 * trials]
    theta_ref, wp_ref, prev_ref = refs[1 + 5 * trials : 4 + 5 * trials]
    outs = refs[4 + 5 * trials :]

    nbr = _bitcast_i32(cur_ref[:, :dpad])  # [L, dpad]
    wgt = cur_ref[:, dpad : 2 * dpad]
    is_hub = nbr[:, 0:1] > num_nodes  # [L, 1]
    if cdf_off >= 0:
        cdf = cur_ref[:, cdf_off : cdf_off + dpad]
    else:
        cdf = _prefix_sum_lanes(wgt, dpad)
    total = cdf[:, dpad - 1 : dpad]  # [L, 1]
    lanes = cdf.shape[0]
    j_d = jax.lax.broadcasted_iota(jnp.int32, (lanes, dpad), 1)
    j64 = jax.lax.broadcasted_iota(jnp.int32, (lanes, 64), 1)

    for t in range(trials):
        alias_ref, sub_ref, usmall_ref, uself_ref, uatom_ref = per[
            5 * t : 5 * t + 5
        ]
        # fused-row proposal: inverse-CDF pick (same law as
        # rejection.fused_propose)
        u = usmall_ref[:, 0:1]  # [L, 1]
        c = jnp.sum(
            (cdf < u * total).astype(jnp.int32), axis=1, keepdims=True
        )
        c = jnp.minimum(c, dpad - 1)
        onehot = j_d == c  # [L, dpad]
        x_s = jnp.sum(jnp.where(onehot, nbr, 0), axis=1, keepdims=True)
        w_s = jnp.sum(jnp.where(onehot, wgt, 0.0), axis=1, keepdims=True)

        # alias proposal: select the slot's 8-lane sub-row out of the
        # 64-lane super-row in the INT32 domain (float lanes are id
        # bitcasts — denormals an f32 add would flush; see
        # layout.fetch_edge_slots), one masked reduce per needed column
        arow = _bitcast_i32(alias_ref[:])
        base = sub_ref[:, 0:1] * hubs_lib.EP_WIDTH  # [L, 1]

        def _lane(k):
            sel = j64 == (base + k)
            return jnp.sum(jnp.where(sel, arow, 0), axis=1, keepdims=True)

        acc_p = _bitcast_f32(_lane(hubs_lib.EP_ACCEPT))
        take_self = uself_ref[:, 0:1] < acc_p  # [L, 1]
        x_h = jnp.where(
            take_self,
            _lane(hubs_lib.EP_NBR_SELF),
            _lane(hubs_lib.EP_NBR_ALIAS),
        )
        w_h = jnp.where(
            take_self,
            _bitcast_f32(_lane(hubs_lib.EP_WGT_SELF)),
            _bitcast_f32(_lane(hubs_lib.EP_WGT_ALIAS)),
        )

        x = jnp.where(is_hub, x_h, x_s)  # [L, 1]
        wx = jnp.where(is_hub, w_h, w_s)
        if use_atom:
            atom = uatom_ref[:, 0:1] < theta_ref[:, 0:1]
            x = jnp.where(atom, prev_ref[:, 0:1], x)
            wx = jnp.where(atom, wp_ref[:, 0:1], wx)
        outs[2 * t][:, 0:1] = x
        outs[2 * t + 1][:, 0:1] = wx


def _k2_accept(
    *refs,
    num_nodes: int,
    dpad: int,
    inv_p: float,
    inv_q: float,
    alpha_np: float,
    use_atom: bool,
    trials: int,
):
    """Accept kernel. Ref layout:

    inputs:  prev_rows [L, C*dpad],
             per trial: bucket_t [L, 64], bsub_t [L,1] i32,
                        x_t [L,1] i32, uacc_t [L,1],
             prev [L,1] i32
    outputs: per trial: ok_t [L,1] i32 (0/1)
    """
    prev_row_ref = refs[0]
    per = refs[1 : 1 + 4 * trials]
    prev_ref = refs[1 + 4 * trials]
    outs = refs[2 + 4 * trials :]

    pn = _bitcast_i32(prev_row_ref[:, :dpad])  # [L, dpad]
    prev_hub = pn[:, 0:1] > num_nodes  # [L, 1]
    lanes = pn.shape[0]
    j64 = jax.lax.broadcasted_iota(jnp.int32, (lanes, 64), 1)

    for t in range(trials):
        bucket_ref, bsub_ref, x_ref, uacc_ref = per[4 * t : 4 * t + 4]
        x = x_ref[:, 0:1]  # [L, 1]
        # hub membership: the bucket's 8 key lanes live at
        # [bsub * 16, bsub * 16 + 8) of the super-row — one masked
        # compare over all 64 lanes, reduced as an integer max
        # (membership flags stay int32 0/1 — selecting i1 vectors has
        # no Mosaic lowering)
        brow = _bitcast_i32(bucket_ref[:])
        kbase = bsub_ref[:, 0:1] * (2 * hubs_lib.BUCKET_WIDTH)
        kmask = (j64 >= kbase) & (j64 < kbase + hubs_lib.BUCKET_WIDTH)
        hit_h = jnp.where(kmask & (brow == x), 1, 0)
        found_h = jnp.max(hit_h, axis=1, keepdims=True)  # [L, 1] int32
        # row membership: carried-row compare
        hit_s = jnp.where(pn == x, 1, 0)
        found_s = jnp.max(hit_s, axis=1, keepdims=True)
        found = jnp.where(prev_hub, found_h, found_s)

        is_prev = x == prev_ref[:, 0:1]
        alpha = jnp.where(
            is_prev, inv_p, jnp.where(found > 0, 1.0, inv_q)
        )
        accept = alpha * (1.0 / alpha_np)
        if use_atom:
            accept = jnp.where(is_prev, 1.0, accept)
        outs[t][:, 0:1] = (uacc_ref[:, 0:1] < accept).astype(jnp.int32)


def _pad_lanes(arr, b_pad, fill=0):
    pad = b_pad - arr.shape[0]
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths, constant_values=fill)


def trial_block_fused(
    dg: DeviceCSR,
    key: jax.Array,
    prev: jax.Array,
    cur_rows: jax.Array,
    prev_rows: jax.Array,
    p: float,
    q: float,
    alpha_np: float,
    trials: int,
    theta=None,
    wp=None,
    use_cdf: bool = False,
    interpret: bool = False,
):
    """Drop-in for ``rejection._trial_block`` (extend=False, hub graphs).

    Returns (chosen [B] i32, got [B] bool, w(cur, chosen) [B] f32) with
    the identical first-accepted-wins semantics and the identical
    ``jax.random`` consumption tree.
    """
    b = prev.shape[0]
    use_atom = theta is not None
    num_nodes = dg.num_nodes
    dpad = dg.dpad
    nchan = len(dg.channels)
    cdf_off = (
        dg.channels.index("cdf") * dpad if (use_cdf and "cdf" in dg.channels)
        else -1
    )

    # --- per-trial RNG, mirroring rejection._single_trial exactly -----
    deg = dg.rows_degree(cur_rows)
    base = dg.rows_edge_base(cur_rows)
    usmall, uself, uatom, uacc, subs, alias_parts = [], [], [], [], [], []
    for t in range(trials):
        kt = jax.random.fold_in(key, t)
        k_prop, k_acc, k_atom = jax.random.split(kt, 3)
        k_hub, k_small = jax.random.split(k_prop)
        k_slot, k_self = jax.random.split(k_hub)
        kk = jax.random.randint(k_slot, deg.shape, 0, jnp.maximum(deg, 1))
        slot = base + kk.astype(jnp.int32)
        alias_parts.append(dg._fetch_ep_super(slot // EP_SUPER))  # [B, 64]
        subs.append(slot % EP_SUPER)
        uself.append(jax.random.uniform(k_self, (b,)))
        usmall.append(jax.random.uniform(k_small, (b,), dtype=jnp.float32))
        uatom.append(
            jax.random.uniform(k_atom, (b,))
            if use_atom
            else jnp.zeros((b,), jnp.float32)
        )
        uacc.append(jax.random.uniform(k_acc, (b,)))

    # narrower grid steps once the operand set widens (3-channel rows /
    # 3+ trials blew Mosaic's 16M scoped-vmem stack at 512 lanes)
    lanes = LANES if (nchan * dpad <= 256 and trials <= 2) else LANES // 2
    b_pad = -(-b // lanes) * lanes
    grid = (b_pad // lanes,)

    def col(arr, dtype):
        return _pad_lanes(arr.astype(dtype)[:, None], b_pad)

    def lane_spec(width):
        return pl.BlockSpec(
            (lanes, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    row_spec = lane_spec(nchan * dpad)
    sup_spec = lane_spec(64)
    one_spec = lane_spec(1)

    theta_in = col(
        theta if use_atom else jnp.zeros((b,), jnp.float32), jnp.float32
    )
    wp_in = col(
        wp if use_atom else jnp.zeros((b,), jnp.float32), jnp.float32
    )
    prev_in = col(prev, jnp.int32)

    k1 = functools.partial(
        _k1_propose,
        num_nodes=num_nodes,
        dpad=dpad,
        cdf_off=cdf_off,
        use_atom=use_atom,
        trials=trials,
    )
    k1_inputs = [_pad_lanes(cur_rows, b_pad)]
    k1_specs = [row_spec]
    for t in range(trials):
        k1_inputs += [
            _pad_lanes(alias_parts[t], b_pad),
            col(subs[t], jnp.int32),
            col(usmall[t], jnp.float32),
            col(uself[t], jnp.float32),
            col(uatom[t], jnp.float32),
        ]
        k1_specs += [sup_spec, one_spec, one_spec, one_spec, one_spec]
    k1_inputs += [theta_in, wp_in, prev_in]
    k1_specs += [one_spec, one_spec, one_spec]

    k1_out = pl.pallas_call(
        k1,
        grid=grid,
        in_specs=k1_specs,
        out_specs=[one_spec] * (2 * trials),
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1), dt)
            for _ in range(trials)
            for dt in (jnp.int32, jnp.float32)
        ],
        interpret=interpret,
    )(*k1_inputs)
    xs = [k1_out[2 * t][:b, 0] for t in range(trials)]
    wxs = [k1_out[2 * t + 1][:b, 0] for t in range(trials)]

    # --- bucket row index from x (cheap [B] VPU work, stays XLA) ------
    hbase, hlog = dg.rows_hash_meta(prev_rows)
    mask = (
        jnp.uint32(1) << jnp.clip(hlog, 0, 30).astype(jnp.uint32)
    ) - jnp.uint32(1)
    k2 = functools.partial(
        _k2_accept,
        num_nodes=num_nodes,
        dpad=dpad,
        inv_p=1.0 / p,
        inv_q=1.0 / q,
        alpha_np=alpha_np,
        use_atom=use_atom,
        trials=trials,
    )
    k2_inputs = [_pad_lanes(prev_rows, b_pad)]
    k2_specs = [row_spec]
    for t in range(trials):
        bucket = hbase + (
            (xs[t].astype(jnp.uint32) * rejection._KNUTH) & mask
        ).astype(jnp.int32)
        k2_inputs += [
            _pad_lanes(dg._fetch_hb_super(bucket // HB_SUPER), b_pad),
            col(bucket % HB_SUPER, jnp.int32),
            col(xs[t], jnp.int32),
            col(uacc[t], jnp.float32),
        ]
        k2_specs += [sup_spec, one_spec, one_spec, one_spec]
    k2_inputs.append(prev_in)
    k2_specs.append(one_spec)

    ok_out = pl.pallas_call(
        k2,
        grid=grid,
        in_specs=k2_specs,
        out_specs=[one_spec] * trials,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32)
            for _ in range(trials)
        ],
        interpret=interpret,
    )(*k2_inputs)
    if trials == 1:
        ok_out = [ok_out] if not isinstance(ok_out, (list, tuple)) else ok_out

    # --- first-accepted-wins combine (same as rejection._trial_block) -
    chosen, got, chosen_w = None, None, None
    for t in range(trials):
        x_t = xs[t]
        ok_t = ok_out[t][:b, 0].astype(jnp.bool_)
        wx_t = wxs[t]
        if chosen is None:
            chosen, got, chosen_w = x_t, ok_t, wx_t
        else:
            chosen = jnp.where(~got, x_t, chosen)
            chosen_w = jnp.where(~got, wx_t, chosen_w)
            got = got | ok_t
    return chosen, got, chosen_w
