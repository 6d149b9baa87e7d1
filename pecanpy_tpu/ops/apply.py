"""Sparse-row update application without XLA scatter.

The SGNS update is "W[i] -= lr * mean of the gradient rows with id i" for
~1e5 (id, grad) pairs per step against a [N, dim] table. XLA's
scatter-add on TPU is catastrophically slow for this shape (measured
~1.7 s for 65k rows into [1M, 128] — cost scales with the TABLE, ~500x a
plain copy), so the hot path is a Pallas kernel instead:

1. sort the updates by destination row (one argsort of [R] int32 + one
   fast-path row gather to permute the payload);
2. stream the table through VMEM in tiles of TILE rows; each grid step
   DMAs its slice of the sorted updates (per-tile bounds precomputed with
   one tiny searchsorted), accumulates sums/counts into VMEM scratch with
   a scalar loop, and writes back ``tile - lr * sums / max(counts, eps)``.

Total traffic = one table read + write + one pass over the updates —
streaming-rate instead of scatter's element-serial path.

TPU alignment notes: HBM DMA slices must be 128-lane multiples, so the
int32 ids and f32 counts travel as [R/128, 128] blocks and chunk starts
are 128-aligned (entries outside the tile's [lo, hi) range are masked in
the scalar loop); the count accumulator is a full dim-wide row per table
row (every lane equal) to keep all scratch traffic aligned.

The pure-XLA fallback (``_apply_scatter``) is used on CPU (where scatter
is fine).

bfloat16 tables: the kernel streams bf16 tiles, accumulates in f32, and
writes back with **stochastic rounding** (pltpu.prng_random_bits +
stochastic_round) — at lr ~1e-3 the per-step row movement is below the
bf16 ulp of typical weights, so round-to-nearest would silently drop
most updates; stochastic rounding keeps SGD unbiased. The CPU fallback
rounds to nearest (documented quality caveat; bf16 is a TPU option).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # table rows per grid step (VMEM-budget bound)
CHUNK = 1024  # update rows per DMA (1-D HBM arrays are (1024,)-tiled)
_LANE = 128
_EPS = 1e-9


DEFAULT_UPDATE_CAP = 4.0  # max "pair-steps" a row absorbs per application


def _row_step(sums, cnts, lr, cap):
    """-lr * sum * min(cnt, cap) / cnt  per row.

    Rows with few contributions take the plain gradient SUM — the batch
    equivalent of gensim applying each pair sequentially; hot rows are
    capped at ``cap`` pair-steps per application so a row repeated
    thousands of times in one chunk cannot blow past the sigmoid's
    saturation region the sequential algorithm would have entered.
    """
    scale = jnp.minimum(cnts, cap) / jnp.maximum(cnts, _EPS)
    return lr * sums * scale


def _apply_scatter(table, ids, upd, cnt, lr, cap):
    """Reference implementation: plain scatter (fast on CPU only)."""
    t32 = table.astype(jnp.float32)
    sums = jnp.zeros_like(t32).at[ids].add(upd.astype(jnp.float32))
    cnts = jnp.zeros(table.shape[0], dtype=jnp.float32).at[ids].add(cnt)
    out = t32 - _row_step(sums, cnts[:, None], lr, cap)
    return out.astype(table.dtype)


def _accumulate_stream(
    i, lo, hi, ids_ref, upd_ref, cnt_ref, sums, cnts, ids_buf, upd_buf,
    cnt_buf, sems,
):
    """Fold the sorted update rows in [lo, hi) into the tile's sums/cnts."""
    sums[:] = jnp.zeros_like(sums)
    cnts[:] = jnp.zeros_like(cnts)

    start0 = (lo // CHUNK) * CHUNK  # aligned down; out-of-range masked
    n_chunks = (hi - start0 + CHUNK - 1) // CHUNK

    def chunk_body(ci, _):
        start = start0 + ci * CHUNK
        c1 = pltpu.make_async_copy(
            ids_ref.at[pl.ds(start, CHUNK)], ids_buf, sems.at[0]
        )
        c2 = pltpu.make_async_copy(
            upd_ref.at[pl.ds(start, CHUNK), :], upd_buf, sems.at[1]
        )
        c3 = pltpu.make_async_copy(
            cnt_ref.at[pl.ds(start, CHUNK)], cnt_buf, sems.at[2]
        )
        c1.start()
        c2.start()
        c3.start()
        c1.wait()
        c2.wait()
        c3.wait()

        def entry_body(j, _):
            g = start + j  # global update index

            @pl.when((g >= lo) & (g < hi))
            def _():
                local = ids_buf[j] - i * TILE
                sums[pl.ds(local, 1), :] = sums[pl.ds(local, 1), :] + (
                    upd_buf[pl.ds(j, 1), :].astype(jnp.float32)
                )
                cnts[pl.ds(local, 1), :] = (
                    cnts[pl.ds(local, 1), :] + cnt_buf[j]
                )

            return None

        jax.lax.fori_loop(0, CHUNK, entry_body, None)
        return None

    jax.lax.fori_loop(0, n_chunks, chunk_body, None)


def _applier_kernel(
    bounds_ref,  # [n_tiles + 1] scalar-prefetch: update range per tile
    lr_ref,  # [2] scalar-prefetch: (lr, update cap)
    seed_ref,  # [1] int32 scalar-prefetch: stochastic-rounding seed
    tile_ref,  # [TILE, D] VMEM: current table tile (f32 or bf16)
    ids_ref,  # [R_pad] int32, HBM (manual DMA)
    upd_ref,  # [R_pad, D] f32/bf16, HBM
    cnt_ref,  # [R_pad] f32, HBM
    out_ref,  # [TILE, D] VMEM
    sums,  # [TILE, D] f32 VMEM scratch
    cnts,  # [TILE, d] f32 VMEM scratch (all lanes equal)
    ids_buf,  # [CHUNK] int32 SMEM scratch (scalar reads)
    upd_buf,  # [CHUNK, D] VMEM scratch (payload dtype)
    cnt_buf,  # [CHUNK] f32 SMEM scratch
    sems,  # DMA semaphores (3,)
):
    i = pl.program_id(0)
    _accumulate_stream(
        i, bounds_ref[i], bounds_ref[i + 1], ids_ref, upd_ref, cnt_ref,
        sums, cnts, ids_buf, upd_buf, cnt_buf, sems,
    )
    new = tile_ref[:].astype(jnp.float32) - _row_step(
        sums[:], cnts[:], lr_ref[0], lr_ref[1]
    )
    if out_ref.dtype == jnp.bfloat16:
        # lr-scale movements sit below the bf16 ulp of typical weights:
        # stochastic rounding keeps the SGD updates unbiased
        pltpu.prng_seed(seed_ref[0] + i)
        bits = pltpu.bitcast(pltpu.prng_random_bits(new.shape), jnp.uint32)
        out_ref[:] = pltpu.stochastic_round(
            new, bits, target_dtype=jnp.bfloat16
        )
    else:
        out_ref[:] = new


def _applier2_kernel(
    bounds_a_ref,  # [n_tiles + 1] scalar-prefetch: stream-a range per tile
    bounds_b_ref,  # [n_tiles + 1] scalar-prefetch: stream-b range per tile
    lr_ref,  # [3] scalar-prefetch: (lr, cap_a, cap_b)
    seed_ref,  # [1] int32 scalar-prefetch
    tile_ref,  # [TILE, D] VMEM
    ids_a_ref, upd_a_ref, cnt_a_ref,  # stream a (HBM, manual DMA)
    ids_b_ref, upd_b_ref, cnt_b_ref,  # stream b (HBM, manual DMA)
    out_ref,  # [TILE, D] VMEM
    accum,  # [TILE, D] f32 VMEM scratch: running new tile value
    sums, cnts, ids_buf, upd_buf, cnt_buf, sems,
):
    """Two independent normalization groups folded in ONE table pass.

    Equivalent to two sequential ``_applier_kernel`` invocations (same
    subtract order, so the f32 path is bit-identical) at half the table
    traffic — the dominant cost when the table dwarfs the update streams.
    """
    i = pl.program_id(0)
    accum[:] = tile_ref[:].astype(jnp.float32)
    _accumulate_stream(
        i, bounds_a_ref[i], bounds_a_ref[i + 1], ids_a_ref, upd_a_ref,
        cnt_a_ref, sums, cnts, ids_buf, upd_buf, cnt_buf, sems,
    )
    accum[:] = accum[:] - _row_step(sums[:], cnts[:], lr_ref[0], lr_ref[1])
    _accumulate_stream(
        i, bounds_b_ref[i], bounds_b_ref[i + 1], ids_b_ref, upd_b_ref,
        cnt_b_ref, sums, cnts, ids_buf, upd_buf, cnt_buf, sems,
    )
    new = accum[:] - _row_step(sums[:], cnts[:], lr_ref[0], lr_ref[2])
    if out_ref.dtype == jnp.bfloat16:
        pltpu.prng_seed(seed_ref[0] + i)
        bits = pltpu.bitcast(pltpu.prng_random_bits(new.shape), jnp.uint32)
        out_ref[:] = pltpu.stochastic_round(
            new, bits, target_dtype=jnp.bfloat16
        )
    else:
        out_ref[:] = new


def _apply_pallas(table, ids_s, upd_s, cnt_s, bounds, lr_cap, seed):
    """Tile-streaming applier over PRE-SORTED updates."""
    n, d = table.shape
    n_tiles = n // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i, b, lr_, sd: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, d), lambda i, b, lr_, sd: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE, d), jnp.float32),
            pltpu.VMEM((TILE, d), jnp.float32),
            pltpu.SMEM((CHUNK,), jnp.int32),
            pltpu.VMEM((CHUNK, d), upd_s.dtype),
            pltpu.SMEM((CHUNK,), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _applier_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        input_output_aliases={3: 0},  # table buffer reused for the output
    )(bounds, lr_cap, seed, table, ids_s, upd_s, cnt_s)


def _apply_pallas2(
    table, streams_a, streams_b, bounds_a, bounds_b, lr_caps, seed
):
    """One table pass applying two pre-sorted update streams."""
    n, d = table.shape
    n_tiles = n // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
        out_specs=pl.BlockSpec(
            (TILE, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE, d), jnp.float32),  # accum
            pltpu.VMEM((TILE, d), jnp.float32),  # sums
            pltpu.VMEM((TILE, d), jnp.float32),  # cnts
            pltpu.SMEM((CHUNK,), jnp.int32),
            pltpu.VMEM((CHUNK, d), streams_a[1].dtype),
            pltpu.SMEM((CHUNK,), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        _applier2_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        input_output_aliases={4: 0},  # table buffer reused for the output
    )(bounds_a, bounds_b, lr_caps, seed, table, *streams_a, *streams_b)


def _prep_stream(ids, upd, cnt, n_pad, pad_d):
    """Sort one update stream by destination row + pad for aligned DMA."""
    r = ids.shape[0]
    if pad_d:
        upd = jnp.pad(upd, ((0, 0), (0, pad_d)))
    # payload stays f32: bf16 VMEM rows cannot be dynamically sliced at
    # single-sublane granularity (16-row tiles)
    upd = upd.astype(jnp.float32)
    order = jnp.argsort(ids)
    ids_s = ids[order]
    upd_s = upd[order]  # fast-path row gather (payload width >= 64)
    cnt_s = cnt[order].astype(jnp.float32)
    # pad so any aligned CHUNK-window DMA below an update bound is in range
    r_pad = (-(-r // CHUNK) + 1) * CHUNK
    ids_s = jnp.pad(ids_s, (0, r_pad - r), constant_values=n_pad)
    upd_s = jnp.pad(upd_s, ((0, r_pad - r), (0, 0)))
    cnt_s = jnp.pad(cnt_s, (0, r_pad - r))
    edges = jnp.arange(n_pad // TILE + 1, dtype=jnp.int32) * TILE
    bounds = jnp.searchsorted(ids_s, edges).astype(jnp.int32)
    return (ids_s, upd_s, cnt_s), bounds


@functools.partial(
    jax.jit,
    static_argnames=("use_pallas", "cap_a", "cap_b"),
    donate_argnums=(0,),
)
def apply_mean_updates_two(
    table: jax.Array,
    ids_a: jax.Array,
    upd_a: jax.Array,
    cnt_a: jax.Array,
    ids_b: jax.Array,
    upd_b: jax.Array,
    cnt_b: jax.Array,
    lr: jax.Array,
    use_pallas: bool = False,
    cap_a: float = DEFAULT_UPDATE_CAP,
    cap_b: float = DEFAULT_UPDATE_CAP,
    rng_seed: jax.Array = None,
) -> jax.Array:
    """Apply two independent capped-mean update streams in one table pass.

    Exactly ``apply_mean_updates(apply_mean_updates(table, a...), b...)``
    (bit-identical on the f32 path — same subtract order) but streams the
    [N, dim] table through VMEM once instead of twice. The streams keep
    separate normalization groups (counts and caps), which is the point:
    merging them into one mean would let the more numerous stream drown
    the other (see the w_out note in ``models/sgns.py``).
    """
    if not use_pallas:
        out = _apply_scatter(table, ids_a, upd_a, cnt_a, lr, cap_a)
        return _apply_scatter(out, ids_b, upd_b, cnt_b, lr, cap_b)

    n, d = table.shape
    if n % TILE:
        table = jnp.pad(table, ((0, TILE - n % TILE), (0, 0)))
    pad_d = (_LANE - d % _LANE) % _LANE
    if pad_d:
        table = jnp.pad(table, ((0, 0), (0, pad_d)))
    n_pad = table.shape[0]

    streams_a, bounds_a = _prep_stream(ids_a, upd_a, cnt_a, n_pad, pad_d)
    streams_b, bounds_b = _prep_stream(ids_b, upd_b, cnt_b, n_pad, pad_d)
    if rng_seed is None:
        rng_seed = jnp.int32(0)
    out = _apply_pallas2(
        table,
        streams_a,
        streams_b,
        bounds_a,
        bounds_b,
        jnp.asarray([lr, cap_a, cap_b], dtype=jnp.float32),
        rng_seed.reshape(1).astype(jnp.int32),
    )
    return out[:n, :d]


@functools.partial(
    jax.jit, static_argnames=("use_pallas", "cap"), donate_argnums=(0,)
)
def apply_mean_updates(
    table: jax.Array,
    ids: jax.Array,
    upd: jax.Array,
    cnt: jax.Array,
    lr: jax.Array,
    use_pallas: bool = False,
    cap: float = DEFAULT_UPDATE_CAP,
    rng_seed: jax.Array = None,
) -> jax.Array:
    """table[i] -= lr * capped-sum of the upd rows with id i.

    See ``_row_step`` for the exact rule (gradient sum, capped at
    UPDATE_CAP contributions per row per application). Rows not present
    in ``ids`` are unchanged; entries with cnt 0 and zero upd rows are
    no-ops (padding-friendly). ``ids`` must be < table rows.
    """
    if not use_pallas:
        return _apply_scatter(table, ids, upd, cnt, lr, cap)

    n, d = table.shape
    if n % TILE:
        table = jnp.pad(table, ((0, TILE - n % TILE), (0, 0)))
    pad_d = (_LANE - d % _LANE) % _LANE  # DMA slices need 128-lane rows
    if pad_d:
        table = jnp.pad(table, ((0, 0), (0, pad_d)))
    n_pad = table.shape[0]

    (ids_s, upd_s, cnt_s), bounds = _prep_stream(
        ids, upd, cnt, n_pad, pad_d
    )
    if rng_seed is None:
        rng_seed = jnp.int32(0)
    out = _apply_pallas(
        table,
        ids_s,
        upd_s,
        cnt_s,
        bounds,
        jnp.asarray([lr, cap], dtype=jnp.float32),
        rng_seed.reshape(1).astype(jnp.int32),
    )
    return out[:n, :d]
