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
    lo = bounds_ref[i]
    hi = bounds_ref[i + 1]
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
    r = ids.shape[0]
    if n % TILE:
        table = jnp.pad(table, ((0, TILE - n % TILE), (0, 0)))
    if d % _LANE:  # DMA slices need 128-lane-aligned rows
        pad_d = _LANE - d % _LANE
        table = jnp.pad(table, ((0, 0), (0, pad_d)))
        upd = jnp.pad(upd, ((0, 0), (0, pad_d)))
    n_pad = table.shape[0]

    # payload stays f32: bf16 VMEM rows cannot be dynamically sliced at
    # single-sublane granularity (16-row tiles)
    upd = upd.astype(jnp.float32)
    order = jnp.argsort(ids)
    ids_s = ids[order]
    upd_s = upd[order]  # fast-path row gather (payload width >= 64)
    cnt_s = cnt[order]
    # pad so any aligned CHUNK-window DMA below an update bound is in range
    r_pad = (-(-r // CHUNK) + 1) * CHUNK
    ids_s = jnp.pad(ids_s, (0, r_pad - r), constant_values=n_pad)
    upd_s = jnp.pad(upd_s, ((0, r_pad - r), (0, 0)))
    cnt_s = jnp.pad(cnt_s, (0, r_pad - r))

    edges = jnp.arange(n_pad // TILE + 1, dtype=jnp.int32) * TILE
    bounds = jnp.searchsorted(ids_s, edges).astype(jnp.int32)

    if rng_seed is None:
        rng_seed = jnp.int32(0)
    out = _apply_pallas(
        table,
        ids_s,
        upd_s,
        cnt_s.astype(jnp.float32),
        bounds,
        jnp.asarray([lr, cap], dtype=jnp.float32),
        rng_seed.reshape(1).astype(jnp.int32),
    )
    return out[:n, :d]
