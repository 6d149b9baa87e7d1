"""On-device skip-gram negative-sampling (SGNS) trainer.

Replaces the reference's external gensim ``Word2Vec`` dependency
(``pecanpy.py:279-288``, ``cli.py:310-319``) with a from-scratch JAX
implementation whose training dynamics mirror gensim's skip-gram path:

* vocabulary = graph node indices (min_count=0 semantics: every node
  appears in the walks because every node starts ``num_walks`` walks);
* frequent-word subsampling with gensim's keep probability
  ``(sqrt(f / s) + 1) * s / f`` applied by *pruning the sentence before
  windowing* (as gensim does — dropped tokens don't count as context);
* per-position reduced windows: effective window ~ U{1..window};
* for a pair (center, context), the *input* vector is the context word's
  row of W_in and the *output* is the center word's row of W_out, matching
  gensim's ``train_sg_pair``; negatives are drawn from the unigram^0.75
  distribution, collisions with the center masked out;
* linear learning-rate decay from ``alpha`` to ``min_alpha`` over the
  total token count across epochs.

Where gensim runs hogwild C threads racing on shared arrays, this trainer
runs jitted minibatch SGD: each step consumes a chunk of walks, expands it
into a static-shaped pair tensor on device, and applies one fused
gather -> dot (MXU) -> scatter-add update with donated parameter buffers.
"""
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SGNSConfig:
    """Hyperparameters; defaults match the reference CLI / gensim defaults."""

    dim: int = 128
    window: int = 10
    negative: int = 5
    epochs: int = 1
    alpha: float = 0.025
    min_alpha: float = 0.0001
    sample: float = 1e-3
    batch_walks: int = 512
    # Pairs per SGD sub-batch. None = adaptive: ~8 pairs per vocabulary row
    # (clamped to [256, 8192]) so small graphs take many small sequential
    # steps (gensim-like dynamics) while large graphs get full-width
    # device batches.
    batch_pairs: Optional[int] = None
    seed: Optional[int] = None


def _count_tokens(
    walks: jax.Array, eff_len: jax.Array, num_nodes: int
) -> jax.Array:
    """Occurrence count of every node across the valid walk prefix."""
    valid = jnp.arange(walks.shape[1]) < eff_len[:, None]
    return (
        jnp.zeros(num_nodes, dtype=jnp.float32)
        .at[walks.reshape(-1)]
        .add(valid.reshape(-1).astype(jnp.float32))
    )


def _keep_probs(counts: jax.Array, sample: float) -> jax.Array:
    """Gensim subsampling keep-probability per word."""
    if sample <= 0:
        return jnp.ones_like(counts)
    threshold = sample * jnp.sum(counts)
    safe = jnp.maximum(counts, 1.0)
    keep = (jnp.sqrt(safe / threshold) + 1.0) * threshold / safe
    return jnp.clip(keep, 0.0, 1.0)


def make_step_body(num_nodes: int, config: SGNSConfig):
    """Build the pure (unjitted) per-chunk training step.

    Exposed separately so the multi-device path can jit it under a mesh
    with sharding annotations (``pecanpy_tpu.parallel``).
    """
    window = config.window
    negative = config.negative
    batch_pairs = config.batch_pairs
    if batch_pairs is None:
        batch_pairs = min(8192, max(256, num_nodes * 8))
    offsets = np.concatenate(
        [np.arange(-window, 0), np.arange(1, window + 1)]
    ).astype(np.int32)  # [2W]

    def step(w_in, w_out, walks, eff_len, keep_prob, noise_cdf, lr, key):
        wb, t = walks.shape
        k_sub, k_win, k_neg = jax.random.split(key, 3)

        # 1. Subsample: prune dropped tokens, compact each walk left.
        u = jax.random.uniform(k_sub, (wb, t))
        in_walk = jnp.arange(t)[None, :] < eff_len[:, None]
        keep = in_walk & (u < keep_prob[walks])
        new_pos = jnp.cumsum(keep, axis=1) - 1
        rows = jnp.broadcast_to(jnp.arange(wb)[:, None], (wb, t))
        compacted = (
            jnp.zeros((wb, t), dtype=walks.dtype)
            .at[rows, jnp.where(keep, new_pos, t)]
            .set(walks, mode="drop")
        )
        new_eff = jnp.sum(keep, axis=1)  # [Wb]

        # 2. Reduced windows per center position.
        reduced = jax.random.randint(k_win, (wb, t), 0, window)
        eff_window = window - reduced  # in [1, window]

        # 3. Expand to the static pair tensor [Wb, T, 2W].
        pos = jnp.arange(t, dtype=jnp.int32)[None, :, None]
        ctx_pos = pos + offsets[None, None, :]
        limit = new_eff[:, None, None]
        pair_ok = (
            (ctx_pos >= 0)
            & (ctx_pos < limit)
            & (pos < limit)
            & (jnp.abs(offsets)[None, None, :] <= eff_window[:, :, None])
        )
        center = jnp.broadcast_to(
            compacted[:, :, None], (wb, t, offsets.shape[0])
        )
        context = compacted[
            rows[:, :, None], jnp.clip(ctx_pos, 0, t - 1)
        ]

        mask = pair_ok.reshape(-1).astype(jnp.float32)  # [P]
        center = center.reshape(-1)
        context = context.reshape(-1)
        p = center.shape[0]

        # 4. Negatives from the unigram^0.75 table; collisions masked.
        total_mass = noise_cdf[-1]
        draws = jax.random.uniform(k_neg, (p, negative)) * total_mass
        negs = jnp.searchsorted(noise_cdf, draws).astype(jnp.int32)
        negs = jnp.minimum(negs, num_nodes - 1)
        neg_mask = (negs != center[:, None]).astype(jnp.float32)

        # 5. SGNS updates over pair sub-batches. Gensim applies each pair
        #    sequentially (hogwild); applying the whole walk chunk as one
        #    summed update diverges (a node appearing k times in the chunk
        #    sees an effective lr of k * alpha). Scanning sub-batches of
        #    bounded size restores gensim-like dynamics while keeping one
        #    device dispatch per chunk.
        sub = min(batch_pairs, p)
        n_sub = -(-p // sub)
        pad_to = n_sub * sub

        def pad(x):
            width = [(0, pad_to - p)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, width).reshape((n_sub, sub) + x.shape[1:])

        drop = num_nodes  # out-of-range sentinel: masked rows scatter nowhere
        ctx_idx = pad(jnp.where(mask > 0, context, drop))
        cen_idx = pad(jnp.where(mask > 0, center, drop))
        neg_idx = pad(jnp.where((mask[:, None] * neg_mask) > 0, negs, drop))
        mask_s = pad(mask)
        neg_mask_s = pad(neg_mask)

        def row_scale(idx, weight):
            """1 / (occurrences of idx's row in this sub-batch), per element.

            A row hit k times in one scatter would take a k * lr step with
            stale gradients — the source of divergence on small vocabularies.
            Scaling each contribution by 1/k turns the accumulated update
            into the per-row gradient *mean*: identical to plain SGD when
            rows don't repeat, stable (gensim-sequential-like) when they do.
            """
            counts = jnp.zeros(num_nodes + 1).at[idx].add(weight, mode="drop")
            return 1.0 / jnp.maximum(counts[idx], 1.0)

        def sub_step(carry, batch):
            w_in, w_out = carry
            ctx, cen, ngs, m, nm = batch
            v = w_in[ctx]  # [S, d] (sentinel gathers clamp; grads masked)
            u_pos = w_out[cen]
            u_neg = w_out[ngs]  # [S, K, d]

            g_pos = (jax.nn.sigmoid(jnp.sum(v * u_pos, axis=-1)) - 1.0) * m
            s_neg = jnp.einsum("pd,pkd->pk", v, u_neg)
            g_neg = jax.nn.sigmoid(s_neg) * m[:, None] * nm

            dv = g_pos[:, None] * u_pos + jnp.einsum("pk,pkd->pd", g_neg, u_neg)
            du_pos = g_pos[:, None] * v
            du_neg = g_neg[:, :, None] * v[:, None, :]

            dv = dv * row_scale(ctx, m)[:, None]
            du_pos = du_pos * row_scale(cen, m)[:, None]
            ngs_flat = ngs.reshape(-1)
            nm_flat = (m[:, None] * nm).reshape(-1)
            du_neg = du_neg.reshape(-1, du_neg.shape[-1]) * row_scale(
                ngs_flat, nm_flat
            )[:, None]

            w_in = w_in.at[ctx].add(-lr * dv, mode="drop")
            w_out = w_out.at[cen].add(-lr * du_pos, mode="drop")
            w_out = w_out.at[ngs_flat].add(-lr * du_neg, mode="drop")
            return (w_in, w_out), None

        (w_in, w_out), _ = jax.lax.scan(
            sub_step,
            (w_in, w_out),
            (ctx_idx, cen_idx, neg_idx, mask_s, neg_mask_s),
        )
        return w_in, w_out

    return step


def _make_step(num_nodes: int, walk_cols: int, config: SGNSConfig):
    """Jitted single-device training step with donated parameter buffers."""
    return jax.jit(
        make_step_body(num_nodes, config), donate_argnums=(0, 1)
    )


def train(
    walks: jax.Array,
    eff_len: jax.Array,
    num_nodes: int,
    config: SGNSConfig = SGNSConfig(),
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 100,
    max_steps: Optional[int] = None,
) -> jax.Array:
    """Train SGNS embeddings from device walks.

    Args:
        walks: [W, T] int32 walk matrix (T = walk_length + 1).
        eff_len: [W] int32 effective walk lengths.
        num_nodes: vocabulary size N.
        config: hyperparameters.
        checkpoint_dir: if set, snapshot training state every
            ``checkpoint_every`` chunk-steps and resume from the latest
            snapshot when one exists (new capability vs. the reference,
            which has no training checkpointing).
        checkpoint_every: snapshot period in chunk-steps.
        max_steps: optional chunk-step budget — stop early after this many
            steps (combine with checkpointing to split a long run across
            invocations; the lr schedule stays pinned to the full plan).

    Returns:
        [N, dim] float32 input-embedding matrix, row i = node i.
    """
    walks = jnp.asarray(walks, dtype=jnp.int32)
    eff_len = jnp.asarray(eff_len, dtype=jnp.int32)
    seed = config.seed if config.seed is not None else 0
    key = jax.random.PRNGKey(seed)
    k_init, k_train = jax.random.split(key)

    counts = _count_tokens(walks, eff_len, num_nodes)
    keep_prob = _keep_probs(counts, config.sample)
    noise_cdf = jnp.cumsum(counts**0.75)

    bound = 0.5 / config.dim
    w_in = jax.random.uniform(
        k_init, (num_nodes, config.dim), minval=-bound, maxval=bound
    )
    w_out = jnp.zeros((num_nodes, config.dim), dtype=jnp.float32)

    ckpt = None
    resume_step = 0
    if checkpoint_dir is not None:
        from pecanpy_tpu.utils.checkpoint import (
            SGNSCheckpointer,
            checkpointing_available,
        )

        if checkpointing_available():
            ckpt = SGNSCheckpointer(checkpoint_dir)
            if ckpt.latest_step() is not None:
                w_in_np, w_out_np, meta = ckpt.restore()
                w_in = jnp.asarray(w_in_np)
                w_out = jnp.asarray(w_out_np)
                resume_step = int(meta["next_step"])

    step = _make_step(num_nodes, walks.shape[1], config)

    num_walks = walks.shape[0]
    chunk = min(config.batch_walks, num_walks)
    eff_host = np.asarray(eff_len)
    total_tokens = float(eff_host.sum()) * config.epochs
    done_tokens = 0.0

    step_idx = 0
    for epoch in range(config.epochs):
        for lo in range(0, num_walks, chunk):
            if max_steps is not None and step_idx >= max_steps:
                break
            hi = min(lo + chunk, num_walks)
            if step_idx < resume_step:  # replay the cursor, skip the work
                done_tokens += float(eff_host[lo:hi].sum())
                step_idx += 1
                continue
            w_chunk = walks[lo:hi]
            e_chunk = eff_len[lo:hi]
            pad = chunk - (hi - lo)
            if pad:
                w_chunk = jnp.pad(w_chunk, ((0, pad), (0, 0)))
                e_chunk = jnp.pad(e_chunk, (0, pad))  # eff 0: no pairs

            progress = done_tokens / max(total_tokens, 1.0)
            lr = max(
                config.min_alpha,
                config.alpha - (config.alpha - config.min_alpha) * progress,
            )
            w_in, w_out = step(
                w_in,
                w_out,
                w_chunk,
                e_chunk,
                keep_prob,
                noise_cdf,
                jnp.float32(lr),
                jax.random.fold_in(k_train, step_idx),
            )
            done_tokens += float(eff_host[lo:hi].sum())
            step_idx += 1
            if ckpt is not None and step_idx % checkpoint_every == 0:
                ckpt.save(
                    step_idx, w_in, w_out, {"next_step": step_idx}
                )

    if ckpt is not None:
        ckpt.close()
    return w_in
