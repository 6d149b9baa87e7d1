#!/usr/bin/env python
"""Fine-grained cost bisect of the rejection trial block (power-law graph).

Measures, in-jit with K repetitions at B=131k lanes:
  raw narrow gathers (edge_pack 8-lane, bucket 16-lane, fused-row wide),
  alias_propose / fused_propose / combined propose,
  membership (bucket + fused variants), full bias, one T=1 trial block,
  and the compaction machinery of one sweep.

Run from repo root: python benchmarks/micro_hub3.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")
from bench_powerlaw import build_powerlaw_graph  # noqa: E402

K1, K2 = 16, 64  # per-op cost = slope between the two rep counts
B = 131_072


def main():
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.ops import rejection

    n = 1_000_000
    from pecanpy_tpu.ops.layout import build_device_csr

    indptr, indices, data = build_powerlaw_graph(n, exponent=2.2)
    g = build_device_csr(indptr, indices, data, degree_cap=128)
    rng = np.random.default_rng(0)
    ends = rng.integers(0, int(indptr[-1]), B)
    cur = jnp.asarray(indices[ends].astype(np.int32))
    prev = jnp.asarray(
        (np.searchsorted(indptr, ends, side="right") - 1).astype(np.int32)
    )
    key = jax.random.PRNGKey(0)
    print(
        f"edge_pack rows: {g.edge_pack.shape[0]}, "
        f"buckets: {g.hbuckets.shape[0]}",
        flush=True,
    )

    def measure(label, build_body, *extra):
        def make_run(k):
            @jax.jit
            def run(g, cur, prev, key, *extra):
                def body(i, carry):
                    acc = carry
                    out = build_body(
                        g, cur, prev, jax.random.fold_in(key, i), *extra
                    )
                    return acc + out
                return jax.lax.fori_loop(
                    0, k, body, jnp.zeros_like(cur)
                )
            return run

        ts = {}
        for k in (K1, K2):
            run = make_run(k)
            np.asarray(run(g, cur, prev, key, *extra))
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                np.asarray(
                    run(g, cur, prev, jax.random.fold_in(key, 7 + i), *extra)
                )
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        per = (ts[K2] - ts[K1]) / (K2 - K1)
        print(f"{label}: {per * 1e3:6.1f} ms", flush=True)

    # --- raw gathers ------------------------------------------------------
    ep_rows = g.edge_pack.shape[0]
    hb_rows = g.hbuckets.shape[0]

    def raw_edge_gather(g, cur, prev, k):
        idx = jax.random.randint(k, (B,), 0, ep_rows)
        r = g.edge_pack[idx]
        return jax.lax.bitcast_convert_type(r[:, 1], jnp.int32)

    measure("raw 8-lane edge_pack gather [B]  ", raw_edge_gather)

    def raw_bucket_gather(g, cur, prev, k):
        idx = jax.random.randint(k, (B,), 0, hb_rows)
        r = g.hbuckets[idx]
        return jax.lax.bitcast_convert_type(r[:, 0], jnp.int32)

    measure("raw 16-lane bucket gather [B]    ", raw_bucket_gather)

    def raw_fused_gather(g, cur, prev, k):
        idx = jax.random.randint(k, (B,), 0, g.num_nodes)
        r = g.fused[idx]
        return jax.lax.bitcast_convert_type(r[:, 0], jnp.int32)

    measure("raw wide fused-row gather [B]    ", raw_fused_gather)

    # --- proposal pieces --------------------------------------------------
    cr = g.gather_rows(cur)
    pr = g.gather_rows(prev)

    def alias_prop(g, cur, prev, k, cr, pr):
        x, w = rejection.alias_propose(g, k, cr)
        return x + w.astype(jnp.int32)

    measure("alias_propose T=1                ", alias_prop, cr, pr)

    def fused_prop(g, cur, prev, k, cr, pr):
        x, w = rejection.fused_propose(g, k, cr, False)
        return x + w.astype(jnp.int32)

    measure("fused_propose T=1                ", fused_prop, cr, pr)

    def both_prop(g, cur, prev, k, cr, pr):
        x, w = rejection.propose(g, k, cr)
        return x + w.astype(jnp.int32)

    measure("propose (both + select) T=1      ", both_prop, cr, pr)

    # --- membership pieces ------------------------------------------------
    def member(g, cur, prev, k, cr, pr):
        x = jax.random.randint(k, (B,), 0, g.num_nodes)
        found, w = rejection.membership(g, x, pr)
        return found.astype(jnp.int32) + w.astype(jnp.int32)

    measure("membership (bucket + fused)      ", member, cr, pr)

    def trial1(g, cur, prev, k, cr, pr):
        x, ok, _ = rejection._trial_block(
            g, k, prev, cr, pr, 0.5, 2.0, False, 1.0, 1
        )
        return x + ok.astype(jnp.int32)

    measure("_trial_block T=1                 ", trial1, cr, pr)

    def trial2(g, cur, prev, k, cr, pr):
        x, ok, _ = rejection._trial_block(
            g, k, prev, cr, pr, 0.5, 2.0, False, 1.0, 2
        )
        return x + ok.astype(jnp.int32)

    measure("_trial_block T=2                 ", trial2, cr, pr)

    # --- compaction + write-back machinery of one sweep (no trial work) ---
    def compact_only(g, cur, prev, k, cr, pr):
        pending = jax.random.uniform(k, (B,)) < 0.3
        s = B // rejection.COMPACT_FRACTION
        idx, valid = rejection._compact_indices(pending, s)
        out = jnp.zeros_like(cur)
        out = out.at[jnp.where(valid, idx, B)].set(1, mode="drop")
        return out

    measure("compact+write-back (s=B/8)       ", compact_only, cr, pr)

    def rowslice_only(g, cur, prev, k, cr, pr):
        s = B // rejection.FIRST_FRACTION
        idx = jax.random.randint(k, (s,), 0, B)
        sub = cr[idx]
        return jnp.zeros_like(cur).at[0].add(
            jax.lax.bitcast_convert_type(sub[:, 0], jnp.int32)[0]
        )

    measure("carried-row re-slice (s=B/2)     ", rowslice_only, cr, pr)

    # --- full-step anatomy on this graph ----------------------------------
    from pecanpy_tpu.ops import sampling, transition

    def fused_only(g, cur, prev, k, cr, pr):
        w = transition.node2vec_weights_rows(g, cr, pr, prev, 0.5, 2.0)
        c = sampling.categorical_rows(k, w)
        return sampling.pick_int_columns(g.rows_nbr(cr), c)

    measure("fused kernel + sample (no gath)  ", fused_only, cr, pr)

    def sampler_only(g, cur, prev, k, cr, pr):
        active = g.rows_is_hub(cr) | g.rows_is_hub(pr)
        return rejection.second_order_sample(
            g, k, cur, prev, cr, pr, 0.5, 2.0, False, active
        )

    measure("second_order_sample (full)       ", sampler_only, cr, pr)

    def full_step(g, cur, prev, k, cr, pr):
        k1, k2 = jax.random.split(k)
        w = transition.node2vec_weights_rows(g, cr, pr, prev, 0.5, 2.0)
        c = sampling.categorical_rows(k1, w)
        nxt = sampling.pick_int_columns(g.rows_nbr(cr), c)
        active = g.rows_is_hub(cr) | g.rows_is_hub(pr)
        nxt_r = rejection.second_order_sample(
            g, k2, cur, prev, cr, pr, 0.5, 2.0, False, active
        )
        return jnp.where(active, nxt_r, nxt)

    measure("mixed step (fused + rejection)   ", full_step, cr, pr)


if __name__ == "__main__":
    main()
