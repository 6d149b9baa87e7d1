#!/usr/bin/env python
"""Slope-timed cost breakdown of one amortized-walker round.

Builds the bench_powerlaw Chung-Lu graph, then times each component of
``engine.generate_walks_amortized``'s round body in isolation — K
repetitions inside one jit at two rep counts, reporting the slope (the
tunnel's ~50-75 ms dispatch floor cancels exactly). Lanes are sampled by
EDGE mass (random edge endpoints), matching the hub-lane fraction a real
walk batch sees.

Run from repo root: python benchmarks/diag_amortized.py [n_nodes]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks.bench_powerlaw import build_powerlaw_graph  # noqa: E402


def slope(fn, *args, lo=4, hi=16):
    """Per-rep seconds via two in-jit rep counts.

    ``args`` are real jit arguments (NOT closure captures — a zero-arg
    jit embeds the 1M-node tables as HLO literals and the tunnel's
    remote-compile endpoint rejects the payload with HTTP 413)."""
    import jax

    fn_j = jax.jit(fn, static_argnums=0)
    out = fn_j(hi, *args)
    jax.block_until_ready(out)
    times = {}
    for k in (lo, hi):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn_j(k, *args))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[hi] - times[lo]) / (hi - lo)


def main():
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.models import engine
    from pecanpy_tpu.ops import rejection
    from pecanpy_tpu.ops.layout import build_device_csr

    import os

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(pos[0]) if pos else 1_000_000
    p, q = 0.5, 2.0
    b = int(os.environ.get("DIAG_LANES", 131_072))

    print(f"building {n}-node power-law graph...", file=sys.stderr)
    indptr, indices, data = build_powerlaw_graph(n)
    graph = build_device_csr(indptr, indices, data, degree_cap=128)
    print(f"has_hubs={graph.has_hubs}", file=sys.stderr)

    # lanes by edge mass: cur = source of a random edge, prev = a random
    # neighbor of cur (the stationary-ish mix a walk batch sees)
    rng = np.random.default_rng(0)
    e = rng.integers(0, indptr[-1], b)
    cur_h = np.searchsorted(indptr, e, side="right").astype(np.int64) - 1
    deg_h = (indptr[cur_h + 1] - indptr[cur_h]).astype(np.int64)
    prev_h = indices[
        indptr[cur_h] + (rng.random(b) * deg_h).astype(np.int64)
    ]
    cur = jnp.asarray(cur_h.astype(np.int32))
    prev = jnp.asarray(prev_h.astype(np.int32))
    cur_rows = graph.gather_rows(cur)
    prev_rows = graph.gather_rows(prev)
    is_hub = graph.rows_is_hub(cur_rows)
    ph = graph.rows_is_hub(prev_rows)
    print(
        f"lane mix: cur-hub {float(jnp.mean(is_hub)):.2f}, "
        f"prev-hub {float(jnp.mean(ph)):.2f}, "
        f"union {float(jnp.mean(is_hub | ph)):.2f}",
        file=sys.stderr,
    )
    key = jax.random.PRNGKey(0)
    alpha_np = max(1.0, 1.0 / q)

    # 0. whole-walk variants FIRST (each compile is minutes through the
    #    tunnel; the verdict usually needs only these)
    import functools

    def run_variant(label, g, undirected, Ls=(80,)):
        # graph/starts ride as jit ARGS: closure capture would inline the
        # 1M-node tables as HLO literals (tunnel rejects with HTTP 413)
        @functools.partial(jax.jit, static_argnums=(3, 4))
        def full(gg, st, k, L, und):
            return engine.generate_walks_amortized(
                gg, st, k, L, p, q, False,
                return_rounds=True, undirected=und,
            )

        for L in Ls:
            w, eff, t = full(g, cur, key, L, undirected)
            jax.block_until_ready(w)
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(
                    full(g, cur, jax.random.fold_in(key, i), L, undirected)
                )
                best = min(best, time.perf_counter() - t0)
            print(
                f"{label} L={L}: {best:.3f} s, rounds={int(t)}, "
                f"{best / int(t) * 1e3:.2f} ms/round, "
                f"{b * L / best / 1e6:.2f}M steps/s",
                flush=True,
            )

    if "--undirected-only" in sys.argv:
        run_variant("undirected atom     ", graph, True)
        return
    if "--micro-only" not in sys.argv:
        run_variant("undirected atom     ", graph, True)
        graph_cdf = build_device_csr(
            indptr, indices, data, degree_cap=128, with_cdf=True
        )
        run_variant("undirected + cdf    ", graph_cdf, True)
        run_variant("baseline (directed) ", graph, False, Ls=(40, 80))
        if "--variants-only" in sys.argv:
            return

    if "--compact-micro" in sys.argv:
        # costs of the compact-fetch-scatter building blocks at half
        # batch (S = B/2): is compacting the descriptor ops worth it?
        s = b // 2

        def c_compact(g, k, c, cu, pv, cr, pr):
            pend = jax.random.uniform(k, (b,)) < 0.63
            idx, valid = rejection._compact_indices(pend, s)
            return c + idx.sum() + valid.sum()

        def c_egather(g, k, c, cu, pv, cr, pr):
            idx = jax.random.randint(k, (s,), 0, b)
            return c + cu[idx].sum()

        def c_scatter(g, k, c, cu, pv, cr, pr):
            idx = jax.random.randint(k, (s,), 0, b)
            vals = jax.random.randint(k, (s,), 0, n)
            out = jnp.zeros((b,), jnp.int32).at[idx].set(vals, mode="drop")
            return c + out

        def c_alias_half(g, k, c, cu, pv, cr, pr):
            slot = jax.random.randint(
                k, (s,), 0, max(g.edge_pack.shape[0] * 8 - 1, 1)
            )
            rows = g.fetch_edge_slots(slot)
            return c.at[:s].add(rows[..., 0].astype(jnp.int32))

        def c_bucket_half(g, k, c, cu, pv, cr, pr):
            bkt = jax.random.randint(
                k, (s,), 0, max(g.hbuckets.shape[0] * 4 - 1, 1)
            )
            keys, vals = g.fetch_bucket(bkt)
            return c.at[:s].add(keys[..., 0])

        def rep2(body):
            def run(kk, g, cu, pv, cr, pr, init):
                def f(i, c):
                    return body(g, jax.random.fold_in(key, i), c, cu, pv,
                                cr, pr)

                return jax.lax.fori_loop(0, kk, f, init)

            return run

        for label, fn in [
            ("compact_indices B/2: ", c_compact),
            ("elt gather [S of B]: ", c_egather),
            ("elt scatter [S->B]:  ", c_scatter),
            ("alias fetch S=B/2:   ", c_alias_half),
            ("bucket fetch S=B/2:  ", c_bucket_half),
        ]:
            ms = slope(
                rep2(fn), graph, cur, prev, cur_rows, prev_rows, cur
            ) * 1e3
            print(f"{label}{ms:6.2f} ms", flush=True)
        return

    def rep(body):
        """fori_loop wrapper; everything device-side rides as jit args."""

        def run(kk, g, cu, pv, cr, pr, init):
            def f(i, c):
                return body(g, jax.random.fold_in(key, i), c, cu, pv,
                            cr, pr)

            return jax.lax.fori_loop(0, kk, f, init)

        return run

    def meas(label, body, init=None):
        ms = slope(
            rep(body), graph, cur, prev, cur_rows, prev_rows,
            cur if init is None else init,
        ) * 1e3
        print(f"{label}{ms:6.2f} ms", flush=True)

    # 1. full trial block (propose + bias + accept), mode=auto
    def trial(g, k, c, cu, pv, cr, pr):
        x, ok, _ = rejection._trial_block(
            g, k, pv, cr, pr, p, q, False,
            alpha_np, 1, None, None, mode="auto",
        )
        return c + x + ok.astype(jnp.int32)

    meas("trial block (auto):   ", trial)

    # 2. proposal alone (both paths merged, as propose() does)
    def prop(g, k, c, cu, pv, cr, pr):
        x, w = rejection.propose(g, k, cr)
        return c + x + w.astype(jnp.int32)

    meas("  propose (both):     ", prop)

    def prop_f(g, k, c, cu, pv, cr, pr):
        x, w = rejection.fused_propose(g, k, cr, False)
        return c + x + w.astype(jnp.int32)

    meas("  fused_propose:      ", prop_f)

    def prop_a(g, k, c, cu, pv, cr, pr):
        x, w = rejection.alias_propose(g, k, cr)
        return c + x + w.astype(jnp.int32)

    meas("  alias_propose:      ", prop_a)

    # 3. membership (the _bias core) on a random candidate
    def memb(g, k, c, cu, pv, cr, pr):
        x = jax.random.randint(k, (b,), 0, n)
        f, w = rejection.membership(g, x, pr)
        return c + f.astype(jnp.int32) + w.astype(jnp.int32)

    meas("  membership (auto):  ", memb)

    def memb_row(g, k, c, cu, pv, cr, pr):
        x = jax.random.randint(k, (b,), 0, n)
        f, w = rejection.membership(g, x, pr, mode="row")
        return c + f.astype(jnp.int32) + w.astype(jnp.int32)

    meas("  membership (row):   ", memb_row)

    def memb_hub(g, k, c, cu, pv, cr, pr):
        x = jax.random.randint(k, (b,), 0, n)
        f, w = rejection.membership(g, x, pr, mode="hub")
        return c + f.astype(jnp.int32) + w.astype(jnp.int32)

    meas("  membership (hub):   ", memb_hub)

    # 4. atom recompute (membership of prev in cur + wsum select)
    def atom(g, k, c, cu, pv, cr, pr):
        _, wp = rejection.membership(g, pv, cr)
        wsum = jnp.sum(g.rows_wgt(cr), axis=-1)
        wsum = jnp.where(
            g.rows_is_hub(cr), g.rows_hub_wsum(cr), wsum
        )
        th = wp / (wp + jnp.maximum(wsum, 1e-30))
        return c + th.astype(jnp.int32)

    meas("atom recompute:       ", atom)

    # 5. the one fused-row gather per round
    def gath(g, k, c, cu, pv, cr, pr):
        idx = jax.random.randint(k, (b,), 0, n)
        r = g.gather_rows(idx)
        return c + r[:, 0].astype(jnp.int32)

    meas("gather_rows [B,256]:  ", gath)

    # 6. buf writes: scatter-set vs masked where
    buf0 = jnp.zeros((b, 81), dtype=jnp.int32)
    lanes = jnp.arange(b, dtype=jnp.int32)

    def buf_scatter(g, k, bf, cu, pv, cr, pr):
        col = jax.random.randint(k, (b,), 0, 81)
        return bf.at[lanes, col].set(1, mode="drop")

    meas("buf scatter-set:      ", buf_scatter, buf0)

    def buf_where(g, k, bf, cu, pv, cr, pr):
        col = jax.random.randint(k, (b,), 0, 81)
        cols = jnp.arange(81, dtype=jnp.int32)[None, :]
        return jnp.where(cols == col[:, None], 1, bf)

    meas("buf masked where:     ", buf_where, buf0)

    # 7. carried-row select (prev_rows update)
    def rowsel(g, k, c, cu, pv, cr, pr):
        adv = jax.random.uniform(k, (b,)) < 0.5
        nr = jnp.where(adv[:, None], cr, pr)
        return c + nr[:, 0].astype(jnp.int32)

    meas("row where [B,256]:    ", rowsel)



if __name__ == "__main__":
    main()
