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


def slope(fn, lo=4, hi=16):
    """Per-rep seconds via two in-jit rep counts."""
    import jax

    fn_j = jax.jit(fn, static_argnums=0)
    out = fn_j(hi)
    jax.block_until_ready(out)
    times = {}
    for k in (lo, hi):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn_j(k))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[hi] - times[lo]) / (hi - lo)


def main():
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.models import engine
    from pecanpy_tpu.ops import rejection
    from pecanpy_tpu.ops.layout import build_device_csr

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(pos[0]) if pos else 1_000_000
    p, q = 0.5, 2.0
    b = 131_072

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
        @functools.partial(jax.jit, static_argnums=(1,))
        def full(k, L):
            return engine.generate_walks_amortized(
                g, cur, k, L, p, q, False,
                return_rounds=True, undirected=undirected,
            )

        for L in Ls:
            w, eff, t = full(key, L)
            jax.block_until_ready(w)
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(full(jax.random.fold_in(key, i), L))
                best = min(best, time.perf_counter() - t0)
            print(
                f"{label} L={L}: {best:.3f} s, rounds={int(t)}, "
                f"{best / int(t) * 1e3:.2f} ms/round, "
                f"{b * L / best / 1e6:.2f}M steps/s",
                flush=True,
            )

    if "--micro-only" not in sys.argv:
        run_variant("undirected atom     ", graph, True)
        graph_cdf = build_device_csr(
            indptr, indices, data, degree_cap=128, with_cdf=True
        )
        run_variant("undirected + cdf    ", graph_cdf, True)
        run_variant("baseline (directed) ", graph, False, Ls=(40, 80))
        if "--variants-only" in sys.argv:
            return

    def rep(k, body, init):
        def run(kk):
            def f(i, c):
                return body(jax.random.fold_in(key, i), c)

            return jax.lax.fori_loop(0, kk, f, init)

        return run

    # 1. full trial block (propose + bias + accept), mode=auto
    def trial(k, c):
        x, ok, _ = rejection._trial_block(
            graph, k, prev, cur_rows, prev_rows, p, q, False,
            alpha_np, 1, None, None, mode="auto",
        )
        return c + x + ok.astype(jnp.int32)

    print(f"trial block (auto):   {slope(rep(0, trial, cur)) * 1e3:6.2f} ms")

    # 2. proposal alone (both paths merged, as propose() does)
    def prop(k, c):
        x, w = rejection.propose(graph, k, cur_rows)
        return c + x + w.astype(jnp.int32)

    print(f"  propose (both):     {slope(rep(0, prop, cur)) * 1e3:6.2f} ms")

    def prop_f(k, c):
        x, w = rejection.fused_propose(graph, k, cur_rows, False)
        return c + x + w.astype(jnp.int32)

    print(f"  fused_propose:      {slope(rep(0, prop_f, cur)) * 1e3:6.2f} ms")

    def prop_a(k, c):
        x, w = rejection.alias_propose(graph, k, cur_rows)
        return c + x + w.astype(jnp.int32)

    print(f"  alias_propose:      {slope(rep(0, prop_a, cur)) * 1e3:6.2f} ms")

    # 3. membership (the _bias core) on a random candidate
    def memb(k, c):
        x = jax.random.randint(k, (b,), 0, n)
        f, w = rejection.membership(graph, x, prev_rows)
        return c + f.astype(jnp.int32) + w.astype(jnp.int32)

    print(f"  membership (auto):  {slope(rep(0, memb, cur)) * 1e3:6.2f} ms")

    # 4. atom recompute (membership of prev in cur + wsum select)
    def atom(k, c):
        _, wp = rejection.membership(graph, prev, cur_rows)
        wsum = jnp.sum(graph.rows_wgt(cur_rows), axis=-1)
        wsum = jnp.where(
            graph.rows_is_hub(cur_rows), graph.rows_hub_wsum(cur_rows), wsum
        )
        th = wp / (wp + jnp.maximum(wsum, 1e-30))
        return c + th.astype(jnp.int32)

    print(f"atom recompute:       {slope(rep(0, atom, cur)) * 1e3:6.2f} ms")

    # 5. the one fused-row gather per round
    def gath(k, c):
        idx = jax.random.randint(k, (b,), 0, n)
        r = graph.gather_rows(idx)
        return c + r[:, 0].astype(jnp.int32)

    print(f"gather_rows [B,256]:  {slope(rep(0, gath, cur)) * 1e3:6.2f} ms")

    # 6. buf writes: scatter-set vs masked where
    buf0 = jnp.zeros((b, 81), dtype=jnp.int32)
    lanes = jnp.arange(b, dtype=jnp.int32)

    def buf_scatter(k, bf):
        col = jax.random.randint(k, (b,), 0, 81)
        return bf.at[lanes, col].set(1, mode="drop")

    print(f"buf scatter-set:      {slope(rep(0, buf_scatter, buf0)) * 1e3:6.2f} ms")

    def buf_where(k, bf):
        col = jax.random.randint(k, (b,), 0, 81)
        cols = jnp.arange(81, dtype=jnp.int32)[None, :]
        return jnp.where(cols == col[:, None], 1, bf)

    print(f"buf masked where:     {slope(rep(0, buf_where, buf0)) * 1e3:6.2f} ms")

    # 7. carried-row select (prev_rows update)
    def rowsel(k, c):
        adv = jax.random.uniform(k, (b,)) < 0.5
        nr = jnp.where(adv[:, None], cur_rows, prev_rows)
        return c + nr[:, 0].astype(jnp.int32)

    print(f"row where [B,256]:    {slope(rep(0, rowsel, cur)) * 1e3:6.2f} ms")



if __name__ == "__main__":
    main()
