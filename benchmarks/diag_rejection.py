#!/usr/bin/env python
"""Diagnostic: pending-lane counts through the rejection sampler's phases
on the power-law bench batch — how many sweeps does the tail take, and
how full is each phase's sub-batch?

Run from repo root: python benchmarks/diag_rejection.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")
from bench_powerlaw import build_powerlaw_graph  # noqa: E402

B = 131_072


def main():
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.ops import rejection
    from pecanpy_tpu.ops.layout import build_device_csr

    n = 1_000_000
    indptr, indices, data = build_powerlaw_graph(n, exponent=2.2)
    g = build_device_csr(indptr, indices, data, degree_cap=128)
    rng = np.random.default_rng(0)
    ends = rng.integers(0, int(indptr[-1]), B)
    cur = jnp.asarray(indices[ends].astype(np.int32))
    prev = jnp.asarray(
        (np.searchsorted(indptr, ends, side="right") - 1).astype(np.int32)
    )
    key = jax.random.PRNGKey(0)

    cr = g.gather_rows(cur)
    pr = g.gather_rows(prev)
    prev_hub = np.asarray(g.rows_is_hub(pr))
    cur_hub = np.asarray(g.rows_is_hub(cr))
    active = cur_hub | prev_hub
    print(
        f"B={B}: active={active.sum()} ({100*active.mean():.1f}%), "
        f"cur-hub={cur_hub.sum()}, prev-hub={prev_hub.sum()}, "
        f"both={np.sum(cur_hub & prev_hub)}",
        flush=True,
    )

    p, q, extend = 0.5, 2.0, False
    alpha_np = max(1.0, 1.0 / q)

    import functools

    @functools.partial(jax.jit, static_argnames=("s", "trials", "mode"))
    def phase(g, cr, pr, prev, pend, nxt, k, s, trials, mode):
        # graph + rows as ARGUMENTS: closing over them bakes the tables
        # into the program as constants (blows the remote-compile upload)
        idx, valid = rejection._compact_indices(pend, s)
        prev_i = prev[idx]
        cr_i = cr[idx]
        pr_i = pr[idx]
        excess = 1.0 / p - alpha_np
        _, wp = rejection.membership(g, prev_i, cr_i)
        wsum = jnp.sum(g.rows_wgt(cr_i), axis=-1)
        wsum = jnp.where(
            g.rows_is_hub(cr_i), g.rows_hub_wsum(cr_i), wsum
        )
        theta = wp * excess / (
            wp * excess + alpha_np * jnp.maximum(wsum, 1e-30)
        )
        x_sub, ok_sub = rejection._trial_block(
            g, k, prev_i, cr_i, pr_i, p, q, extend, alpha_np, trials,
            theta, wp, mode=mode,
        )
        nxt = nxt.at[jnp.where(valid, idx, B)].set(x_sub, mode="drop")
        pend = pend.at[jnp.where(valid & ok_sub, idx, B)].set(
            False, mode="drop"
        )
        return pend, nxt, jnp.sum(valid & ok_sub), jnp.sum(valid)

    s1 = B // rejection.FIRST_FRACTION
    s2 = B // rejection.COMPACT_FRACTION
    pend_h = jnp.asarray(active & prev_hub)
    pend_n = jnp.asarray(active & ~prev_hub)
    nxt = cur
    t = 0
    for grp, pend, mode, s, trials in (
        ("h1", pend_h, "hub", s1, rejection.FIRST_ROUND_TRIALS),
        ("n1", pend_n, "row", s1, rejection.FIRST_ROUND_TRIALS),
    ):
        pend, nxt, ok, tried = phase(
            g, cr, pr, prev, pend, nxt, jax.random.fold_in(key, t),
            s, trials, mode,
        )
        print(
            f"phase {grp}: tried={int(tried)} accepted={int(ok)} "
            f"still-pending={int(jnp.sum(pend))}",
            flush=True,
        )
        if grp[0] == "h":
            pend_h = pend
        else:
            pend_n = pend
        t += 1

    sweep = 0
    while (int(jnp.sum(pend_h)) + int(jnp.sum(pend_n))) > 0 and sweep < 30:
        for grp in ("h", "n"):
            pend = pend_h if grp == "h" else pend_n
            mode = "hub" if grp == "h" else "row"
            pend, nxt, ok, tried = phase(
                g, cr, pr, prev, pend, nxt, jax.random.fold_in(key, t),
                s2, rejection.SWEEP_TRIALS, mode,
            )
            print(
                f"sweep {sweep} {grp}: tried={int(tried)} "
                f"accepted={int(ok)} still-pending={int(jnp.sum(pend))}",
                flush=True,
            )
            if grp == "h":
                pend_h = pend
            else:
                pend_n = pend
            t += 1
        sweep += 1
    print(f"total sweeps: {sweep}")


if __name__ == "__main__":
    main()
