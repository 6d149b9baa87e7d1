#!/usr/bin/env python
"""Calibrate the Pallas applier's cost model and name its binding term.

The applier (``ops/apply.py``) is ~60% of SGNS training time yet
streams well under 10% of v5e HBM bandwidth, and single-knob sweeps are
flat — consistent with two opposing costs crossing near the default.
Per kernel pass the structural model is

    t(T, C) = t0 + h * visits + k * onehot + dma
    visits  = N/T + R/C            (grid steps: tile-side + chunk-side)
    onehot  = N*C + R*T            (visits * T*C element compares + MXU dot)
    dma     ~ table read+write (fixed) + visits * C * D (payload re-fetch)

so shrinking CHUNK cuts the dominant N*C compute term but raises the
visit count, and the two cancel — exactly the observed flatness. This
script measures a (TILE, CHUNK) grid point per subprocess (the knobs are
import-time env vars), slope-times the standalone applier at the
headline stream shapes, least-squares-fits (t0, h, k), and prints which
term binds at the default. Optionally captures a jax.profiler trace.

Run from repo root on TPU:  python benchmarks/profile_apply.py
One grid point (internal):  PECANPY_TPU_APPLY_TILE=.. _CHUNK=.. \
                            python benchmarks/profile_apply.py --one
Trace only:                 python benchmarks/profile_apply.py --trace DIR
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = 1_000_000
D = 128
# headline-shape streams (bisect_sgns round-4 split): the W_in token
# stream and the merged W_out (token + negative-pool) composite
R_IN = 100_096
R_OUT = 132_864
TABLE_DTYPE = os.environ.get("BENCH_TABLE_DTYPE", "bfloat16")
# PROFILE_ALIGN=1: allocate the table TILE-aligned, as production now
# does (sgns._alloc_tables) — removes the applier's per-call pad/slice
# table copies from the measured block. Ids still draw from [0, 1M).
ALIGN = os.environ.get("PECANPY_TPU_PROFILE_ALIGN", "0") == "1"


def _streams(rng):
    import jax.numpy as jnp

    ids_a = jnp.asarray(rng.integers(0, N, R_IN, dtype=np.int32))
    upd_a = jnp.asarray(
        rng.standard_normal((R_IN, D)).astype(np.float32) * 1e-3
    )
    cnt_a = jnp.ones((R_IN,), dtype=jnp.float32)
    ids_b = jnp.asarray(rng.integers(0, N, R_OUT - R_IN, dtype=np.int32))
    upd_b = jnp.asarray(
        rng.standard_normal((R_OUT - R_IN, D)).astype(np.float32) * 1e-3
    )
    cnt_b = jnp.ones((R_OUT - R_IN,), dtype=jnp.float32)
    return ids_a, upd_a, cnt_a, ids_b, upd_b, cnt_b


def measure_one(trace_dir=None):
    """Slope-time one (TILE, CHUNK) config of the standalone applier."""
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.ops import apply as apply_lib
    from pecanpy_tpu.utils.retry import warmup_backend

    warmup_backend()
    rng = np.random.default_rng(0)
    ids_a, upd_a, cnt_a, ids_b, upd_b, cnt_b = _streams(rng)
    n_rows = -(-N // apply_lib.TILE) * apply_lib.TILE if ALIGN else N
    table0 = jnp.zeros((n_rows, D), dtype=jnp.dtype(TABLE_DTYPE))
    lr = jnp.float32(1e-3)
    seed = jnp.int32(7)

    # one "apply block": the W_in single-stream pass + the W_out merged
    # pass, chained k times (donated buffers flow through the chain)
    def block(t_in, t_out, k):
        for i in range(k):
            t_in = apply_lib.apply_mean_updates(
                t_in, ids_a, upd_a, cnt_a, lr, use_pallas=True,
                rng_seed=seed + i,
            )
            t_out = apply_lib.apply_mean_updates_two(
                t_out, ids_a, upd_a, cnt_a, ids_b, upd_b, cnt_b, lr,
                use_pallas=True, rng_seed=seed + i,
            )
        return t_in, t_out

    lo = jax.jit(lambda a, b: block(a, b, 1))
    hi = jax.jit(lambda a, b: block(a, b, 5))
    a, b = lo(table0, jnp.zeros_like(table0))
    a, b = hi(a, b)
    np.asarray(a[:1])
    times = {}
    for name, fn in (("lo", lo), ("hi", hi)):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            a, b = fn(a, b)
            np.asarray(a[:1])
            best = min(best, time.perf_counter() - t0)
        times[name] = best
    per_block = (times["hi"] - times["lo"]) / 4

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            a, b = hi(a, b)
            np.asarray(a[:1])

    # HBM roofline reference at the same table shape: one read+write,
    # SLOPE-TIMED over SEPARATE dispatches (a single dispatch's wall
    # includes the tunnel RTT, ~25 ms here, which would drown the
    # ~0.6 ms stream; chaining multiplies inside one jit does not work
    # either — XLA fuses them into a single pass). Dispatches enqueue
    # async; only the final fetch syncs, so the RTT amortizes.
    mul = jax.jit(lambda t: t * jnp.asarray(1.0001, t.dtype),
                  donate_argnums=0)
    c = mul(a)
    np.asarray(c[:1])
    arm = {}
    for reps in (1, 9):
        arm_best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _i in range(reps):
                c = mul(c)
            np.asarray(c[:1])
            arm_best = min(arm_best, time.perf_counter() - t0)
        arm[reps] = arm_best
    best = (arm[9] - arm[1]) / 8

    return {
        "tile": apply_lib.TILE,
        "chunk": apply_lib.CHUNK,
        "v2": apply_lib.APPLY_V2,
        "window": apply_lib.K_WINDOW,
        "aligned": ALIGN,
        "block_ms": per_block * 1e3,
        "table_stream_ms": best * 1e3,
        "dtype": TABLE_DTYPE,
    }


def _visits(tile, chunk):
    """Grid steps across the two passes (both tables fully touched)."""
    v = 0.0
    for r in (R_IN, R_OUT):
        v += N / tile + r / chunk
    return v


def _onehot(tile, chunk):
    e = 0.0
    for r in (R_IN, R_OUT):
        e += N * chunk + r * tile
    return e


def fit(rows):
    """Least-squares t = t0 + h * visits + k * onehot over the grid."""
    a = np.array([[1.0, _visits(r["tile"], r["chunk"]),
                   _onehot(r["tile"], r["chunk"])] for r in rows])
    y = np.array([r["block_ms"] for r in rows])
    coef, *_ = np.linalg.lstsq(a, y, rcond=None)
    t0, h, k = coef
    pred = a @ coef
    return {
        "t0_ms": float(t0),
        "h_us_per_visit": float(h * 1e3),
        "k_ps_per_elem": float(k * 1e9),
        "residual_ms": [float(v) for v in (y - pred)],
    }


def main():
    if "--one" in sys.argv:
        out = measure_one()
        print("RESULT " + json.dumps(out), flush=True)
        return
    if "--trace" in sys.argv:
        d = sys.argv[sys.argv.index("--trace") + 1]
        out = measure_one(trace_dir=d)
        print("RESULT " + json.dumps(out), flush=True)
        print(f"trace written under {d}", flush=True)
        return

    # (tile, chunk, v2, window): v1 grid calibrates the cost model; the
    # v2 rows measure the windowed per-tile variant head-to-head
    grid = [
        (1024, 1024, 0, 512),  # default
        (1024, 512, 0, 512),
        (1024, 256, 0, 512),
        (2048, 1024, 0, 512),
        (2048, 256, 0, 512),
        (512, 1024, 0, 512),
        (512, 512, 0, 512),
        (4096, 256, 0, 512),
        (1024, 2048, 0, 512),
        (1024, 1024, 1, 1024),
        (1024, 1024, 1, 512),
        (1024, 1024, 1, 256),
        (2048, 1024, 1, 512),
        (512, 1024, 1, 512),
    ]
    rows = []
    for tile, chunk, v2, window in grid:
        env = dict(os.environ)
        env["PECANPY_TPU_APPLY_TILE"] = str(tile)
        env["PECANPY_TPU_APPLY_CHUNK"] = str(chunk)
        env["PECANPY_TPU_APPLY_V2"] = str(v2)
        env["PECANPY_TPU_APPLY_WINDOW"] = str(window)
        r = subprocess.run(
            [sys.executable, __file__, "--one"],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(f"T={tile} C={chunk} v2={v2} K={window}: FAILED\n"
                  f"{r.stdout[-500:]}\n{r.stderr[-800:]}", flush=True)
            continue
        row = json.loads(line[0][len("RESULT "):])
        rows.append(row)
        if v2:
            print(
                f"T={tile:5d} v2 K={window:4d}: block "
                f"{row['block_ms']:6.2f} ms "
                f"(table-stream ref {row['table_stream_ms']:.2f} ms)",
                flush=True,
            )
        else:
            print(
                f"T={tile:5d} C={chunk:5d}: block {row['block_ms']:6.2f} ms "
                f"(visits {int(_visits(tile, chunk))}, "
                f"onehot {_onehot(tile, chunk) / 1e9:.2f}G elems, "
                f"table-stream ref {row['table_stream_ms']:.2f} ms)",
                flush=True,
            )
    rows_v1 = [r for r in rows if not r.get("v2")]
    if len(rows_v1) >= 4:
        f = fit(rows_v1)
        print("\ncost-model fit: t = t0 + h*visits + k*onehot", flush=True)
        print(
            f"  t0 = {f['t0_ms']:.2f} ms, h = {f['h_us_per_visit']:.2f} us/"
            f"visit, k = {f['k_ps_per_elem']:.3f} ns/Kelem", flush=True,
        )
        d = rows_v1[0]
        hv = f["h_us_per_visit"] * _visits(d["tile"], d["chunk"]) / 1e3
        ko = f["k_ps_per_elem"] * _onehot(d["tile"], d["chunk"]) / 1e9
        print(
            f"  at default T={d['tile']} C={d['chunk']}: "
            f"visit term {hv:.2f} ms, onehot term {ko:.2f} ms, "
            f"base {f['t0_ms']:.2f} ms -> binding: "
            f"{'visits' if hv > ko else 'onehot'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
