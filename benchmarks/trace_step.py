#!/usr/bin/env python
"""Capture a jax.profiler trace of SGNS chunk-steps and print the
per-HLO device-time budget.

This is the tool that found the round-5 scalar-gather costs (BENCH.md
"Op-level trace"): it traces a span of chunk-steps at the headline
shape, then parses the Chrome-trace JSON directly (the bundled
tensorboard_plugin_profile's generated protos are incompatible with
the installed protobuf, but the trace.json.gz carries per-event HLO
names, durations, source lines, and bytes_accessed).

Run from repo root on TPU:  python benchmarks/trace_step.py [outdir]
"""
import collections
import glob
import gzip
import json
import sys

import numpy as np

sys.path.insert(0, ".")

N = 1_000_000
WALKS = 8192
T_COLS = 81


def capture(out):
    from pecanpy_tpu.utils.retry import warmup_backend

    warmup_backend()
    import jax
    import jax.numpy as jnp

    from pecanpy_tpu.models import sgns

    rng = np.random.default_rng(0)
    walks = jnp.asarray(rng.integers(0, N, (WALKS, T_COLS), dtype=np.int32))
    eff = jnp.full((WALKS,), T_COLS, dtype=jnp.int32)
    config = sgns.SGNSConfig(seed=0)
    chunk = sgns.resolve_batch_walks(config, N, T_COLS)
    n_chunks = WALKS // chunk
    counts = sgns._count_tokens(walks, eff, N)
    keep = sgns._keep_probs(counts, config.sample)
    neg_table = jnp.asarray(
        sgns.build_negative_table(np.asarray(counts), seed=0)
    )
    key = jax.random.PRNGKey(0)
    dt = sgns.resolve_table_dtype(config, N)
    w_in, w_out = sgns._alloc_tables(key, N, config.dim, dt)
    step = sgns._make_span_step(N, config, True, chunk)
    lrs = jnp.full((n_chunks,), 0.02, jnp.float32)

    def run(a, b):
        return step(
            a, b, walks[: n_chunks * chunk], eff[: n_chunks * chunk],
            keep, neg_table, lrs, key, 0, n_chunks, 0,
        )

    w_in, w_out = run(w_in, w_out)
    np.asarray(w_in[:1])
    with jax.profiler.trace(out):
        w_in, w_out = run(w_in, w_out)
        np.asarray(w_in[:1])
    return n_chunks


def report(out, n_steps):
    paths = glob.glob(out + "/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print("no trace found under", out)
        return
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.Counter()
    for e in ev:
        if (
            e.get("ph") == "X"
            and pids.get(e["pid"]) == "/device:TPU:0"
            and "dur" in e
            and not e["name"].startswith(("jit_run", "while."))
        ):
            a = e.get("args", {})
            src = str(a.get("source", "")).split("/")[-1]
            op = str(a.get("tf_op", "")).split("/")[-1].rstrip(":")
            agg[(src, op.split(".")[0] or e["name"])] += e["dur"]
    total = sum(agg.values())
    print(f"device op time: {total / n_steps / 1e3:.2f} ms/chunk-step")
    for (src, op), us in agg.most_common(25):
        print(f"{us / n_steps / 1e3:7.3f} ms/step  {src:22s} {op[:48]}")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pecanpy_tpu_trace"
    n = capture(out)
    report(out, n)


if __name__ == "__main__":
    main()
