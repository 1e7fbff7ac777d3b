#!/usr/bin/env python
"""Primitive micro-benchmarks behind the engine design (docs/PERF_NOTES.md).

Measures, on whatever backend JAX resolves (intended: one real TPU chip):
  - jit dispatch + scalar-fetch round-trip latency
  - gather (jnp.take) throughput vs table size
  - compaction cost: jnp.nonzero(size=) vs blocked_nonzero

These numbers drive the cascade planner's cost constants
(models/cascade.py _GATHER_S / _COMPACT_S) — re-run after any stack
change and update both.  Self-bounded; never run under an external
killer (a mid-TPU kill wedges the axon grant).

  python benchmarks/microbench_primitives.py
"""

import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from php_aho_corasick_tpu.ops.scan_jax import blocked_nonzero

    print(json.dumps({"device": str(jax.devices()[0])}))
    reps = 10

    @jax.jit
    def tiny(x):
        return x + 1

    x = jnp.zeros((), jnp.int32)
    int(tiny(x))
    t0 = time.time()
    for _ in range(reps):
        int(tiny(x))
    print(json.dumps({
        "dispatch_roundtrip_ms": round((time.time() - t0) / reps * 1e3, 2)
    }))

    N = 1 << 22
    rng = np.random.default_rng(0)
    slots20 = jnp.asarray(
        rng.integers(0, 1 << 20, N, dtype=np.int64).astype(np.int32))
    gat = jax.jit(lambda t, s: jnp.sum(jnp.take(t, s)))
    for log2 in (14, 20, 24, 26):
        table = jnp.asarray(
            rng.integers(0, 100, 1 << log2, dtype=np.int64).astype(np.int32))
        s = (
            slots20 >> (20 - log2) if log2 <= 20
            else (slots20.astype(jnp.int64) << (log2 - 20)).astype(jnp.int32)
        )
        int(gat(table, s))
        t0 = time.time()
        for _ in range(3):
            int(gat(table, s))
        ms = (time.time() - t0) / 3 * 1e3
        print(json.dumps({
            "gather_table_mib": (4 << log2) >> 20,
            "mlookups_per_s": round(N / ms / 1e3, 1),
        }))

    mask = jnp.asarray(rng.random(N) < 0.03)
    cap = 1 << 18

    plain = jax.jit(lambda m: jnp.nonzero(m, size=cap, fill_value=0)[0][0])
    blocked = jax.jit(lambda m: blocked_nonzero(m, cap)[1])
    for name, fn in [("nonzero", plain), ("blocked_nonzero", blocked)]:
        int(fn(mask))
        t0 = time.time()
        for _ in range(3):
            int(fn(mask))
        ms = (time.time() - t0) / 3 * 1e3
        print(json.dumps({
            "compaction": name, "ms_per_4m": round(ms, 1),
            "ns_per_elem": round(ms * 1e6 / N, 1),
        }))


if __name__ == "__main__":
    main()
