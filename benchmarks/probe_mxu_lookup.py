"""Probe 4: dispatch-amortized gather vs one-hot-MXU lookup rates.

probe_gather_variants.py (probe3b) timed every rep with a blocking scalar
fetch, so each number carries the ~24 ms tunnel round-trip
(docs/PERF_NOTES.md).  The one-hot bf16 row-select measured 23 ms -- i.e.
possibly ~0 ms of actual compute.  This probe chains K slabs of identical
work inside ONE jit (lax.scan with a carried checksum) and times K=1 vs
K=8; the slope isolates per-slab compute from dispatch latency.

Variants:
  g1  flat take, N=4.2M int32 lookups per slab      (the 72-78 M/s wall)
  m1  one-hot bf16 row-select, B rows from [W,128]  (MXU path)
  m2  full bloom-bit probe: row-select + lane pick  (candidate kernel)
  m3  m2 with W=16384 (2 Mbit table)

Self-bounded; never kill externally (axon grant wedges).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, make_fn, args, units, reps=3):
    """make_fn(K) -> jitted fn over args returning a scalar checksum."""
    out = {}
    for K in (1, 8):
        f = make_fn(K)
        r = np.asarray(f(*args))  # compile + sync
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            times.append(time.perf_counter() - t0)
        out[K] = min(times)
    per_slab = (out[8] - out[1]) / 7.0
    rate = units / per_slab / 1e6 if per_slab > 1e-9 else float("inf")
    print(
        f"[probe4] {name:40s} K1={out[1]*1e3:7.2f} ms K8={out[8]*1e3:7.2f} ms"
        f"  per-slab={per_slab*1e3:7.2f} ms  {rate:8.0f} M units/s",
        flush=True,
    )
    return per_slab


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    W = 1 << 20
    N = 1 << 22  # 4.2M lookups per slab
    table = jnp.asarray(rng.integers(0, W, size=W, dtype=np.int32))
    idx8 = jnp.asarray(rng.integers(0, W, size=(8, N), dtype=np.int32))

    def make_gather(K):
        @jax.jit
        def f(t, i):
            def step(acc, ii):
                return acc + jnp.sum(jnp.take(t, ii)), None
            acc, _ = jax.lax.scan(step, jnp.int32(0), i[:K])
            return acc
        return f

    timed("flat take 4.2M x slab", make_gather, (table, idx8), N)

    # --- one-hot row-select: B rows of 128 lanes from [Wb, 128] bits ---
    for Wb, B in ((4096, 1 << 15), (4096, 1 << 17), (16384, 1 << 15)):
        bits = jnp.asarray(
            rng.integers(0, 2, size=(Wb, 128)).astype(np.float32),
            dtype=jnp.bfloat16,
        )
        bidx8 = jnp.asarray(rng.integers(0, Wb, size=(8, B), dtype=np.int32))

        def make_rowsel(K, Wb=Wb):
            @jax.jit
            def f(bm, ii):
                def step(acc, iv):
                    oh = (iv[:, None] == jnp.arange(Wb)[None, :]).astype(
                        jnp.bfloat16
                    )
                    r = jax.lax.dot_general(
                        oh, bm, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return acc + jnp.sum(r), None
                acc, _ = jax.lax.scan(step, jnp.float32(0), ii[:K])
                return acc
            return f

        timed(
            f"one-hot rowsel W={Wb} B={B}",
            make_rowsel, (bits, bidx8), B,
        )

        # --- full bloom probe: row-select + lane pick -> 1 bit/probe ---
        lane8 = jnp.asarray(
            rng.integers(0, 128, size=(8, B), dtype=np.int32)
        )

        def make_probe(K, Wb=Wb):
            @jax.jit
            def f(bm, ii, ll):
                def step(acc, iv_lv):
                    iv, lv = iv_lv
                    oh = (iv[:, None] == jnp.arange(Wb)[None, :]).astype(
                        jnp.bfloat16
                    )
                    rows = jax.lax.dot_general(
                        oh, bm, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    pick = (lv[:, None] == jnp.arange(128)[None, :])
                    bitv = jnp.sum(rows * pick, axis=1)
                    return acc + jnp.sum(bitv), None
                acc, _ = jax.lax.scan(
                    step, jnp.float32(0), (ii[:K], ll[:K])
                )
                return acc
            return f

        timed(
            f"bloom probe (rowsel+lanepick) W={Wb} B={B}",
            make_probe, (bits, bidx8, lane8), B,
        )

    print("[probe4] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
