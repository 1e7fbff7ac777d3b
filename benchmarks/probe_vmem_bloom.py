"""Probe 3 (round 3): the bank-select VMEM bloom kernel on the chip.

Measures ops/filter_pallas.bloom_word_vmem (the two-stage filter's coarse
kernel) at the headline workload scale: 16.8M codes (= 128 MiB corpus at
stride 9).  Configs sweep (n_banks, k_salts); kernel cost model is
~4 VPU ops per bank step per [8,128] tile, so rate ≈ 1024 lanes /
(4 * k * n_banks) per cycle.  Answers:
  1. does the fori_loop bank-select kernel compile on this Mosaic stack?
     (probe2 round 3: axis-0 dynamic_gather ONLY supports [8,128]; the
     first Mosaic compile of a session takes ~16 min — helper warm-up)
  2. parity vs host hashing
  3. ms per 16.8M codes vs the ~127 ms XLA take baseline

Self-bounded: fixed reps, no loops-until; never externally kill (axon
wedges — docs/PERF_NOTES.md).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from php_aho_corasick_tpu.ops.filter_jax import KNUTH  # noqa: E402
from php_aho_corasick_tpu.ops.filter_pallas import bloom_word_vmem  # noqa: E402

N_CODES = 16_800_000


def salts_for(k):
    return tuple((0x9E3779B9 * (2 * i + 1)) & 0xFFFFFFFF for i in range(k))


def host_ref(words, codes, salts, log2_rows):
    N = 1 << log2_rows
    acc = None
    for p, salt in enumerate(salts):
        h = (codes.astype(np.uint64) ^ salt) * KNUTH & 0xFFFFFFFF
        w = words[p * N + (h >> (32 - log2_rows)).astype(np.int64)]
        acc = w if acc is None else (acc & w)
    return acc


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    codes_np = rng.integers(-(2**31), 2**31, size=N_CODES, dtype=np.int64).astype(
        np.int32
    )
    codes = jnp.asarray(codes_np)
    small = codes_np[:100_000]

    # (log2_rows, k): tiny sanity first, then the planner's headline
    # candidates (n=2048 -> N=8192 k=5 picked; N=16384 k=4 alternative)
    for log2_rows, k in ((12, 2), (13, 5), (14, 4)):
        N = 1 << log2_rows
        salts = salts_for(k)
        n_banks = N // 128
        words_np = rng.integers(
            -(2**31), 2**31, size=k * N, dtype=np.int64
        ).astype(np.int32)
        table = jnp.asarray(words_np.reshape(k * n_banks, 128))
        steps = k * n_banks
        print(
            f"[probe3] N={N} k={k} ({steps} bank steps/tile, "
            f"{k*N*4//1024} KiB) compiling ...",
            flush=True,
        )
        t0 = time.perf_counter()
        try:
            out = np.asarray(
                bloom_word_vmem(table, jnp.asarray(small), salts, log2_rows)
            )
        except Exception as e:  # noqa: BLE001
            print(
                f"[probe3] N={N} k={k} FAILED: {type(e).__name__}: "
                f"{str(e)[:400]}",
                flush=True,
            )
            continue
        print(
            f"[probe3] N={N} k={k} compiled+ran in "
            f"{time.perf_counter()-t0:.1f}s",
            flush=True,
        )
        want = host_ref(words_np, small, salts, log2_rows)
        if not (out == want).all():
            bad = int((out != want).sum())
            print(
                f"[probe3] N={N} k={k} WRONG RESULT "
                f"({bad}/{small.size} mismatch)",
                flush=True,
            )
            continue
        print(f"[probe3] N={N} k={k} parity OK on 100k codes", flush=True)
        t0 = time.perf_counter()
        out_d = bloom_word_vmem(table, codes, salts, log2_rows)
        s = int(jnp.sum(out_d[:1]))  # force completion via host fetch
        print(
            f"[probe3] N={N} k={k} full-scale first call "
            f"{time.perf_counter()-t0:.1f}s",
            flush=True,
        )
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out_d = bloom_word_vmem(table, codes, salts, log2_rows)
            s += int(jnp.sum(out_d[:1]))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(
            f"[probe3] N={N} k={k}: {dt*1e3:.1f} ms / {N_CODES/1e6:.1f}M "
            f"codes ({N_CODES/dt/1e6:.0f} M codes/s; XLA take baseline "
            f"~127 ms @ 132 M lookups/s)",
            flush=True,
        )
    print("[probe3] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
