"""Probe 3: the production lane-partitioned VMEM bloom kernel on the chip.

Measures ops/filter_pallas.bloom_word_vmem (round-3 filter design) at the
headline workload scale: 16.8M codes (= 128 MiB corpus at stride 9), k=6
salted probes, table [N, 128] for N in {16384, 32768, 65536} (8/16/32 MiB
VMEM).  Answers:
  1. does the [N,128] axis-0 dynamic_gather compile at production N?
     (= empirical v5e VMEM capacity for a resident table + io blocks)
  2. parity vs the host reference on random codes
  3. ms/pass vs the ~127 ms XLA take baseline (docs/PERF_NOTES.md round-2)

Self-bounded: fixed rep counts, no loops-until; never externally kill
(axon wedges — PERF_NOTES.md).
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
SALTS = tuple((0x9E3779B9 * (2 * i + 1)) & 0xFFFFFFFF for i in range(6))


def host_ref(words: np.ndarray, codes: np.ndarray, salts, log2_rows):
    acc = None
    for salt in salts:
        h = (codes.astype(np.uint64) ^ salt) * KNUTH & 0xFFFFFFFF
        rows = (h >> (32 - log2_rows)).astype(np.int64)
        got = words[rows]
        acc = got if acc is None else (acc & got)
    return acc


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)
    codes_np = rng.integers(-(2**31), 2**31, size=N_CODES, dtype=np.int64).astype(
        np.int32
    )
    codes = jnp.asarray(codes_np)
    small = codes_np[:100_000]

    for log2_rows in (14, 15, 16):
        N = 1 << log2_rows
        words_np = rng.integers(-(2**31), 2**31, size=N, dtype=np.int64).astype(
            np.int32
        )
        table = jnp.broadcast_to(jnp.asarray(words_np)[:, None], (N, 128))
        mib = N * 128 * 4 / 2**20
        print(f"[probe3] N={N} ({mib:.0f} MiB VMEM table) compiling ...",
              flush=True)
        t0 = time.perf_counter()
        try:
            out = np.asarray(
                bloom_word_vmem(table, jnp.asarray(small), SALTS, log2_rows)
            )
        except Exception as e:  # noqa: BLE001
            print(f"[probe3] N={N} FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
            continue
        print(f"[probe3] N={N} compiled+ran in {time.perf_counter()-t0:.1f}s",
              flush=True)
        want = host_ref(words_np, small, SALTS, log2_rows)
        if not (out == want).all():
            bad = int((out != want).sum())
            print(f"[probe3] N={N} WRONG RESULT ({bad}/{small.size} mismatch)",
                  flush=True)
            continue
        print(f"[probe3] N={N} parity OK on 100k codes", flush=True)
        # full-scale timing (new shape => one more compile)
        t0 = time.perf_counter()
        out_d = bloom_word_vmem(table, codes, SALTS, log2_rows)
        s = int(jnp.sum(out_d[:1]))  # force completion via host fetch
        print(f"[probe3] N={N} full-scale first call {time.perf_counter()-t0:.1f}s",
              flush=True)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out_d = bloom_word_vmem(table, codes, SALTS, log2_rows)
            s += int(jnp.sum(out_d[:1]))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(
            f"[probe3] N={N}: {dt*1e3:.1f} ms / {N_CODES/1e6:.1f}M codes x "
            f"{len(SALTS)} probes = {N_CODES*len(SALTS)/dt/1e6:.0f} M lookups/s "
            f"(XLA take baseline: ~132 M/s, 127 ms for 1 probe)",
            flush=True,
        )
    print("[probe3] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
