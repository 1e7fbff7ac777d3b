"""Sweep the VMEM bank-select kernel's grid-step height (block_r).

Per-bank-step cost has a dynamic-slice addressing component paid once
per block per step; at BLOCK_R=256 it amortizes over 32 tiles (~2.7 of
the measured 6.3 cyc/tile).  Larger blocks should shave it further
(VMEM at 2048 rows: in+out 2 MiB, fine).  Pipelined timing, headline
plan (N=4096 k=8), 16.8M codes.
"""
from __future__ import annotations

import os as _os
import sys
import time

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import random

import numpy as np

REPS = 8


def main():
    import jax
    import jax.numpy as jnp

    from php_aho_corasick_tpu import Matcher, ScanConfig
    from php_aho_corasick_tpu.ops import filter_jax as fj
    from php_aho_corasick_tpu.ops.filter_pallas import bloom_word_vmem

    print("devices:", jax.devices(), flush=True)
    prng = random.Random(1337)
    needles = set()
    while len(needles) < 2048:
        needles.add(bytes(prng.choice(b"abcdef") for _ in range(16)))
    cfg = ScanConfig(backend="device", chunk_len=4096)
    m = Matcher(
        [{"id": i, "value": p} for i, p in enumerate(sorted(needles))], cfg
    )
    m.finalize()
    cm = m.cascade_model
    p = cm.plan
    dev = cm.device_arrays
    print(f"plan: N={1 << p.vmem_log2_rows} k={len(p.vmem_salts)}", flush=True)

    rng = np.random.default_rng(42)
    B, L = 32768, 4096
    ch = jnp.asarray(rng.integers(0, 256, (B, L), dtype=np.uint8))
    total = B * L
    codes = fj.sampled_codes_best(ch, p.q, p.stride)
    codes.block_until_ready()

    ref = None
    for br in (256, 512, 1024, 2048):
        fn = lambda: bloom_word_vmem(  # noqa: E731
            dev["vmem_table"], codes, p.vmem_salts, p.vmem_log2_rows,
            block_r=br,
        )
        out = fn()
        got = np.asarray(out)
        if ref is None:
            ref = got
        else:
            assert (got == ref).all(), f"block_r={br} output mismatch"
        t0 = time.time()
        vals = [fn() for _ in range(REPS)]
        float(jnp.reshape(vals[-1], (-1,))[0])
        per = (time.time() - t0) / REPS
        print(f"block_r={br:5d}  {per*1e3:7.2f} ms/launch "
              f"({total/per/1e9:6.3f} GB/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
