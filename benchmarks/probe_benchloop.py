"""Replicate bench.py's exact pipelined timed loop AND the breakdown
probe's loop in one process, to resolve the observed 110 ms (bench) vs
60 ms (probe) discrepancy for the same chain.  Self-bounded.
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


def main():
    import jax
    import jax.numpy as jnp

    from php_aho_corasick_tpu import Matcher, ScanConfig
    from php_aho_corasick_tpu.ops.matches import pack_documents

    print("devices:", jax.devices(), flush=True)
    rng = random.Random(1337)
    needles = set()
    while len(needles) < 2048:
        needles.add(bytes(rng.choice(b"abcdef") for _ in range(16)))
    needles = sorted(needles)
    base_docs = [
        bytes(rng.choice(b"abcdef") for _ in range(8192)) for _ in range(256)
    ]
    docs = base_docs * 64
    total = sum(map(len, docs))

    cfg = ScanConfig(backend="device", chunk_len=4096)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(needles)], cfg)
    m.finalize()
    cm = m.cascade_model
    packed = pack_documents(docs, cfg.chunk_len, m.automaton.max_len - 1)
    chunks = jnp.asarray(packed.chunks)
    lengths = jnp.asarray(packed.lengths)
    ef = jnp.asarray(packed.emit_from)

    for _ in range(2):  # settle caps through the production path
        cm.run_arrays(packed, cfg.match_capacity,
                      dev_inputs=(chunks, lengths, ef))
    cap_a, cap_b = cm.learned_caps
    print(f"caps: a={cap_a} b={cap_b} coarse={cm._cap_coarse}", flush=True)

    reps = 5
    # --- bench.py's exact loop ---
    for round_i in range(3):
        _wc, _wn, _wnf, _wnc = cm.launch_device(chunks, lengths, cap_a, cap_b)
        np.asarray(jnp.stack([_wn, _wnf, _wnc]))
        t0 = time.time()
        scalars = []
        for _ in range(reps):
            cells_last, n_d, nf_d, nc_d = cm.launch_device(
                chunks, lengths, cap_a, cap_b
            )
            scalars.extend((n_d, nf_d, nc_d))
        flat = np.asarray(jnp.stack(scalars))
        batch_dt = (time.time() - t0) / reps
        print(f"bench-style round {round_i}: {batch_dt*1e3:.1f} ms/pass "
              f"({total/batch_dt/1e9:.3f} GB/s) "
              f"n={flat[0::3].max()} nf={flat[1::3].max()} "
              f"nc={flat[2::3].max()}", flush=True)

    # --- probe-style loop (fetch last only) ---
    def chain():
        _c, n_d, nf_d, nc_d = cm.launch_device(chunks, lengths, cap_a, cap_b)
        return jnp.stack([n_d, nf_d, nc_d])

    np.asarray(chain())
    t0 = time.time()
    vals = [chain() for _ in range(8)]
    np.asarray(vals[-1])
    per = (time.time() - t0) / 8
    print(f"probe-style: {per*1e3:.1f} ms/pass ({total/per/1e9:.3f} GB/s)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
