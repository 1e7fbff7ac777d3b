"""Round-3 headline breakdown: stage timing of the two-stage VMEM filter
chain on the 2048x16-needle 128 MiB workload (pipelined reps, one
trailing fetch per batch — the bench methodology).

Stages timed independently (each own jit chain, 3 reps, min):
  codes      sampled_gram_codes only
  coarse     codes + bloom_word_vmem (the Mosaic kernel)
  filter     full filter_hits_sampled_vmem (+ compactions + fine probe)
  chain      filter + verify_windows (= launch_device)

Self-bounded; uses the persistent compile cache.
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
    from php_aho_corasick_tpu.ops.filter_jax import sampled_gram_codes
    from php_aho_corasick_tpu.ops.filter_pallas import bloom_word_vmem
    from php_aho_corasick_tpu.ops.matches import pack_documents

    print("devices:", jax.devices(), flush=True)
    rng = random.Random(1337)
    needles = set()
    while len(needles) < 2048:
        needles.add(bytes(rng.choice(b"abcdef") for _ in range(16)))
    docs = [
        bytes(rng.choice(b"abcdef") for _ in range(8192)) for _ in range(256)
    ] * 64  # 128 MiB
    total = sum(map(len, docs))

    cfg = ScanConfig(backend="device", chunk_len=4096)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(sorted(needles))], cfg)
    m.finalize()
    cm = m.cascade_model
    p = cm.plan
    print(f"plan: {p.reason}; vmem N={1 << p.vmem_log2_rows} k={len(p.vmem_salts)}",
          flush=True)
    packed = pack_documents(docs, cfg.chunk_len, m.automaton.max_len - 1)
    ch = jnp.asarray(packed.chunks)
    ln = jnp.asarray(packed.lengths)
    dev = cm.device_arrays

    def timed(name, fn, reps=3):
        fn()  # warm/compile
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{name:8s} {dt*1e3:7.1f} ms  ({total/dt/1e9:.3f} GB/s)",
              flush=True)
        return dt

    # codes only
    def run_codes():
        c = sampled_gram_codes(ch, p.q, p.stride)
        return float(jnp.sum(c[0, :1]))

    timed("codes", run_codes)

    # codes + coarse kernel
    def run_coarse():
        c = sampled_gram_codes(ch, p.q, p.stride)
        w = bloom_word_vmem(dev["vmem_table"], c, p.vmem_salts,
                            p.vmem_log2_rows)
        return float(jnp.sum(w[0, :1]))

    timed("coarse", run_coarse)

    # full filter
    cap_a, _ = cm.learned_caps

    def run_filter():
        idx, lw, sw, n, nc = cm.scan_hits_sampled(ch, ln, cap_a)
        return np.asarray(jnp.stack([n, nc]))

    timed("filter", run_filter)

    # full chain (filter + verify), pipelined x4 with one trailing fetch
    cap_a, cap_b = cm.learned_caps

    def run_chain():
        scalars = []
        for _ in range(4):
            _c, n_d, nf_d, nc_d = cm.launch_device(ch, ln, cap_a, cap_b)
            scalars.extend((n_d, nf_d, nc_d))
        flat = np.asarray(jnp.stack(scalars))
        assert (flat[0::3] <= cap_a).all() and (flat[2::3] <= cm._cap_coarse).all()
        return flat

    run_chain()
    t0 = time.time()
    run_chain()
    dt = (time.time() - t0) / 4
    print(f"{'chain':8s} {dt*1e3:7.1f} ms/pass pipelined "
          f"({total/dt/1e9:.3f} GB/s)", flush=True)
    print(f"caps: a={cap_a} b={cap_b} coarse={cm._cap_coarse}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
