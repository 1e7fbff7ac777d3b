"""Round-3 headline breakdown: stage timing of the two-stage VMEM filter
chain on the 2048x16-needle 128 MiB workload, PIPELINED (8 back-to-back
launches, one trailing fetch) so the ~25 ms tunnel round trip amortizes.

Stages:
  codes      sampled_codes_best (the planes formulation)
  kernel     bloom_word_vmem on precomputed codes
  filter     full filter_hits_sampled_vmem (+ compactions + fine probe)
  verify     verify_windows on a fixed filter output
  chain      launch_device (filter + verify chained)
  issue      host-side time to ISSUE 8 chains (no fetch) — dispatch cost

Self-bounded; persistent compile cache; capacities settled via
run_arrays before timing.
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
    from php_aho_corasick_tpu.ops.filter_jax import verify_windows
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
    ef = jnp.asarray(packed.emit_from)
    dev = cm.device_arrays
    dd = cm.dense_model.device_arrays

    # settle adaptive capacities through the production path
    for _ in range(2):
        cm.run_arrays(packed, cfg.match_capacity, dev_inputs=(ch, ln, ef))
    cap_a, cap_b = cm.learned_caps
    print(f"caps: a={cap_a} b={cap_b} coarse={cm._cap_coarse}", flush=True)

    def piped(name, fn, fetch, reps=REPS):
        fetch(fn())  # warm
        t0 = time.time()
        vals = [fn() for _ in range(reps)]
        fetch(vals[-1])
        per = (time.time() - t0) / reps
        print(f"{name:8s} {per*1e3:7.1f} ms/launch ({total/per/1e9:.3f} GB/s)",
              flush=True)
        return per

    fetch_first = lambda v: float(jnp.reshape(v, (-1,))[0])  # noqa: E731

    piped("codes", lambda: fj.sampled_codes_best(ch, p.q, p.stride),
          fetch_first)

    codes = fj.sampled_codes_best(ch, p.q, p.stride)
    codes.block_until_ready()
    piped("kernel", lambda: bloom_word_vmem(
        dev["vmem_table"], codes, p.vmem_salts, p.vmem_log2_rows,
        pack=p.vmem_pack),
        fetch_first)

    piped("filter", lambda: cm.scan_hits_sampled(ch, ln, cap_a)[3],
          fetch_first)

    idx = cm.scan_hits_sampled(ch, ln, cap_a)[0]
    idx.block_until_ready()

    def run_verify():
        cells, nf = verify_windows(
            dd["table_flat"], dev["byte_class"], dev["used_bytes"],
            ch, ln, idx, dd["final_start"],
            n_classes=cm.auto.n_classes, stride=p.stride,
            win_len=cm.win_len, capacity=cap_b, n_hits=cap_a,
        )
        return nf

    piped("verify", run_verify, fetch_first)

    def chain():
        _c, n_d, nf_d, nc_d = cm.launch_device(ch, ln, cap_a, cap_b)
        return jnp.stack([n_d, nf_d, nc_d])

    piped("chain", chain, lambda v: np.asarray(v))

    # dispatch-only: issue 8 chains, no fetch at all
    t0 = time.time()
    outs = [chain() for _ in range(REPS)]
    issue = (time.time() - t0) / REPS
    print(f"issue    {issue*1e3:7.1f} ms/launch (host-side, no fetch)",
          flush=True)
    np.asarray(outs[-1])  # drain before exit
    return 0


if __name__ == "__main__":
    sys.exit(main())
