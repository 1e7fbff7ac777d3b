"""Probe 7: headline pass decomposition AFTER the slab-scan filter change.

bench.py measures 205 ms / 128 MiB total; probe5 measured the slab-scan
gather at 127 ms.  This probe times, on the real corpus at the learned
capacities: (a) the filter kernel alone, (b) the full filter->verify
chain, (c) verify_windows alone — to attribute the remaining ~78 ms.

Self-bounded; never kill externally.
"""
from __future__ import annotations

import random
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from php_aho_corasick_tpu import Matcher, ScanConfig  # noqa: E402
from php_aho_corasick_tpu.ops.matches import pack_documents  # noqa: E402


def timed(name, fn, reps=4):
    out = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[-1])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    _ = [np.asarray(jax.tree_util.tree_leaves(o)[-1]) for o in outs]
    dt = (time.perf_counter() - t0) / reps
    print(f"[probe7] {name:36s} {dt * 1e3:8.2f} ms/pass", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = random.Random(1337)
    alphabet = b"abcdef"
    needles = set()
    while len(needles) < 2048:
        needles.add(bytes(rng.choice(alphabet) for _ in range(16)))
    base_docs = [
        bytes(rng.choice(alphabet) for _ in range(8192)) for _ in range(256)
    ]
    docs = base_docs * 64  # 128 MiB
    cfg = ScanConfig(backend="device", chunk_len=4096)
    m = Matcher(
        [{"id": i, "value": p} for i, p in enumerate(sorted(needles))], cfg
    )
    m.finalize()
    auto = m.automaton
    packed = pack_documents(docs, cfg.chunk_len, auto.max_len - 1)
    chunks = jnp.asarray(packed.chunks)
    lengths = jnp.asarray(packed.lengths)
    cm = m.cascade_model
    print(f"[probe7] plan: {cm.plan.reason}", flush=True)

    # learn capacities once (adaptive warmup, like bench)
    it = cm.run(packed, cfg.match_capacity,
                dev_inputs=(chunks, lengths, None))
    sum(1 for _ in it)
    cap_a, cap_b = cm.learned_caps
    print(f"[probe7] learned caps: {cap_a}, {cap_b}", flush=True)

    timed("filter alone (scan_hits_sampled)",
          lambda: cm.scan_hits_sampled(chunks, lengths, cap_a)[3])

    timed("filter+verify chain (launch_device)",
          lambda: cm.launch_device(chunks, lengths, cap_a, cap_b)[2])

    # verify alone on a fixed idx buffer (compiled H = cap_a)
    idx, _lw, _sw, n_d = cm.scan_hits_sampled(chunks, lengths, cap_a)
    idx = jax.block_until_ready(idx)

    from php_aho_corasick_tpu.ops.filter_jax import verify_windows

    dd = cm.dense_model.device_arrays
    dev = cm.device_arrays

    def vrun():
        return verify_windows(
            dd["table_flat"], dev["byte_class"], dev["used_bytes"],
            chunks, lengths, idx, dd["final_start"],
            n_classes=auto.n_classes, stride=cm.plan.stride,
            win_len=cm.win_len, capacity=cap_b, n_hits=cap_a,
        )[1]

    timed(f"verify alone (H={cap_a}, W={cm.win_len})", vrun)
    print("[probe7] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
