#!/usr/bin/env python
"""Signature-scale benchmark (BASELINE.json config 4): 1M needles
(virus-signature style, hex alphabet), HBM-resident transition table,
one chip.

At this scale k-gram composition exceeds any budget and anchored blooms
saturate, but the *sampled* cascade holds: a 2-probe positional bloom keeps
the filter selective at ~9M (gram, alignment) entries, and candidate
windows verify on-device.  The dense 1-gram DFA remains the fallback
comparison (gather-bound floor).  Scaling beyond one chip is the
data-parallel mesh story (bench_scaling.py).

  python benchmarks/bench_signatures.py [--needles 1000000] [--mib 64]
"""

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--needles", type=int, default=1_000_000)
    ap.add_argument("--needle-len", type=int, default=16)
    ap.add_argument("--mib", type=int, default=64)
    args = ap.parse_args()

    from php_aho_corasick_tpu import Matcher, ScanConfig, native
    from php_aho_corasick_tpu.ops.matches import pack_documents

    rng = np.random.default_rng(7)
    hexmap = np.frombuffer(b"0123456789abcdef", np.uint8)
    raw = hexmap[
        rng.integers(0, 16, (args.needles, args.needle_len), dtype=np.uint8)
    ]
    patterns = [bytes(raw[i]) for i in range(args.needles)]

    t0 = time.time()
    cfg = ScanConfig(backend="device", chunk_len=4096)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(patterns)], cfg)
    m.finalize()
    build_s = time.time() - t0
    auto = m.automaton
    print(
        f"build: {build_s:.1f}s  states={auto.n_states:,} "
        f"table={auto.table_bytes / 2**20:.0f} MiB "
        f"(native={native.available()})"
    )

    n_bytes = args.mib * 2**20
    corpus = bytearray(hexmap[rng.integers(0, 16, n_bytes, dtype=np.uint8)])
    planted = 0
    doc_sz = 2**20
    for j in range(0, n_bytes - 16, max(n_bytes // 200, 1)):
        if j % doc_sz > doc_sz - args.needle_len:
            continue  # would straddle a document boundary (docs are
            # independent; such a plant legitimately cannot match)
        corpus[j : j + 16] = patterns[j % args.needles]
        planted += 1
    docs = [bytes(corpus[i : i + doc_sz]) for i in range(0, n_bytes, doc_sz)]

    import jax.numpy as jnp

    packed = pack_documents(docs, cfg.chunk_len, auto.max_len - 1)
    ch = jnp.asarray(packed.chunks)
    ln = jnp.asarray(packed.lengths)
    ef = jnp.asarray(packed.emit_from)

    engine = m._pick_engine(n_bytes)
    cm = m.cascade_model if engine == "cascade" else None
    if cm is not None:
        print(f"engine: cascade ({cm.plan.reason}, "
              f"bloom {4 << cm.plan.log2_words >> 20} MiB, "
              f"device_verify={cm.device_verify_ok})")

        def launch():
            return sum(1 for _ in cm.run(packed, 1 << 16,
                                         dev_inputs=(ch, ln, ef)))
    else:
        print(f"engine: {engine} (dense dfa fallback)")

        def launch():
            idx, sts, n, carry = m.model.scan_compact_device(
                ch, ln, ef, None, 1 << 16
            )
            return int(n)

    n = launch()  # warm
    n = launch()  # adaptive capacities settle
    times = []
    reps = 3
    for _ in range(reps):
        t0 = time.time()
        n = launch()
        times.append(time.time() - t0)
    dt = sorted(times)[reps // 2]
    print(
        f"scan: {dt*1e3:.0f} ms for {args.mib} MiB -> "
        f"{n_bytes / dt / 1e9:.3f} GB/s/chip; matches={n} "
        f"(planted {planted})"
    )
    assert n >= planted

    # dense-DFA comparison point on the same corpus
    def launch_dfa():
        idx, sts, nd, carry = m.model.scan_compact_device(
            ch, ln, ef, None, 1 << 16
        )
        return int(nd)

    launch_dfa()
    t0 = time.time()
    launch_dfa()
    ddt = time.time() - t0
    print(f"dfa fallback: {ddt*1e3:.0f} ms -> {n_bytes / ddt / 1e9:.3f} GB/s")


if __name__ == "__main__":
    main()
