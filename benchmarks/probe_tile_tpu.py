"""Probe 6: the VMEM-tile DFA kernel (ops/scan_pallas.scan_states_tile)
compiled for real on the chip — correctness vs the dense-DFA XLA path and
a dispatch-amortized rate.

Budget note: one Mosaic compile through the tunnel takes ~15-20 min
(probe2 measured 1025 s); this script compiles exactly ONE pallas_call
variant.  Self-bounded; never kill externally (wedges the grant).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from php_aho_corasick_tpu import Matcher, ScanConfig  # noqa: E402
from php_aho_corasick_tpu.ops.scan_jax import scan_states  # noqa: E402
from php_aho_corasick_tpu.ops.scan_pallas import scan_states_tile  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(3)
    # a few dozen short patterns: S*C <= 4096 (tile_eligible regime)
    pats = list({
        bytes(rng.integers(97, 103, rng.integers(4, 9)).astype(np.uint8))
        for _ in range(40)
    })
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(pats)],
                ScanConfig(backend="device"))
    m.finalize()
    auto = m.automaton
    SC = auto.n_states * auto.n_classes
    print(f"[probe6] S={auto.n_states} C={auto.n_classes} S*C={SC}", flush=True)
    assert SC <= 4096, "regenerate patterns: automaton exceeds tile budget"

    B, L = 8192, 2048  # 16 MiB per pass
    chunks = jnp.asarray(rng.integers(97, 103, (B, L), dtype=np.uint8))
    init = jnp.zeros((B,), jnp.int32)
    table_flat = jnp.asarray(np.ascontiguousarray(auto.table).reshape(-1))
    bc = jnp.asarray(auto.byte_class.astype(np.int32))
    ub = jnp.asarray(auto.used_bytes)

    print("[probe6] compiling tile kernel (expect ~15-20 min) ...", flush=True)
    t0 = time.perf_counter()
    states_t, carry_t = scan_states_tile(
        table_flat, bc, ub, chunks, init, n_classes=auto.n_classes,
        interpret=False,
    )
    s_t = np.asarray(states_t)
    print(f"[probe6] tile compiled+ran in {time.perf_counter()-t0:.1f}s",
          flush=True)

    # correctness vs the XLA dense scan on a subset (keep the check cheap)
    states_x, _ = scan_states(
        table_flat, bc, ub, chunks[:512], init[:512],
        n_classes=auto.n_classes,
    )
    s_x = np.asarray(states_x)
    ok = (s_t[:512] == s_x).all()
    print(f"[probe6] parity vs dense scan_states: {'OK' if ok else 'WRONG'}",
          flush=True)
    if not ok:
        bad = np.argwhere(s_t[:512] != s_x)
        print("[probe6] first mismatches:", bad[:5], flush=True)
        return 1

    # dispatch-amortized rate: queue reps, fetch once
    reps = 4
    t0 = time.perf_counter()
    outs = [
        scan_states_tile(table_flat, bc, ub, chunks, init,
                         n_classes=auto.n_classes, interpret=False)[1]
        for _ in range(reps)
    ]
    _ = [np.asarray(o) for o in outs]
    dt = (time.perf_counter() - t0) / reps
    gbps = B * L / dt / 1e9
    print(f"[probe6] tile scan: {dt*1e3:.2f} ms / 16 MiB = "
          f"{gbps:.3f} GB/s/chip", flush=True)

    # XLA dense-DFA comparison at the same shape
    _ = np.asarray(scan_states(table_flat, bc, ub, chunks, init,
                               n_classes=auto.n_classes)[1])
    t0 = time.perf_counter()
    outs = [
        scan_states(table_flat, bc, ub, chunks, init,
                    n_classes=auto.n_classes)[1]
        for _ in range(reps)
    ]
    _ = [np.asarray(o) for o in outs]
    dt_x = (time.perf_counter() - t0) / reps
    print(f"[probe6] dense scan_states: {dt_x*1e3:.2f} ms / 16 MiB = "
          f"{B*L/dt_x/1e9:.3f} GB/s/chip  (tile speedup {dt_x/dt:.1f}x)",
          flush=True)
    print("[probe6] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
