#!/usr/bin/env python
"""Data-parallel scaling benchmark: bytes/s efficiency at 1..N devices.

On real multi-chip hardware run as-is (the mesh spans all visible chips;
for multi-host launch one process per host with
``parallel.mesh.init_distributed`` first).  Without a pod this measures
the virtual CPU mesh — useful for validating the sharding path and the
collective overhead shape, not absolute numbers.

  python benchmarks/bench_scaling.py [--devices 8] [--mib 32]
"""

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--force-cpu", action="store_true")
    ap.add_argument(
        "--engine", choices=("dfa", "cascade"), default="dfa",
        help="dfa: sharded dense scan; cascade: the headline chained "
        "sampled-filter + window-verify shard pass",
    )
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    if args.force_cpu or len(jax.devices()) < 2:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from php_aho_corasick_tpu.utils import next_pow2 as _next_pow2
    from php_aho_corasick_tpu import Matcher, ScanConfig
    from php_aho_corasick_tpu.ops.matches import pack_documents
    from php_aho_corasick_tpu.parallel.mesh import data_mesh
    from php_aho_corasick_tpu.parallel.shard_scan import sharded_scan_compact

    rng = np.random.default_rng(5)
    alphabet = np.frombuffer(b"abcdef", np.uint8)
    pats = list({
        bytes(alphabet[rng.integers(0, 6, 16)]) for _ in range(2048)
    })
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(pats)],
                ScanConfig(backend="device", engine=args.engine,
                           bloom_impl="take"))
    m.finalize()
    auto = m.automaton
    cm = m.cascade_model if args.engine == "cascade" else None
    if args.engine == "cascade":
        assert cm is not None and cm.device_verify_ok, "cascade ineligible"

    n_bytes = args.mib * 2**20
    corpus = bytes(alphabet[rng.integers(0, 6, n_bytes)])
    docs = [corpus[i : i + 2**20] for i in range(0, n_bytes, 2**20)]
    packed = pack_documents(docs, 2048, auto.max_len - 1,
                            batch_pad=len(jax.devices()) * 8)

    results = {}
    all_devices = jax.devices()
    for nd in [1, 2, 4, len(all_devices)]:
        if nd > len(all_devices) or nd in results:
            continue
        mesh = data_mesh(all_devices[:nd])
        row = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        dev = {
            "table_flat": jax.device_put(
                jnp.asarray(np.ascontiguousarray(auto.table).reshape(-1)), rep
            ),
            "byte_class": jax.device_put(
                jnp.asarray(auto.byte_class.astype(np.int32)), rep
            ),
            "used_bytes": jax.device_put(jnp.asarray(auto.used_bytes), rep),
            "final_start": jax.device_put(jnp.int32(auto.final_start), rep),
        }
        ch = jax.device_put(jnp.asarray(packed.chunks), row)
        ln = jax.device_put(jnp.asarray(packed.lengths), row)
        ef = jax.device_put(jnp.asarray(packed.emit_from), row)
        init = jax.device_put(
            jnp.zeros((packed.batch,), jnp.int32), row
        )

        if args.engine == "cascade":
            from php_aho_corasick_tpu.parallel.shard_scan import (
                sharded_sampled_verified,
            )

            # capacities are PER SHARD (verify_windows walks the full
            # static capacity, so over-provisioning multiplies phase-B
            # work by n_shards): estimated global hits / nd, 8x headroom
            est_hits = int(
                cm.plan.est_cand_density * n_bytes * cm.plan.stride
            )
            cap_hits = max(2048, _next_pow2(8 * est_hits // nd))

            def launch():
                cells, nfs, gh, gf, _gc = sharded_sampled_verified(
                    mesh, cm, ch, ln, cap_hits=cap_hits, cap_flagged=2048,
                )
                stats = np.asarray(jnp.stack([gh, gf]))
                assert stats[0, 1] <= cap_hits and stats[1, 1] <= 2048, stats
                return int(stats[0, 0])
        else:
            def launch():
                idx, sts, counts, gstats, carry = sharded_scan_compact(
                    mesh, dev, ch, init, ln, ef,
                    n_classes=auto.n_classes, capacity=4096,
                )
                return int(np.asarray(gstats)[0])  # psum global match count

        launch()
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            launch()
        dt = (time.time() - t0) / reps
        gbps = n_bytes / dt / 1e9
        results[nd] = gbps
        eff = gbps / (results[1] * nd) if 1 in results and nd > 1 else 1.0
        print(f"devices={nd}: {gbps:.3f} GB/s  efficiency={eff * 100:.0f}%")


if __name__ == "__main__":
    main()
