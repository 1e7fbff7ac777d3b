"""Worker process for the 2-process ``jax.distributed`` parity test.

Each of the two processes owns 4 virtual CPU devices; the global mesh has
8.  Both processes build the same matcher and corpus, scan through the
public sharded path (``auto_shard=True`` with ``process_count == 2``
flipping every ``collect=True`` branch in api.py), and assert exact match
parity against the expected record list.  This is the real multi-host code
path of SURVEY §2.4's distributed backend — the collectives all_gather the
match buffers so every process can address them (parallel/shard_scan.py
``_maybe_collect``).

Invoked by tests/test_distributed.py:

    python distributed_worker.py <coordinator> <n_procs> <process_id>

Prints ``PARITY-OK <engine>=<n>`` lines; any assertion kills the exit code.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
)

# must be set before the CPU backend is created (see tests/conftest.py)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(coordinator: str, n_procs: int, pid: int) -> int:
    import random

    from php_aho_corasick_tpu import Matcher, ScanConfig
    from php_aho_corasick_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=coordinator,
        num_processes=n_procs,
        process_id=pid,
    )
    assert jax.process_count() == n_procs, jax.process_count()
    assert len(jax.devices()) == 4 * n_procs, jax.devices()
    assert len(jax.local_devices()) == 4

    # deterministic corpus with planted needles, identical in every process
    rng = random.Random(2024)
    patterns = sorted(
        {
            bytes(rng.choice(b"abcdef") for _ in range(16))
            for _ in range(64)
        }
    )
    docs = []
    for _ in range(12):
        d = bytearray(rng.choice(b"abcdef") for _ in range(6000))
        for _ in range(3):
            p = rng.choice(patterns)
            pos = rng.randrange(0, len(d) - len(p))
            d[pos : pos + len(p)] = p
        docs.append(bytes(d))

    def brute(pats, text):
        out = []
        for pidx, p in enumerate(pats):
            start = text.find(p)
            while start != -1:
                out.append((start + len(p), -len(p), pidx))
                start = text.find(p, start + 1)
        out.sort()
        return [(pos, pidx) for pos, _, pidx in out]

    want = [brute(patterns, d) for d in docs]
    pats = [{"id": i, "value": p} for i, p in enumerate(patterns)]

    # dense engine: sharded_scan_compact with collect=True
    # cascade engine: the chained sampled filter + window verify shard pass
    for engine in ("dfa", "cascade"):
        cfg = ScanConfig(
            backend="device", engine=engine, auto_shard=True,
            chunk_len=512, match_capacity=64,
        )
        m = Matcher(pats, cfg)
        res = m.match_many(docs)
        got = [[(r["pos"], r["keyIdx"]) for r in rl] for rl in res]
        assert got == want, (
            f"engine={engine} pid={pid}: mismatch "
            f"(got {sum(map(len, got))} want {sum(map(len, want))})"
        )
        print(f"PARITY-OK {engine}={sum(map(len, got))}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3])))
