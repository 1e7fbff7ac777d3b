"""Round-5 probe: stage budget of the 1e-3 match-density pass (VERDICT
r4 #3: target >= 1.5 GB/s; round-5 mid-state ~0.8-0.9).  64 MiB corpus,
headline 2048x16 automaton, 66k planted matches.  Times, pipelined:

  filter    fused chain only at the settled caps (phase-cached)
  records   filter + verify_windows_records2 (the 2-step walk)
  public1   match_arrays_many([handle] * 8) — fetch + expand included
  stream    match_arrays_stream over 3 such batches (host expansion
            overlapped with the next batch's device chains)

Self-bounded; never kill externally.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random  # noqa: E402

from php_aho_corasick_tpu import Matcher, ScanConfig  # noqa: E402

REPS = 8


def fetch(x):
    return np.asarray(x)


def timed(label, launch):
    launch()
    times = []
    for _ in range(3):
        t0 = time.time()
        accs = [launch() for _ in range(REPS)]
        fetch(jnp.stack([jnp.ravel(a)[0] for a in accs]))
        times.append((time.time() - t0) / REPS)
    times.sort()
    print(f"{label:>8}: {times[1]*1e3:8.2f} ms/pass "
          f"({times[0]*1e3:.2f}..{times[2]*1e3:.2f})")
    return times[1]


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    rng = random.Random(1337)
    alphabet = b"abcdef"
    needles = set()
    while len(needles) < 2048:
        needles.add(bytes(rng.choice(alphabet) for _ in range(16)))
    needles = sorted(needles)
    base_docs = [
        bytes(rng.choice(alphabet) for _ in range(8192)) for _ in range(256)
    ]
    dens_docs = base_docs * 32  # 64 MiB
    dens_bytes = sum(map(len, dens_docs))
    n_plant = int(1e-3 * dens_bytes)
    prng = random.Random(int(1e-3 * 1e9))
    planted = [bytearray(d) for d in dens_docs]
    for _ in range(n_plant):
        di = prng.randrange(len(planted))
        off = prng.randrange(8192 - 16)
        planted[di][off : off + 16] = needles[prng.randrange(len(needles))]

    m = Matcher(
        [{"id": i, "value": p} for i, p in enumerate(needles)],
        ScanConfig(backend="device", chunk_len=4096),
    )
    m.finalize()
    cm = m.cascade_model
    cm.seed_caps(2 * n_plant, 2 * n_plant)
    hd = m.device_corpus([bytes(d) for d in planted])
    res = m.match_arrays(hd)
    m.match_arrays(hd)
    n_matches = int(res["doc"].shape[0])
    cap_a = max(cm._cap_hits, 256)
    cap_r = max(cm._cap_flagged, 256)
    print(f"matches={n_matches} cap_a={cap_a} cap_r={cap_r} "
          f"mpr={cm._cap_coarse} records2={cm.records2_ok}")
    phase_g = hd.fused_phases(cm)

    timed("filter", lambda: cm.scan_hits_sampled(
        hd.chunks_d, hd.lengths_d, cap_a, phase_g=phase_g
    )[3].reshape(1))
    timed("records", lambda: cm.launch_device_records(
        hd.chunks_d, hd.lengths_d, hd.emit_from_d, cap_a, cap_r,
        phase_g=phase_g,
    )[3].reshape(1))

    m.match_arrays_many([hd] * REPS)
    times = []
    for _ in range(3):
        t0 = time.time()
        m.match_arrays_many([hd] * REPS)
        times.append((time.time() - t0) / REPS)
    times.sort()
    print(f"{'public1':>8}: {times[1]*1e3:8.2f} ms/pass")

    batches = [[hd] * REPS for _ in range(3)]
    list(m.match_arrays_stream(batches))
    times = []
    for _ in range(3):
        t0 = time.time()
        list(m.match_arrays_stream(batches))
        times.append((time.time() - t0) / (3 * REPS))
    times.sort()
    ms = times[1] * 1e3
    print(f"{'stream':>8}: {ms:8.2f} ms/pass -> "
          f"{dens_bytes / (ms / 1e3) / 1e9:.3f} GB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
