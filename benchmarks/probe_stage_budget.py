"""Round-5 probe: stage budget of the headline records pass (VERDICT r4
weak #1 — the round-4 table recorded the history, not the current
decomposition).  Times, pipelined (8 launches, ONE trailing fetch each):

  prep     corpus word pack + phase split + grid padding (per-launch XLA
           passes over the whole corpus inside filter_hits_sampled_vmem)
  fused    the Mosaic kernel alone on pre-packed phases (production args:
           prefix_on, headline bloom plan)
  filter   filter_hits_sampled_vmem end to end (prep + fused + stage-2a
           prefix probe + survivor compaction)
  records  launch_device_records (filter + verify_windows_records)
  public   match_arrays_many([handle] * 8) — the bench headline

Deltas between rows are the per-stage costs.  Self-bounded; never kill
externally (axon grant wedges).
"""

import json
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
from php_aho_corasick_tpu.ops.filter_jax import FUSED_BLOCK_R  # noqa: E402
from php_aho_corasick_tpu.ops.filter_pallas import (  # noqa: E402
    fused_sampled_extract,
)

REPS = 8


def fetch(x):
    return np.asarray(x)  # axon: block_until_ready does not block


def timed(label, launch, results):
    """Pipelined timing: REPS launches, one trailing scalar fetch."""
    launch()  # warm
    times = []
    for _ in range(3):
        t0 = time.time()
        accs = [launch() for _ in range(REPS)]
        fetch(jnp.stack([a.reshape(-1)[0] for a in accs]))
        times.append((time.time() - t0) / REPS)
    times.sort()
    ms = times[1] * 1e3
    print(f"{label:>8}: {ms:7.2f} ms/pass  (spread "
          f"{times[0]*1e3:.2f}..{times[2]*1e3:.2f})")
    results[label] = round(ms, 2)
    return ms


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
    docs = base_docs * 64  # 128 MiB

    cfg = ScanConfig(backend="device", chunk_len=4096)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(needles)], cfg)
    m.finalize()
    cm = m.cascade_model
    p = cm.plan
    print("plan:", p.reason, "| records_ok:", cm.records_ok)

    handle = m.device_corpus(docs)
    m.match_arrays(handle)  # settle capacities + warm
    m.match_arrays(handle)
    chunks_d, lengths_d, emit_from_d = handle.dev_inputs
    B, L = chunks_d.shape
    results = {}

    # ---- prep: word pack + phase split + grid padding (what the filter
    # re-does per launch on a RESIDENT corpus)
    spc = p.stride // 4
    M = L // p.stride
    n_grid = B * M
    R = -(-n_grid // 128)
    n_blocks = max(1, -(-R // FUSED_BLOCK_R))
    R_pad = n_blocks * FUSED_BLOCK_R

    @jax.jit
    def prep(chunks):
        wc = None
        for k in range(4):
            part = chunks[:, k::4].astype(jnp.uint32) << jnp.uint32(8 * k)
            wc = part if wc is None else (wc | part)
        wc = jax.lax.bitcast_convert_type(wc, jnp.int32)
        phases = [wc[:, q::spc] for q in range(spc)]

        def to_grid(x):
            xf = x.reshape(-1)
            padn = (R_pad + 8) * 128 - xf.shape[0]
            xf = jnp.concatenate([xf, jnp.zeros((padn,), xf.dtype)])
            return xf.reshape(R_pad + 8, 128)

        return tuple(to_grid(ph) for ph in phases)

    timed("prep", lambda: prep(chunks_d)[0], results)
    phase_g = tuple(jnp.asarray(x) for x in prep(chunks_d))

    # ---- fused kernel alone, production args
    dev = cm.device_arrays
    mll = jnp.asarray(np.int32(p.min_long_len)).reshape(1, 1)
    mpr = min(128, max(8, -(-cm._cap_coarse // 8) * 8))
    kw = dict(
        salts=p.vmem_salts, log2_rows=p.vmem_log2_rows, pack=p.vmem_pack,
        q=p.q, spc=spc, mpr=mpr, block_r=FUSED_BLOCK_R, n_grid=n_grid,
        l16=p.prefix_len, prefix_on=True,
    )

    def fused():
        out = fused_sampled_extract(
            dev["vmem_table"], phase_g, None, mll, **kw
        )
        return out[4]

    timed("fused", fused, results)

    # ---- full filter (prep + fused + stage-2a + compaction)
    cap_a = max(cm._cap_hits, 256)

    def filt():
        idx, lw, sw, n_d, nc_d = cm.scan_hits_sampled(
            chunks_d, lengths_d, cap_a
        )
        return n_d.reshape(1)

    timed("filter", filt, results)

    # ---- filter with the resident phase cache (no per-launch prep)
    def filt_p():
        idx, lw, sw, n_d, nc_d = cm.scan_hits_sampled(
            chunks_d, lengths_d, cap_a, phase_g=phase_g
        )
        return n_d.reshape(1)

    timed("filterP", filt_p, results)

    # ---- records chain (filter + verify_windows_records)
    cap_r = max(cm._cap_flagged, 256)

    def rec():
        rc, rp, n_d, nr_d, nc_d = cm.launch_device_records(
            chunks_d, lengths_d, emit_from_d, cap_a, cap_r,
            phase_g=phase_g,
        )
        return nr_d.reshape(1)

    timed("records", rec, results)

    # ---- public path
    m.match_arrays_many([handle] * REPS)  # warm batch structure
    times = []
    for _ in range(3):
        t0 = time.time()
        m.match_arrays_many([handle] * REPS)
        times.append((time.time() - t0) / REPS)
    times.sort()
    results["public"] = round(times[1] * 1e3, 2)
    print(f"{'public':>8}: {times[1]*1e3:7.2f} ms/pass")

    total = 128 * 2**20
    print()
    print("stage deltas (ms), phase-cached chain:")
    print(f"  prep (amortized once/corpus):  {results['prep']:.2f}")
    print(f"  fused kernel:                  {results['fused']:.2f}")
    print(f"  stage2a+compact (filterP-fused): "
          f"{results['filterP'] - results['fused']:.2f}")
    print(f"  verify records (records-filterP): "
          f"{results['records'] - results['filterP']:.2f}")
    print(f"  public glue (public-records):  "
          f"{results['public'] - results['records']:.2f}")
    print(f"  public GB/s: {total / (results['public'] / 1e3) / 1e9:.2f}")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "stage_budget_last.json")
    with open(out, "w") as f:
        json.dump({"ms": results, "cap_a": cap_a, "cap_r": cap_r,
                   "mpr": mpr,
                   "at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                       time.gmtime())}, f, indent=1)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
