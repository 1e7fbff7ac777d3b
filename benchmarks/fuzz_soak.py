"""Randomized cross-config soak: public API vs brute force.

Sweeps pattern shapes x engines x chunk lengths x densities x find_all
x handles on the CPU backend (run under the test env for the virtual
mesh).  Not part of the pytest suite (runtime-bounded dev tool):

    JAX_PLATFORMS=cpu python benchmarks/fuzz_soak.py [--seconds 600]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax

jax.config.update("jax_platforms", "cpu")

from php_aho_corasick_tpu import Matcher, ScanConfig  # noqa: E402


def brute(patterns, text):
    out = []
    for pid, p in enumerate(patterns):
        s = text.find(p)
        while s != -1:
            out.append((s + len(p), -len(p), pid))
            s = text.find(p, s + 1)
    out.sort()
    return [(pos, pid) for pos, _, pid in out]


def one_case(rng: random.Random) -> dict:
    alpha = rng.choice([b"ab", b"abcdef", b"abcdefgh0123", bytes(range(256))])
    n_pat = rng.randint(1, 120)
    lens = rng.choice([(1, 4), (4, 9), (9, 20), (1, 20), (16, 16)])
    patterns = list({
        bytes(rng.choice(alpha) for _ in range(rng.randint(*lens)))
        for _ in range(n_pat)
    })
    n_docs = rng.randint(1, 6)
    docs = []
    for _ in range(n_docs):
        d = bytearray(
            rng.choice(alpha) for _ in range(rng.randint(0, 12000))
        )
        for _ in range(rng.randint(0, 30)):
            p = rng.choice(patterns)
            if len(d) > len(p):
                pos = rng.randrange(0, len(d) - len(p))
                d[pos : pos + len(p)] = p
        docs.append(bytes(d))
    cfg = dict(
        backend="device",
        engine=rng.choice(["auto", "dfa", "kgram", "cascade", "tile"]),
        auto_shard=rng.random() < 0.5,
        chunk_len=rng.choice([256, 512, 1024, 4096]),
        match_capacity=rng.choice([16, 256, 4096]),
        cascade_mode=rng.choice(["auto", "sampled", "anchored"]),
        bloom_impl=rng.choice(["auto", "take", "pallas_vmem"]),
        table_format=rng.choice(["auto", "dense"]),
    )
    find_all = rng.random() < 0.8
    use_handle = rng.random() < 0.3 and not cfg["auto_shard"]
    try:
        m = Matcher(
            [{"id": i, "value": p} for i, p in enumerate(patterns)],
            ScanConfig(**cfg),
        )
    except ValueError:
        return {"skipped": "forced-engine ineligible"}
    try:
        tgt = m.device_corpus(docs) if use_handle else docs
        res = m.match_many(tgt, find_all=find_all)
    except ValueError as e:
        if "ineligible" in str(e) or "requires" in str(e) or (
            "exceeds" in str(e)
        ):
            return {"skipped": str(e)[:40]}
        raise
    for doc, recs in zip(docs, res):
        want = brute(patterns, doc)
        if not find_all and want:
            first = want[0][0]
            want = [w for w in want if w[0] == first]
        got = [(r["pos"], r["keyIdx"]) for r in recs]
        assert got == want, (cfg, find_all, use_handle, len(doc),
                             got[:5], want[:5])
    return {"ok": sum(map(len, res))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = random.Random(args.seed)
    t0 = time.time()
    n = ok = 0
    while time.time() - t0 < args.seconds:
        case_seed = rng.randrange(1 << 30)
        r = one_case(random.Random(case_seed))
        n += 1
        ok += "ok" in r
        if n % 20 == 0:
            print(f"{n} cases ({ok} scanned) in "
                  f"{time.time() - t0:.0f}s", flush=True)
    print(f"SOAK OK: {n} cases, {ok} produced scans, 0 mismatches")


if __name__ == "__main__":
    main()
