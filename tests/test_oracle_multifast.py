"""Fuzz conformance vs the REAL reference implementation.

Builds the unmodified upstream MultiFast C sources
(/root/reference/src/multifast) out-of-tree into /tmp (never vendored) with
a libc-malloc shim for its PHP allocator hooks, drives them through
tests/helpers/multifast_driver.c, and compares byte-for-byte:

* ``ac_trie_search`` (one-shot and chunked keep=1) vs ``Matcher.match`` /
  ``StreamScanner`` — exact (end_position, pattern) sequences, including
  emission order (same-end groups longest-first, ``node.c:424-441``);
* ``multifast_replace`` NORMAL/LAZY (one-shot and chunked) +
  ``multifast_rep_flush`` vs ``Matcher.replace`` / ``ReplaceStream`` —
  exact output bytes, covering nominee booking (``replace.c:222-272``),
  NORMAL overlap consumption (``replace.c:251-268``), LAZY nullification
  (``replace.c:235-249``) and the backlog cut (``replace.c:529``).
"""

from __future__ import annotations

import os
import random
import struct
import subprocess

import pytest

from php_aho_corasick_tpu import Matcher, ScanConfig

REF = "/root/reference/src/multifast"
BUILD_DIR = "/tmp/mf_oracle_test"
DRIVER = os.path.join(BUILD_DIR, "driver")
HELPER_SRC = os.path.join(os.path.dirname(__file__), "helpers", "multifast_driver.c")

HOST_CFG = ScanConfig(backend="host")
DEV_CFG = ScanConfig(backend="device", chunk_len=64)


def _build_driver() -> bool:
    if os.path.exists(DRIVER):
        return True
    if not os.path.isdir(REF):
        return False
    shim = os.path.join(BUILD_DIR, "shim")
    os.makedirs(shim, exist_ok=True)
    with open(os.path.join(shim, "php.h"), "w") as f:
        f.write("#include <stdlib.h>\n#define emalloc malloc\n#define efree free\n")
    open(os.path.join(shim, "php_ini.h"), "w").close()
    srcs = [
        HELPER_SRC,
        f"{REF}/ahocorasick.c",
        f"{REF}/node.c",
        f"{REF}/replace.c",
        f"{REF}/mpool.c",
    ]
    try:
        subprocess.run(
            ["gcc", "-O2", f"-I{shim}", f"-I{REF}", "-o", DRIVER, *srcs],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        return False
    return True


pytestmark = pytest.mark.skipif(
    not _build_driver(), reason="reference sources or gcc unavailable"
)


def run_oracle(patterns, chunks, mode=0, keep=0, replacements=None):
    """patterns: list[bytes]; replacements: dict[bytes, bytes] or None.
    Returns (statuses, matches [(pos, pid)]) for mode 0, or output bytes
    for replace modes."""
    buf = bytearray()
    buf += struct.pack("<I", len(patterns))
    for p in patterns:
        buf += struct.pack("<I", len(p)) + p
        r = None if replacements is None else replacements.get(p)
        if r is None:
            buf += struct.pack("<I", 0xFFFFFFFF)
        else:
            buf += struct.pack("<I", len(r)) + r
    buf += struct.pack("<III", mode, keep, len(chunks))
    for c in chunks:
        buf += struct.pack("<I", len(c)) + c
    out = subprocess.run(
        [DRIVER], input=bytes(buf), capture_output=True, timeout=60
    )
    assert out.returncode == 0, out.stderr.decode(errors="replace")
    if mode == 0:
        statuses, matches = [], []
        for line in out.stdout.decode().splitlines():
            kind, a, b = line.split()
            if kind == "S":
                statuses.append(int(b))
            else:
                matches.append((int(a), int(b)))
        return statuses, matches
    # replace: "S ..." status lines, then "R <len>\n" and the raw bytes
    pos = 0
    while True:
        nl = out.stdout.index(b"\n", pos)
        header = out.stdout[pos:nl].decode()
        pos = nl + 1
        if header.startswith("R "):
            break
    n = int(header[2:])
    data = out.stdout[pos:]
    assert len(data) == n, (len(data), n)
    return data


def ours_matches(matcher, text: bytes):
    return [(r["pos"], r["keyIdx"]) for r in matcher.match(text)]


def _rand_patterns(rng, alphabet, n, max_len, allow_factors=True):
    pats = []
    seen = set()
    for _ in range(n):
        if allow_factors and pats and rng.random() < 0.3:
            # factor/suffix/extension of an existing pattern (stress the
            # failure-chain emission + NORMAL swallow rules)
            base = rng.choice(pats)
            mode = rng.randrange(3)
            if mode == 0 and len(base) > 1:
                i = rng.randrange(len(base) - 1)
                cand = base[i:]
            elif mode == 1 and len(base) > 1:
                cand = base[: rng.randrange(1, len(base))]
            else:
                cand = base + bytes(rng.choices(alphabet, k=rng.randrange(1, 3)))
        else:
            cand = bytes(
                rng.choices(alphabet, k=rng.randrange(1, max_len + 1))
            )
        if cand and cand not in seen:
            seen.add(cand)
            pats.append(cand)
    return pats


def _specs(pats):
    return [{"id": i, "value": p} for i, p in enumerate(pats)]


ALPHABETS = [b"ab", b"abcd", bytes(range(256))]


@pytest.mark.parametrize("seed", range(250))
def test_match_parity_fuzz(seed):
    rng = random.Random(seed)
    alphabet = ALPHABETS[seed % len(ALPHABETS)]
    pats = _rand_patterns(rng, alphabet, rng.randrange(1, 12), 8)
    text = bytes(rng.choices(alphabet, k=rng.randrange(0, 400)))
    # plant a couple of occurrences so matches are common
    for _ in range(3):
        if pats and text:
            p = rng.choice(pats)
            i = rng.randrange(len(text) + 1)
            text = text[:i] + p + text[i:]
    _, want = run_oracle(pats, [text])
    m = Matcher(_specs(pats), HOST_CFG)
    assert ours_matches(m, text) == want


@pytest.mark.parametrize("seed", range(8))
def test_match_parity_fuzz_device(seed):
    rng = random.Random(1000 + seed)
    alphabet = ALPHABETS[seed % len(ALPHABETS)]
    pats = _rand_patterns(rng, alphabet, rng.randrange(1, 10), 6)
    text = bytes(rng.choices(alphabet, k=300))
    for _ in range(4):
        p = rng.choice(pats)
        i = rng.randrange(len(text) + 1)
        text = text[:i] + p + text[i:]
    _, want = run_oracle(pats, [text])
    m = Matcher(_specs(pats), DEV_CFG)
    assert ours_matches(m, text) == want


def test_add_status_parity():
    # duplicate / empty / overlong statuses match the reference enum
    rng = random.Random(7)
    pats = [b"abc", b"abc", b"x" * 2000, b"ab"]
    st, _ = run_oracle([b"abc", b"abc", b"ab"], [b""])
    m = Matcher(config=HOST_CFG)
    got = [int(s) for s in m.add_patterns(_specs([b"abc"]))]
    got += [int(s) for s in m.add_patterns([{"id": 1, "value": b"abc"}])]
    got += [int(s) for s in m.add_patterns([{"id": 2, "value": b"ab"}])]
    assert got == st  # SUCCESS, DUPLICATE, SUCCESS (actypes.h:118-125)


@pytest.mark.parametrize("seed", range(150))
def test_stream_parity_fuzz(seed):
    """Chunked keep=1 search vs StreamScanner: global positions, matches
    spanning chunk edges found exactly once (ahocorasick.c:236-238)."""
    rng = random.Random(100 + seed)
    alphabet = ALPHABETS[seed % len(ALPHABETS)]
    pats = _rand_patterns(rng, alphabet, rng.randrange(1, 8), 6)
    text = bytes(rng.choices(alphabet, k=rng.randrange(1, 300)))
    for _ in range(3):
        p = rng.choice(pats)
        i = rng.randrange(len(text) + 1)
        text = text[:i] + p + text[i:]
    # split into chunks at random cut points (incl. empty-adjacent cuts)
    cuts = sorted(rng.randrange(len(text) + 1) for _ in range(rng.randrange(1, 6)))
    chunks, prev = [], 0
    for c in cuts + [len(text)]:
        chunks.append(text[prev:c])
        prev = c
    _, want = run_oracle(pats, [c for c in chunks if c], keep=1)
    m = Matcher(_specs(pats), HOST_CFG)
    got = []
    with m.stream() as st:
        for c in chunks:
            got.extend((r["pos"], r["keyIdx"]) for r in st.feed(c))
    assert got == want


def _rand_replacements(rng, pats, alphabet, all_have=False):
    reps = {}
    for p in pats:
        if all_have or rng.random() < 0.7:
            reps[p] = bytes(rng.choices(alphabet, k=rng.randrange(0, 6)))
    if not reps and pats:
        reps[pats[0]] = b"_"
    return reps


@pytest.mark.parametrize("mode", ["normal", "lazy"])
@pytest.mark.parametrize("seed", range(150))
def test_replace_oneshot_parity_fuzz(mode, seed):
    rng = random.Random(2000 + seed)
    alphabet = ALPHABETS[seed % len(ALPHABETS)]
    pats = _rand_patterns(rng, alphabet, rng.randrange(1, 10), 8)
    reps = _rand_replacements(rng, pats, alphabet)
    text = bytes(rng.choices(alphabet, k=rng.randrange(0, 300)))
    for _ in range(4):
        if pats and True:
            p = rng.choice(pats)
            i = rng.randrange(len(text) + 1)
            text = text[:i] + p + text[i:]
    mode_i = 1 if mode == "normal" else 2
    want = run_oracle(pats, [text], mode=mode_i, replacements=reps)
    m = Matcher(_specs(pats), HOST_CFG)
    got = m.replace(text, reps, mode=mode)
    assert got == want, (pats, reps, text)


@pytest.mark.parametrize("mode", ["normal", "lazy"])
@pytest.mark.parametrize("seed", range(150))
def test_replace_stream_parity_fuzz(mode, seed):
    """Chunked replace vs the reference's backlog machinery
    (replace.c:369-393, cut at replace.c:529): final spliced output must be
    byte-identical whatever the chunking."""
    rng = random.Random(3000 + seed)
    alphabet = ALPHABETS[seed % len(ALPHABETS)]
    pats = _rand_patterns(rng, alphabet, rng.randrange(1, 8), 8)
    reps = _rand_replacements(rng, pats, alphabet)
    text = bytes(rng.choices(alphabet, k=rng.randrange(1, 300)))
    for _ in range(4):
        p = rng.choice(pats)
        i = rng.randrange(len(text) + 1)
        text = text[:i] + p + text[i:]
    cuts = sorted(rng.randrange(len(text) + 1) for _ in range(rng.randrange(1, 6)))
    chunks, prev = [], 0
    for c in cuts + [len(text)]:
        if c > prev:
            chunks.append(text[prev:c])
        prev = c
    mode_i = 1 if mode == "normal" else 2
    want = run_oracle(pats, chunks, mode=mode_i, replacements=reps)
    m = Matcher(_specs(pats), HOST_CFG)
    rs = m.replace_stream(reps, mode=mode)
    got = b"".join(rs.feed(c) for c in chunks) + rs.flush()
    assert got == want, (pats, reps, chunks)


def test_replace_backlog_cut_exact():
    """A pattern prefix dangling over a chunk edge must be held back and
    resolved by the next chunk — the replace.c:529 cut."""
    pats = [b"abcd", b"bc"]
    reps = {b"abcd": b"X", b"bc": b"Y"}
    # chunk 1 ends mid-"abcd"; NORMAL must swallow the inner "bc"
    chunks = [b"zzab", b"cdzz"]
    want = run_oracle(pats, chunks, mode=1, replacements=reps)
    m = Matcher(_specs(pats), HOST_CFG)
    rs = m.replace_stream(reps, mode="normal")
    got = b"".join(rs.feed(c) for c in chunks) + rs.flush()
    assert got == want == b"zzXzz"


def test_replace_normal_overlap_consumption():
    """Non-nested overlaps are all replaced in NORMAL mode
    (replace.c:251-268): 'abcab' + patterns abc / cab."""
    pats = [b"abc", b"cab"]
    reps = {b"abc": b"<1>", b"cab": b"<2>"}
    text = b"xabcabx"
    want = run_oracle(pats, [text], mode=1, replacements=reps)
    m = Matcher(_specs(pats), HOST_CFG)
    assert m.replace(text, reps, mode="normal") == want


def test_replace_lazy_factor_nullifies():
    """LAZY: the earlier-ending factor wins and nullifies the long pattern
    (replace.h:41-46)."""
    pats = [b"abcd", b"bc"]
    reps = {b"abcd": b"X", b"bc": b"Y"}
    text = b"zabcdz"
    want = run_oracle(pats, [text], mode=2, replacements=reps)
    m = Matcher(_specs(pats), HOST_CFG)
    assert m.replace(text, reps, mode="lazy") == want
