"""TPU smoke drive: public API end-to-end on the real chip (used by /verify).

Self-bounded; run single-process (one TPU user at a time on this rig).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
import random
from php_aho_corasick_tpu import (
    Matcher, ScanConfig, AhoError,
    ahocorasick_init, ahocorasick_match, ahocorasick_deinit, ahocorasick_isValid,
)

c = Matcher([{"key": "ab", "value": "alfa"}, {"value": "lfa"}],
            ScanConfig(backend="device"))
r = c.match("...alfa...")
assert r == [
    {"pos": 7, "key": "ab", "start_postion": 3, "value": "alfa"},
    {"pos": 7, "start_postion": 4, "value": "lfa"},
], r
long = c.match("x" * 100_000 + "alfa")
assert long[0]["pos"] == 100_004 and long[0]["key"] == "ab", long[0]
assert long[1]["value"] == "lfa" and len(long) == 2, long
many = c.match_many(["alfa", "no", "xxlfa"])
assert [len(x) for x in many] == [2, 0, 1]
fa = c.match("alfa lfa", find_all=False)
assert all(x["pos"] == 4 for x in fa) and fa, fa
# UTF-8 byte positions
u = Matcher([{"value": "中文"}]).match("a中文b")
assert u[0]["pos"] == 7 and u[0]["start_postion"] == 1, u

# sampled cascade on device
rng = random.Random(5)
needles = sorted({bytes(rng.choice(b"abcdef") for _ in range(16)) for _ in range(256)})
cfg = ScanConfig(backend="device", engine="cascade", cascade_mode="sampled",
                 chunk_len=2048, auto_shard=False)
m = Matcher([{"id": i, "value": p} for i, p in enumerate(needles)], cfg)
m.finalize()
assert m.cascade_model.plan.mode == "sampled", m.cascade_model.plan.reason
doc = bytearray(rng.choice(b"abcdef") for _ in range(200_000))
doc[777:793] = needles[42]
doc[150_000:150_016] = needles[7]
recs = m.match(bytes(doc))
host = Matcher([{"id": i, "value": p} for i, p in enumerate(needles)],
               ScanConfig(backend="host")).match(bytes(doc))
assert recs == host, (len(recs), len(host))
assert any(r["keyIdx"] == 42 and r["pos"] == 793 for r in recs)

# compat lifecycle + errors
h = ahocorasick_init([{"key": "k", "value": "v"}])
assert ahocorasick_match("avb", h) and ahocorasick_isValid(h)
assert ahocorasick_deinit(h) and not ahocorasick_isValid(h)
try:
    Matcher([{"id": "notanint", "value": "x"}])
    raise SystemExit("expected AhoError")
except AhoError:
    pass
st = Matcher(["dup", "dup"])  # duplicate silently dropped from automaton
assert [s.name for s in st._statuses] == ["SUCCESS", "DUPLICATE_PATTERN"]

# round-4 surfaces: device-resident corpus handles + pipelined records
# path, match-dense corpus, vs the host backend (exact parity)
docs = []
for _ in range(8):
    d = bytearray(rng.choice(b"abcdef") for _ in range(30_000))
    for _ in range(40):  # dense plants exercise the record slots
        p = needles[rng.randrange(len(needles))]
        pos = rng.randrange(0, len(d) - 16)
        d[pos : pos + 16] = p
    docs.append(bytes(d))
handle = m.device_corpus(docs)
dev_many = m.match_many(handle)
host_m = Matcher([{"id": i, "value": p} for i, p in enumerate(needles)],
                 ScanConfig(backend="host"))
host_many = host_m.match_many(docs)
assert dev_many == host_many, (
    [len(x) for x in dev_many], [len(x) for x in host_many]
)
arr = m.match_arrays(handle)
outs = m.match_arrays_many([handle, handle])
import numpy as _np
for o in outs:
    for k in ("doc", "pos", "start_postion", "pattern"):
        _np.testing.assert_array_equal(o[k], arr[k])
n_recs = int(arr["doc"].shape[0])
assert n_recs == sum(map(len, host_many))

# tile engine auto-selected for small automata on TPU
tm = Matcher([{"id": i, "value": p} for i, p in enumerate(
    [b"abca", b"cab", b"bb"])], ScanConfig(backend="device"))
tm.finalize()
assert tm._pick_engine(1 << 20) == "tile"
ttext = bytes(rng.choice(b"abc") for _ in range(40_000))
assert tm.match(ttext) == Matcher(
    [{"id": i, "value": p} for i, p in enumerate([b"abca", b"cab", b"bb"])],
    ScanConfig(backend="host"),
).match(ttext)

print(f"VERIFY DRIVE OK: {len(recs)} cascade records, "
      f"{n_recs} handle records, tile ok; device =", end=" ")
import jax; print(jax.devices()[0])

# hardware kernel parity suite (VERDICT r4 weak #4): the Mosaic bit-
# exactness assertions, promoted from manually-run probes to pytest
# (tests/test_tpu_hw.py).  Runs in THIS process (one TPU user at a
# time); the persistent compile cache makes re-runs cheap.
import os as _os

if _os.environ.get("AHO_SMOKE_SKIP_HW_TESTS") != "1":
    _os.environ["AHO_TPU_TESTS"] = "1"
    import pytest as _pytest

    _repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    rc = _pytest.main(
        ["-m", "tpu", "-q", "--no-header",
         _os.path.join(_repo, "tests", "test_tpu_hw.py")]
    )
    assert rc == 0, f"hardware kernel tests failed (pytest rc={rc})"
    print("HW KERNEL TESTS OK (pytest -m tpu)")
