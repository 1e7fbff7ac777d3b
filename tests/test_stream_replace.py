"""Streaming (keep=1) scanning, replace engine (NORMAL/LAZY), persistence."""

import random

import pytest

from php_aho_corasick_tpu import AhoError, Matcher, ScanConfig
from php_aho_corasick_tpu.utils.serialization import load_matcher, save_matcher


# ------------------------------------------------------------- streaming

def test_stream_finds_cross_chunk_matches(backend):
    # the inverse of test6: streaming MUST join chunks
    c = Matcher(
        [{"key": "d", "value": "defghijkl"}, {"key": "a", "value": "abcd"}],
        ScanConfig(backend=backend),
    )
    with c.stream() as st:
        r1 = st.feed("abcde")
        r2 = st.feed("fghij")
        r3 = st.feed("klmno")
    assert [x["value"] for x in r1] == ["abcd"]
    assert r2 == []
    assert [x["value"] for x in r3] == ["defghijkl"]
    assert r3[0]["pos"] == 12 and r3[0]["start_postion"] == 3


@pytest.mark.parametrize("seed", range(4))
def test_stream_equals_one_shot(seed, backend):
    rng = random.Random(seed)
    pats = list({
        bytes(rng.choice(b"ab") for _ in range(rng.randint(1, 6)))
        for _ in range(10)
    })
    text = bytes(rng.choice(b"ab") for _ in range(5000))
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(pats)],
                ScanConfig(backend=backend))
    whole = m.match(text)

    streamed = []
    with m.stream() as st:
        i = 0
        while i < len(text):
            n = rng.randint(1, 400)
            streamed.extend(st.feed(text[i : i + n]))
            i += n
    assert streamed == whole


def test_stream_reset(backend):
    m = Matcher(["abcd"], ScanConfig(backend=backend))
    st = m.stream()
    assert st.feed("ab") == []
    st.reset()
    assert st.feed("cd") == []  # no join across reset
    assert st.feed("abcd")[0]["pos"] == 6


# ------------------------------------------------------------- replace

def test_replace_basic(backend):
    m = Matcher(["cat", "dog"], ScanConfig(backend=backend))
    out = m.replace("a cat, a dog, a catalog", {"cat": "tiger", "dog": "wolf"})
    assert out == "a tiger, a wolf, a tigeralog"


def test_replace_normal_longest_swallows_factors(backend):
    # NORMAL: 'abcd' swallows nested 'bc' (replace.h:34-40)
    m = Matcher(["abcd", "bc"], ScanConfig(backend=backend))
    assert m.replace(b"xabcdx", {b"abcd": b"[A]", b"bc": b"[B]"}) == b"x[A]x"


def test_replace_normal_overlap_both_replaced(backend):
    # overlapping (not nested) patterns: both are booked; splice consumes
    # them in order, the second's overlapping bytes are gone
    m = Matcher(["abc", "cde"], ScanConfig(backend=backend))
    out = m.replace(b"zabcdez", {b"abc": b"<1>", b"cde": b"<2>"})
    assert out == b"z<1><2>z"


def test_replace_lazy_first_wins(backend):
    # LAZY: short factor 'bc' ends first inside 'abcd'?? no — 'bc' ends at 3,
    # 'abcd' ends at 4; first COMPLETED match wins (replace.h:41-46)
    m = Matcher(["abcd", "bc"], ScanConfig(backend=backend))
    assert m.replace(b"xabcdx", {b"abcd": b"[A]", b"bc": b"[B]"},
                     mode="lazy") == b"xa[B]dx"


def test_replace_only_some_patterns_have_replacements(backend):
    m = Matcher(["aa", "bb"], ScanConfig(backend=backend))
    assert m.replace(b"aabb", {b"aa": b"X"}) == b"Xbb"


def test_replace_no_replaceable_patterns_raises(backend):
    m = Matcher(["aa"], ScanConfig(backend=backend))
    with pytest.raises(AhoError):
        m.replace(b"aa", {b"zz": b"X"})  # reference: -2 (replace.c:483)


@pytest.mark.parametrize("mode", ["normal", "lazy"])
@pytest.mark.parametrize("seed", range(3))
def test_replace_stream_equals_one_shot(mode, seed, backend):
    rng = random.Random(seed)
    pats = [b"aba", b"bab", b"aa", b"abab"]
    rmap = {b"aba": b"<X>", b"aa": b"<Y>", b"abab": b"<LONG>"}
    text = bytes(rng.choice(b"ab") for _ in range(3000))
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(pats)],
                ScanConfig(backend=backend))
    want = m.replace(text, rmap, mode)

    rs = m.replace_stream(rmap, mode)
    out = bytearray()
    i = 0
    while i < len(text):
        n = rng.randint(1, 250)
        out += rs.feed(text[i : i + n])
        i += n
    out += rs.flush()
    assert bytes(out) == want


def test_replace_str_roundtrip(backend):
    m = Matcher(["héllo"], ScanConfig(backend=backend))
    assert m.replace("say héllo!", {"héllo": "goodbye"}) == "say goodbye!"


# ------------------------------------------------------------- save/load

def test_save_load_matcher(tmp_path, backend):
    pats = [
        {"key": "ab", "value": "alfa"},
        {"id": 3, "value": "zeta"},
        {"value": "lfa", "aux": {"x": 1}},
    ]
    m = Matcher(pats, ScanConfig(backend=backend))
    p = tmp_path / "m.npz"
    save_matcher(m, p, with_aux=True)
    m2 = load_matcher(p, ScanConfig(backend=backend))
    hay = "alFABETA zeta alfa!"
    assert m2.match(hay) == m.match(hay)
    assert m2.match(hay)[-1]["aux"] == {"x": 1}


def test_load_without_aux(tmp_path, backend):
    m = Matcher([{"value": "ab", "aux": object()}], ScanConfig(backend=backend))
    p = tmp_path / "m.npz"
    save_matcher(m, p)  # aux not persisted
    m2 = load_matcher(p, ScanConfig(backend=backend))
    rec = m2.match("ab")[0]
    assert rec["aux"] is None and "aux" in rec  # aux presence preserved

# ------------------------------------------------------- find-next iterator

def test_iter_matches_parity(backend):
    rng = random.Random(11)
    pats = ["ab", "bca", "aaab", "cab"]
    m = Matcher(pats, ScanConfig(backend=backend))
    text = "".join(rng.choice("abc") for _ in range(5000))
    assert list(m.iter_matches(text, segment_bytes=257)) == m.match(text)


def test_iter_matches_is_lazy(backend, monkeypatch):
    """Segment k+1 must not be scanned until segment k is exhausted."""
    import php_aho_corasick_tpu.stream as stream_mod

    m = Matcher(["xy"], ScanConfig(backend=backend))
    m.finalize()
    calls = []
    orig_feed = stream_mod.StreamScanner.feed

    def spy(self, data):
        calls.append(len(data))
        return orig_feed(self, data)

    monkeypatch.setattr(stream_mod.StreamScanner, "feed", spy)
    text = "xy" + "a" * 100 + "xy" + "b" * 100
    it = m.iter_matches(text, segment_bytes=50)
    first = next(it)
    assert first["value"] == "xy" and first["pos"] == 2
    assert len(calls) == 1  # only the first segment was scanned
    rest = list(it)
    assert len(calls) == (len(text) + 49) // 50
    assert [r["pos"] for r in rest] == [104]


def test_iter_matches_find_all_false(backend):
    m = Matcher(["ab", "b", "abc"], ScanConfig(backend=backend))
    text = "zzabczzabc"
    want = m.match(text, find_all=False)
    got = list(m.iter_matches(text, find_all=False, segment_bytes=3))
    assert got == want and len(got) > 0


def test_iter_matches_cross_segment(backend):
    m = Matcher(["abcdefgh"], ScanConfig(backend=backend))
    text = "zz" + "abcdefgh" + "zz"
    # segment boundary splits the pattern
    got = list(m.iter_matches(text, segment_bytes=5))
    assert [r["pos"] for r in got] == [10]


def test_iter_matches_empty_and_closed(backend):
    m = Matcher(["ab"], ScanConfig(backend=backend))
    assert list(m.iter_matches("")) == []
    m.close()
    with pytest.raises(AhoError):
        list(m.iter_matches("ab"))


# ------------------------------------------- device state carry (round 3)

def _brute_stream(patterns, text):
    out = []
    for p in patterns:
        start = text.find(p)
        while start != -1:
            out.append((start + len(p), -len(p), p))
            start = text.find(p, start + 1)
    out.sort()
    return [(pos, p) for pos, _, p in out]


def test_stream_device_carry_bypasses_prefix(monkeypatch):
    """Device feeds above the host threshold must carry the DFA state in
    the kernel (no Matcher.match prefix re-scan) and stay exact across
    split patterns."""
    rng = random.Random(8)
    pats = [b"wxyzwxyz", b"zzzz", b"xy"]
    cfg = ScanConfig(backend="device", host_scan_threshold=64,
                     chunk_len=512, engine="dfa")
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(pats)], cfg)
    m.finalize()
    monkeypatch.setattr(
        m, "match",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("prefix path engaged on a device-carry feed")
        ),
    )
    text = bytearray(rng.choice(b"wxyz") for _ in range(3000))
    text[100:108] = b"wxyzwxyz"
    text[1021:1029] = b"wxyzwxyz"  # will split across feeds below
    text = bytes(text)
    recs = []
    with m.stream() as st:
        for off in range(0, len(text), 1025):  # splits the planted match
            recs.extend(st.feed(text[off:off + 1025]))
    got = [(r["pos"], r["value"].encode() if isinstance(r["value"], str)
            else r["value"]) for r in recs]
    assert got == _brute_stream(pats, text)


def test_stream_mixed_carry_and_prefix_paths():
    """Feeds alternating between the device-carry path (large, dfa) and
    the host prefix path (small) must agree with the one-shot scan —
    the tail buffer and carried state stay consistent across routes."""
    rng = random.Random(9)
    pats = [b"abcabcab", b"cab"]
    cfg = ScanConfig(backend="auto", host_scan_threshold=64, chunk_len=512)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(pats)], cfg)
    text = bytearray(rng.choice(b"abc") for _ in range(2500))
    text = bytes(text)
    want = [(p, v) for p, v in _brute_stream(pats, text)]
    recs = []
    sizes = [700, 30, 900, 10, 860]  # > and < the host threshold
    with m.stream() as st:
        off = 0
        for s in sizes:
            recs.extend(st.feed(text[off:off + s]))
            off += s
        assert off == len(text)
    got = [(r["pos"], r["value"].encode() if isinstance(r["value"], str)
            else r["value"]) for r in recs]
    assert got == want


def test_stream_device_carry_compressed_table():
    pats = [b"mnopmnop", b"op"]
    cfg = ScanConfig(backend="device", host_scan_threshold=16,
                     table_format="compressed", chunk_len=256)
    m = Matcher([{"id": i, "value": p} for i, p in enumerate(pats)], cfg)
    text = (b".." + b"mnopmnop") * 80
    recs = []
    with m.stream() as st:
        for off in range(0, len(text), 301):
            recs.extend(st.feed(text[off:off + 301]))
    got = [(r["pos"], r["value"].encode() if isinstance(r["value"], str)
            else r["value"]) for r in recs]
    assert got == _brute_stream(pats, text)


def test_save_load_compressed(tmp_path, backend):
    """Format-v2 round trip of the COMPRESSED table layout — the
    signature-scale format save_matcher exists for (v1 only handled the
    dense table and crashed on CompressedAutomaton)."""
    import random

    rng = random.Random(13)
    pats = [
        {"id": i, "value": bytes(rng.choice(b"abcdef") for _ in range(10))}
        for i in range(40)
    ]
    m = Matcher(pats, ScanConfig(backend="device",
                                 table_format="compressed"))
    assert m.table_format == "compressed"
    text = bytes(rng.choice(b"abcdef") for _ in range(20000))
    expect = m.match(text)
    p = tmp_path / "sig.npz"
    save_matcher(m, p)
    m2 = load_matcher(p, ScanConfig(backend=backend,
                                    table_format="compressed"))
    assert m2.table_format == "compressed"
    assert m2.match(text) == expect
