#!/usr/bin/env python
"""Basic usage — the analog of the reference's inline example
(``/root/reference/README.md:72-94``), in both API styles."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from php_aho_corasick_tpu import (
    Matcher,
    ahocorasick_deinit,
    ahocorasick_init,
    ahocorasick_match,
)

DATA = [
    {"key": "ab", "value": "alfa"},
    {"key": "ac", "value": "beta"},
    {"key": "ad", "value": "gamma", "aux": [1]},
    {"key": "ae", "value": "delta"},
    {"id": 0, "value": "zeta"},
    {"key": "ag", "value": "omega"},
    {"value": "lfa"},
]

# ---- PHP-parity procedural style ----
c = ahocorasick_init(DATA)
for rec in ahocorasick_match("alFABETA gamma zetaomegaalfa!", c):
    print(rec)
ahocorasick_deinit(c)

# ---- Pythonic style ----
with Matcher(DATA) as m:
    print("\nbatched:", [len(r) for r in m.match_many(["alfa!", "", "zeta zeta"])])
    print("first only:", m.match("gamma gamma", find_all=False))
    print("replace:", m.replace("alfa beta", {"alfa": "ALFA"}))
    with m.stream() as st:
        a = st.feed("al")  # no match yet ...
        b = st.feed("fa")  # ... completed across the feed boundary
        print("stream:", a, b)
    print(m.describe())
