"""CLI smoke tests (python -m php_aho_corasick_tpu ...)."""

import json

from php_aho_corasick_tpu.__main__ import main


def test_cli_scan_replace_build_info(tmp_path, capsys):
    pats = tmp_path / "pats.txt"
    pats.write_bytes(b"alfa\ngamma\nlfa\n")
    corpus = tmp_path / "c.bin"
    corpus.write_bytes(b"xx alfa then gamma!")
    repl = tmp_path / "r.tsv"
    repl.write_bytes(b"alfa\tALPHA\ngamma\tGAMMA\n")
    out = tmp_path / "out.bin"
    auto = tmp_path / "a.npz"

    assert main(["scan", "-p", str(pats), "-i", str(corpus),
                 "--backend", "host"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [(r["pos"], r["pattern"]) for r in lines] == [
        (7, "alfa"), (7, "lfa"), (18, "gamma"),
    ]

    assert main(["replace", "-p", str(pats), "-r", str(repl),
                 "-i", str(corpus), "-o", str(out), "--backend", "host"]) == 0
    assert out.read_bytes() == b"xx ALPHA then GAMMA!"

    assert main(["build", "-p", str(pats), "-o", str(auto),
                 "--backend", "host"]) == 0
    assert main(["info", "-m", str(auto)]) == 0
    assert "13 states" in capsys.readouterr().out


def test_warmup(tmp_path):
    from php_aho_corasick_tpu import Matcher, ScanConfig

    m = Matcher(["abc"], ScanConfig(backend="device"))
    m.warmup(doc_bytes=512, n_docs=2)  # compiles without error
    assert m.match("xxabc")[0]["pos"] == 5
