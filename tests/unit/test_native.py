"""Native C++ tokenizer vs pure-Python oracle."""

import numpy as np
import pytest

from peppan_tpu.io import alphabet as ab, gff, native


def test_native_builds():
    assert native.available(), "g++ toolchain present; native build failed"


def test_tokenize_matches_python():
    s = b"ACGTacgtNRYKxT\x00Z"
    got = native.tokenize_dna(s)
    ref = ab.encode_dna(s)
    assert np.array_equal(got, ref)


def test_fasta_tokenize_matches_python(rng):
    # synthetic FASTA with wrapping, CRLF, blank lines, junk preamble
    recs = {}
    parts = [b"; junk preamble\r\n"]
    for i in range(5):
        name = f"ctg{i}"
        seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, rng.integers(50, 400)))
        recs[name] = seq
        parts.append(f">{name} description here\r\n".encode())
        for j in range(0, len(seq), 61):
            parts.append(seq[j:j + 61].encode() + (b"\r\n" if i % 2 else b"\n"))
        parts.append(b"\n")
    buf = b"".join(parts)
    res = native.fasta_tokenize(buf)
    assert res is not None
    assert res["names"] == list(recs)
    for i, (name, seq) in enumerate(recs.items()):
        toks = res["tokens"][res["offsets"][i]:res["offsets"][i + 1]]
        assert np.array_equal(toks, ab.encode_dna(seq)), name


def test_gff_reader_uses_native_consistently(sim4):
    """load_genomes output must be identical whether or not the native
    fast path is active."""
    _, paths = sim4
    gs1, genes1 = gff.load_genomes(paths)
    orig = native._LIB, native._TRIED
    try:
        native._LIB, native._TRIED = None, True    # force Python fallback
        gs2, genes2 = gff.load_genomes(paths)
    finally:
        native._LIB, native._TRIED = orig
    assert gs1.contig_names == gs2.contig_names
    assert np.array_equal(gs1.tokens, gs2.tokens)
    assert np.array_equal(genes1.tokens, genes2.tokens)
    assert genes1.names == genes2.names
