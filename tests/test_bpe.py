"""CLIP BPE tokenizer validation.

The real 49k vocab cannot ship in this zero-egress build, so correctness is
established structurally: a synthetic-but-realistic merge table is trained
in-test, written in HuggingFace format, and `tpuvdb.embed.bpe` is compared
token-by-token against `transformers.CLIPTokenizer` (an independent
implementation of the same algorithm) over an adversarial text battery.
A gated golden test checks the canonical "a photo of a cat" ids whenever a
real vocab is mounted (TPUVDB_CLIP_TOKENIZER or model dir assets).
"""

import gzip
import json
import os

import pytest

from tpuvdb.embed.bpe import (
    ClipBPETokenizer,
    bytes_to_unicode,
    find_tokenizer_assets,
    load_clip_bpe,
)

CORPUS = (
    "a photo of a cat sitting on the mat . a photo of a dog running in the "
    "park ! the quick brown fox jumps over the lazy dog , don't stop me now "
    "it's a beautiful day 1 2 3 hello world hello tokenizer testing one two "
    "three cats dogs photos cafe coffee streets street lights light "
).split()


def train_merges(words, n_merges=300):
    """Tiny BPE trainer: repeatedly merge the most frequent adjacent pair.
    Produces a valid merge table (each side constructible) like the real
    CLIP table, just smaller."""
    be = bytes_to_unicode()
    seqs = {}
    for w in words:
        u = "".join(be[b] for b in w.encode("utf-8"))
        seq = tuple(u[:-1]) + (u[-1] + "</w>",)
        seqs[seq] = seqs.get(seq, 0) + 1
    merges = []
    for _ in range(n_merges):
        counts = {}
        for seq, c in seqs.items():
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] = counts.get((seq[i], seq[i + 1]), 0) + c
        if not counts:
            break
        best = max(counts, key=lambda p: (counts[p], p))
        merges.append(best)
        new_seqs = {}
        for seq, c in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i < len(seq) - 1 and (seq[i], seq[i + 1]) == best:
                    out.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[tuple(out)] = new_seqs.get(tuple(out), 0) + c
        seqs = new_seqs
    return merges


def build_vocab(merges):
    """Vocab derivation identical to OpenAI's: bytes, bytes</w>, one token
    per merge, then the specials."""
    base = list(bytes_to_unicode().values())
    tokens = base + [v + "</w>" for v in base]
    tokens += ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    return {t: i for i, t in enumerate(tokens)}


@pytest.fixture(scope="module")
def table():
    merges = train_merges(CORPUS)
    assert len(merges) > 50, "trainer produced too few merges to be a real test"
    return build_vocab(merges), merges


@pytest.fixture(scope="module")
def hf_and_mine(table, tmp_path_factory):
    vocab, merges = table
    d = tmp_path_factory.mktemp("bpe")
    vj = str(d / "vocab.json")
    mt = str(d / "merges.txt")
    with open(vj, "w") as f:
        json.dump(vocab, f)
    with open(mt, "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    from transformers import CLIPTokenizer

    hf = CLIPTokenizer(vj, mt)
    mine = load_clip_bpe(vj, mt)
    return hf, mine


BATTERY = [
    "a photo of a cat",
    "A PHOTO OF A CAT",          # case folding
    "a  photo   of\ta cat\n",    # whitespace cleanup
    "don't stop, it's 3 dogs!",  # contractions, punctuation, digits
    "hello... world??!",         # punctuation runs
    "cats dogs photos streets",  # trained merges fire
    "xyzzy qwfp",                # untrained words -> byte fallback
    "cafe coffee",
    "12345",                     # digits split individually
    "a-b_c.d/e",                 # mixed punctuation
    "word",
    "    ",                      # whitespace only
    "",                          # empty
    "naive fiancee resume",      # plain ascii of accent-prone words
    "'s 't 're 've 'm 'll 'd",   # every special contraction
]


def test_matches_transformers_clip_tokenizer(hf_and_mine):
    hf, mine = hf_and_mine
    for text in BATTERY:
        expect = hf(text)["input_ids"]
        got = mine.encode(text)
        assert got == expect, f"mismatch on {text!r}: {got} != {expect}"


def test_matches_hf_on_unicode_bytes(hf_and_mine):
    """Non-ascii goes through the byte fallback; compare the raw token
    strings (HF without ftfy inserts CJK spacing at the cleanup stage, so
    compare on accented latin which both pipelines pass through)."""
    hf, mine = hf_and_mine
    for text in ["naïve café", "piñata jalapeño", "über señor"]:
        assert mine.encode(text) == hf(text)["input_ids"], text


def test_truncation_keeps_eos(hf_and_mine):
    _, mine = hf_and_mine
    ids = mine.encode("cat " * 500)
    assert len(ids) == mine.context_length == 77
    assert ids[0] == mine.bos_token and ids[-1] == mine.eos_token


def test_decode_round_trip(hf_and_mine):
    _, mine = hf_and_mine
    text = "a photo of a cat"
    assert mine.decode(mine.encode(text)) == text


def test_openai_gz_loader_matches_hf_format(table, tmp_path):
    """The OpenAI .gz ships only merges; the vocab is derived. Loading a
    synthetic .gz must produce identical ids to the HF-format load."""
    vocab, merges = table
    gz = tmp_path / "bpe_simple_vocab_16e6.txt.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write("#version 0.1\n")
        f.write("\n".join(f"{a} {b}" for a, b in merges))
    tok_gz = load_clip_bpe(str(gz))
    tok_hf = ClipBPETokenizer(vocab, merges)
    for text in BATTERY:
        assert tok_gz.encode(text) == tok_hf.encode(text), text


def test_find_tokenizer_assets(tmp_path):
    assert find_tokenizer_assets([str(tmp_path)]) is None
    (tmp_path / "vocab.json").write_text("{}")
    assert find_tokenizer_assets([str(tmp_path)]) is None  # needs merges too
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    got = find_tokenizer_assets([str(tmp_path), "/nonexistent"])
    assert got == (str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))


def _real_assets():
    env = os.environ.get("TPUVDB_CLIP_TOKENIZER")
    cands = [env, os.environ.get("TPUVDB_CLIP_MODEL_DIR")]
    if env and os.path.isfile(env):
        return (env,)
    return find_tokenizer_assets([c for c in cands if c])


@pytest.mark.skipif(_real_assets() is None,
                    reason="no real CLIP vocab mounted "
                           "(set TPUVDB_CLIP_TOKENIZER)")
def test_golden_real_vocab():
    """The canonical CLIP tokenization, checkable the day real assets are
    mounted: openai/clip-vit-base-patch32 tokenizes 'a photo of a cat' to
    exactly these ids (reference embeds via the same table,
    /root/reference/clip/embedding.py:70-93)."""
    tok = load_clip_bpe(*_real_assets())
    assert len(tok) == 49408
    assert tok.encode("a photo of a cat") == [49406, 320, 1125, 539, 320, 2368, 49407]
    assert tok.encode("a photo of a dog") == [49406, 320, 1125, 539, 320, 1929, 49407]
