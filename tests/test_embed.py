"""CLIP tower plumbing: shapes, determinism, normalization, preprocessing.

Semantic quality needs the real HF checkpoint (not available in this
zero-egress environment); these tests pin the contract the engine relies
on: fixed embed_dim, L2-normalized outputs, deterministic results.
"""

import numpy as np
import pytest

from tpuvdb.embed.clip import CLIPConfig, CLIPEmbedder


@pytest.fixture(scope="module")
def tiny_embedder():
    cfg = CLIPConfig(
        embed_dim=32,
        vocab_size=1024,
        text_width=64,
        text_layers=2,
        text_heads=2,
        context_length=16,
        image_size=64,
        patch_size=32,
        vision_width=64,
        vision_layers=2,
        vision_heads=2,
    )
    return CLIPEmbedder(cfg)


def test_text_embedding_contract(tiny_embedder):
    e = tiny_embedder
    v = e.text2vec("a cat sitting on the sofa")
    assert v.shape == (32,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    v2 = e.text2vec("a cat sitting on the sofa")
    np.testing.assert_allclose(v, v2, atol=1e-6)  # deterministic
    v3 = e.text2vec("a completely different sentence")
    assert np.linalg.norm(v - v3) > 1e-3


def test_text_batch_matches_single(tiny_embedder):
    e = tiny_embedder
    batch = e.text2vec_batch(["hello world", "goodbye"])
    np.testing.assert_allclose(batch[0], e.text2vec("hello world"), atol=1e-5)


def test_image_embedding_contract(tiny_embedder):
    from PIL import Image

    e = tiny_embedder
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (96, 128, 3), np.uint8))
    v = e.image2vec(img)
    assert v.shape == (32,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_preprocess_center_crop(tiny_embedder):
    from PIL import Image

    img = Image.new("RGB", (200, 100), (255, 0, 0))
    arr = tiny_embedder.preprocess_image(img)
    assert arr.shape == (64, 64, 3)
    # uniform red image: all pixels identical after normalization
    assert np.allclose(arr, arr[0, 0])


def test_tokenizer_truncates(tiny_embedder):
    toks = tiny_embedder.tokenizer.encode(" ".join(["word"] * 100))
    assert len(toks) <= tiny_embedder.cfg.context_length
    assert toks[0] == tiny_embedder.cfg.bos_token
