"""CLIP weight-path validation: numeric round-trip against torch.

Builds a randomly-initialized *tiny* HuggingFace `CLIPModel` (torch, CPU —
an independent implementation of the same architecture), saves its
state_dict as a checkpoint directory, loads it through
`CLIPEmbedder.load_hf_torch_weights`, and compares text/vision forward
passes. This proves the flax towers + HF key mapping are numerically
correct, so mounting the real openai/clip-vit-base-patch32 checkpoint
yields the reference's semantic pipeline (/root/reference/clip/embedding.py:18-93)
without needing the 600MB weights in this zero-egress build.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tpuvdb.embed.clip import CLIPConfig, CLIPEmbedder

TINY = dict(
    embed_dim=24,
    vocab_size=64,
    text_width=32,
    text_layers=2,
    text_heads=4,
    context_length=16,
    image_size=32,
    patch_size=16,
    vision_width=48,
    vision_layers=2,
    vision_heads=4,
)


@pytest.fixture(scope="module")
def towers(tmp_path_factory):
    from transformers import CLIPConfig as HFConfig, CLIPModel

    hf_cfg = HFConfig(
        projection_dim=TINY["embed_dim"],
        text_config=dict(
            vocab_size=TINY["vocab_size"],
            hidden_size=TINY["text_width"],
            intermediate_size=4 * TINY["text_width"],
            num_hidden_layers=TINY["text_layers"],
            num_attention_heads=TINY["text_heads"],
            max_position_embeddings=TINY["context_length"],
            hidden_act="quick_gelu",
            eos_token_id=TINY["vocab_size"] - 1,  # matches argmax pooling
            bos_token_id=TINY["vocab_size"] - 2,
            projection_dim=TINY["embed_dim"],
        ),
        vision_config=dict(
            image_size=TINY["image_size"],
            patch_size=TINY["patch_size"],
            hidden_size=TINY["vision_width"],
            intermediate_size=4 * TINY["vision_width"],
            num_hidden_layers=TINY["vision_layers"],
            num_attention_heads=TINY["vision_heads"],
            hidden_act="quick_gelu",
            projection_dim=TINY["embed_dim"],
        ),
    )
    torch.manual_seed(0)
    hf = CLIPModel(hf_cfg).eval()

    d = tmp_path_factory.mktemp("ckpt")
    torch.save(hf.state_dict(), d / "pytorch_model.bin")

    emb = CLIPEmbedder(CLIPConfig(**TINY), fast_init=True)
    emb.load_hf_torch_weights(str(d))
    assert emb.pretrained
    return hf, emb


def test_text_tower_matches_torch(towers):
    hf, emb = towers
    rng = np.random.default_rng(0)
    B, T = 3, TINY["context_length"]
    tokens = rng.integers(1, TINY["vocab_size"] - 2, size=(B, T)).astype(np.int32)
    # one EOS (the max id) per row so both implementations pool there
    for i, j in enumerate([T - 1, 5, 9]):
        tokens[i, j] = TINY["vocab_size"] - 1
        tokens[i, j + 1 :] = 0  # pad after EOS like real tokenization

    with torch.no_grad():
        want = hf.get_text_features(
            input_ids=torch.from_numpy(tokens.astype(np.int64))
        ).numpy()
    got = np.asarray(emb._text_fwd(emb.text_params, tokens), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_vision_tower_matches_torch(towers):
    hf, emb = towers
    rng = np.random.default_rng(1)
    S = TINY["image_size"]
    imgs = rng.standard_normal((2, 3, S, S)).astype(np.float32)

    with torch.no_grad():
        want = hf.get_image_features(pixel_values=torch.from_numpy(imgs)).numpy()
    got = np.asarray(
        emb._vision_fwd(emb.vision_params, np.transpose(imgs, (0, 2, 3, 1))),
        np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_text2vec_is_normalized_and_deterministic(towers):
    _, emb = towers
    v1 = emb.text2vec("a photo of a cat")
    v2 = emb.text2vec("a photo of a cat")
    np.testing.assert_allclose(v1, v2)
    assert abs(float(np.linalg.norm(v1)) - 1.0) < 1e-5
