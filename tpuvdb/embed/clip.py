"""CLIP ViT-B/32 text + image towers in flax, running on the same chips as
the search shards.

Parity target: the reference embeds with HuggingFace torch
CLIPModel/CLIPProcessor pinned to CPU (clip/embedding.py:13-33), L2-
normalizing outputs (clip/embedding.py:64,89) so L2^2 distance is monotonic
in cosine similarity. Here the towers are flax modules compiled by XLA, so
embedding and search share one device and ingest/query are end-to-end
on-TPU (BASELINE.json north star).

Architecture (CLIP ViT-B/32, matching openai/clip-vit-base-patch32):
  text:   vocab 49408, width 512, 12 layers, 8 heads, 77 ctx, causal mask,
          QuickGELU, EOT-token pooling, 512->512 projection
  vision: 224x224, patch 32 (7x7+CLS), width 768, 12 layers, 12 heads,
          pre-LN, CLS pooling, 768->512 projection

Weights: `load_hf_torch_weights(model_dir)` maps a local HuggingFace
torch checkpoint into the flax param tree (the reference loads the same
checkpoint from Model/clip-vit-base-patch32, clip/embedding.py:15). In
environments without weights (like this zero-egress build) the towers
initialize deterministically from a fixed seed — shapes, compilation, and
the normalize/score contract are exercised end-to-end; semantic quality
requires the real checkpoint.

Tokenizer: the real CLIP byte-level BPE is implemented in
tpuvdb/embed/bpe.py (validated against transformers.CLIPTokenizer) and is
auto-discovered from vocab.json+merges.txt / tokenizer.json /
bpe_simple_vocab_16e6.txt.gz next to the weights or $TPUVDB_CLIP_TOKENIZER.
Without assets a deterministic hash tokenizer keeps the plumbing testable
(with a loud warning — embeddings are then not semantic).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import List, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

# CLIP preprocessing constants (OpenAI)
_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # text tower
    vocab_size: int = 49408
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    context_length: int = 77
    # vision tower
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12

    @property
    def bos_token(self) -> int:
        return self.vocab_size - 2  # 49406

    @property
    def eos_token(self) -> int:
        return self.vocab_size - 1  # 49407


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MHA(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        B, T, _ = x.shape
        qkv = nn.Dense(3 * self.width, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.width // self.heads
        q = q.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        if mask is not None:
            att = att + mask
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.width)
        return nn.Dense(self.width, name="out")(out)


class Block(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + MHA(self.width, self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1")(x), mask
        )
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.width, name="mlp_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name="mlp_proj")(h)
        return x + h


class TextTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, tokens):  # (B, T) int32
        c = self.cfg
        B, T = tokens.shape
        x = nn.Embed(c.vocab_size, c.text_width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.context_length, c.text_width),
        )
        x = x + pos[None, :T]
        causal = jnp.triu(jnp.full((T, T), -1e9, jnp.float32), k=1)[None, None]
        for i in range(c.text_layers):
            x = Block(c.text_width, c.text_heads, name=f"block_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # pool at the EOT token == the largest token id (CLIP convention)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(B), eot]
        return nn.Dense(c.embed_dim, use_bias=False, name="text_projection")(pooled)


class VisionTower(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3) float32, normalized
        c = self.cfg
        B = images.shape[0]
        x = nn.Conv(
            c.vision_width,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            name="patch_embedding",
        )(images)
        x = x.reshape(B, -1, c.vision_width)  # (B, 49, W)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.vision_width,)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.vision_width)), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            ((c.image_size // c.patch_size) ** 2 + 1, c.vision_width),
        )
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(c.vision_layers):
            x = Block(c.vision_width, c.vision_heads, name=f"block_{i}")(x)
        pooled = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        return nn.Dense(c.embed_dim, use_bias=False, name="visual_projection")(pooled)


class HashTokenizer:
    """Deterministic fallback tokenizer (NOT CLIP BPE — see module docs)."""

    def __init__(self, cfg: CLIPConfig):
        self.cfg = cfg

    def encode(self, text: str) -> List[int]:
        toks = [self.cfg.bos_token]
        # word ids land in [1, vocab-3], clear of pad/BOS/EOS for any vocab
        span = max(1, self.cfg.vocab_size - 3)
        for word in text.lower().strip().split():
            h = int(hashlib.md5(word.encode()).hexdigest(), 16)
            toks.append(1 + h % span)
        toks.append(self.cfg.eos_token)
        return toks[: self.cfg.context_length]


def _resolve_tokenizer(tokenizer_path: Optional[str],
                       model_dir: Optional[str], cfg: CLIPConfig):
    """Find and load the real CLIP BPE table (tpuvdb/embed/bpe.py), looking
    at an explicit path first, then next to the model weights (HF
    checkpoints ship vocab.json+merges.txt alongside them), then
    $TPUVDB_CLIP_TOKENIZER. Returns None when no assets exist."""
    from tpuvdb.embed import bpe

    ctx = cfg.context_length
    if tokenizer_path and os.path.isfile(tokenizer_path):
        return bpe.load_clip_bpe(tokenizer_path, context_length=ctx)
    env = os.environ.get("TPUVDB_CLIP_TOKENIZER")
    if env and os.path.isfile(env):
        return bpe.load_clip_bpe(env, context_length=ctx)
    found = bpe.find_tokenizer_assets(
        [p for p in (tokenizer_path, model_dir, env) if p])
    if found is not None:
        return bpe.load_clip_bpe(*found, context_length=ctx)
    return None


class CLIPEmbedder:
    """image/text -> L2-normalized embed_dim vector (singleton-friendly).

    API parity with the reference CLIPEmbedding (clip/embedding.py:18-93):
    image2vec / text2vec plus batch variants; outputs are L2-normalized so
    downstream squared-L2 ranking equals cosine ranking.
    """

    def __init__(
        self,
        cfg: Optional[CLIPConfig] = None,
        model_dir: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        seed: int = 0,
        fast_init: bool = False,
    ):
        """fast_init=True fills params with numpy gaussians via eval_shape
        instead of the jax initializers — orders of magnitude faster for
        big towers when weights will be replaced (or don't matter, e.g.
        shape/throughput benchmarks)."""
        self.cfg = cfg or CLIPConfig()
        self.text_model = TextTower(self.cfg)
        self.vision_model = VisionTower(self.cfg)
        self._fast_init = fast_init
        key = jax.random.PRNGKey(seed)
        kt, kv = jax.random.split(key)
        dummy_tokens = jnp.zeros((1, self.cfg.context_length), jnp.int32)
        dummy_img = jnp.zeros(
            (1, self.cfg.image_size, self.cfg.image_size, 3), jnp.float32
        )
        if fast_init:
            self.text_params = _numpy_init(
                jax.eval_shape(self.text_model.init, kt, dummy_tokens), seed)
            self.vision_params = _numpy_init(
                jax.eval_shape(self.vision_model.init, kv, dummy_img), seed + 1)
        else:
            # init on the CPU backend when available: a one-shot compile
            # that is much cheaper locally than via a remote TPU compile
            # service; params migrate to the TPU at first apply
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    self.text_params = self.text_model.init(kt, dummy_tokens)
                    self.vision_params = self.vision_model.init(kv, dummy_img)
            else:
                self.text_params = self.text_model.init(kt, dummy_tokens)
                self.vision_params = self.vision_model.init(kv, dummy_img)
        self.pretrained = False
        if model_dir and os.path.isdir(model_dir):
            self.load_hf_torch_weights(model_dir)
        self.tokenizer = _resolve_tokenizer(tokenizer_path, model_dir, self.cfg)
        if self.tokenizer is None:
            import warnings

            warnings.warn(
                "no CLIP BPE vocab found (looked for vocab.json+merges.txt / "
                "tokenizer.json / bpe_simple_vocab_16e6.txt.gz next to the "
                "model weights and in $TPUVDB_CLIP_TOKENIZER): falling back "
                "to the hash tokenizer — text embeddings will NOT be "
                "semantically meaningful",
                stacklevel=2,
            )
            self.tokenizer = HashTokenizer(self.cfg)

        self._text_fwd = jax.jit(
            lambda p, t: self.text_model.apply(p, t)
        )
        self._vision_fwd = jax.jit(
            lambda p, im: self.vision_model.apply(p, im)
        )

    # --------------------------------------------------------------- weights

    def load_hf_torch_weights(self, model_dir: str):
        """Map a HuggingFace CLIPModel torch checkpoint into the flax trees.
        Accepts pytorch_model.bin or model.safetensors in model_dir."""
        state = _load_torch_state(model_dir)
        c = self.cfg

        def T(name):
            return jnp.asarray(state[name].T)

        def A(name):
            return jnp.asarray(state[name])

        tp = {"params": {}}
        p = tp["params"]
        p["token_embedding"] = {
            "embedding": A("text_model.embeddings.token_embedding.weight")
        }
        p["positional_embedding"] = A("text_model.embeddings.position_embedding.weight")
        for i in range(c.text_layers):
            hf = f"text_model.encoder.layers.{i}"
            p[f"block_{i}"] = _block_params(state, hf)
        p["ln_final"] = {
            "scale": A("text_model.final_layer_norm.weight"),
            "bias": A("text_model.final_layer_norm.bias"),
        }
        p["text_projection"] = {"kernel": T("text_projection.weight")}
        self.text_params = tp

        vp = {"params": {}}
        q = vp["params"]
        # HF conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
        q["patch_embedding"] = {
            "kernel": jnp.asarray(
                np.transpose(
                    np.asarray(state["vision_model.embeddings.patch_embedding.weight"]),
                    (2, 3, 1, 0),
                )
            )
        }
        q["class_embedding"] = A("vision_model.embeddings.class_embedding")
        q["positional_embedding"] = A("vision_model.embeddings.position_embedding.weight")
        q["ln_pre"] = {
            "scale": A("vision_model.pre_layrnorm.weight"),
            "bias": A("vision_model.pre_layrnorm.bias"),
        }
        for i in range(c.vision_layers):
            hf = f"vision_model.encoder.layers.{i}"
            q[f"block_{i}"] = _block_params(state, hf)
        q["ln_post"] = {
            "scale": A("vision_model.post_layernorm.weight"),
            "bias": A("vision_model.post_layernorm.bias"),
        }
        q["visual_projection"] = {"kernel": T("visual_projection.weight")}
        self.vision_params = vp
        self.pretrained = True

    # ------------------------------------------------------------------ text

    def tokenize(self, texts: Sequence[str]) -> np.ndarray:
        c = self.cfg
        out = np.zeros((len(texts), c.context_length), np.int32)
        for i, t in enumerate(texts):
            ids = self.tokenizer.encode(t)
            out[i, : len(ids)] = ids
        return out

    def text2vec_batch(self, texts: Sequence[str]) -> np.ndarray:
        tokens = jnp.asarray(self.tokenize(texts))
        emb = np.asarray(self._text_fwd(self.text_params, tokens), np.float32)
        return _l2n(emb)

    def text2vec(self, text: str) -> np.ndarray:
        return self.text2vec_batch([text])[0]

    # ----------------------------------------------------------------- image

    def preprocess_image(self, image: Union[str, "object"]) -> np.ndarray:
        from PIL import Image

        if isinstance(image, str):
            img = Image.open(image)
        else:
            img = image
        img = img.convert("RGB")
        # resize shorter side to image_size, center crop (CLIPProcessor parity)
        s = self.cfg.image_size
        w, h = img.size
        scale = s / min(w, h)
        img = img.resize((max(s, round(w * scale)), max(s, round(h * scale))),
                         Image.BICUBIC)
        w, h = img.size
        left, top = (w - s) // 2, (h - s) // 2
        img = img.crop((left, top, left + s, top + s))
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - _IMAGE_MEAN) / _IMAGE_STD

    def image2vec_batch(self, images: Sequence) -> np.ndarray:
        batch = np.stack([self.preprocess_image(im) for im in images])
        emb = np.asarray(self._vision_fwd(self.vision_params, jnp.asarray(batch)),
                         np.float32)
        return _l2n(emb)

    def image2vec(self, image) -> np.ndarray:
        return self.image2vec_batch([image])[0]


def _block_params(state, hf_prefix: str):
    """Map one HF CLIPEncoderLayer to our Block param subtree."""

    def T(name):
        return jnp.asarray(state[f"{hf_prefix}.{name}"].T)

    def A(name):
        return jnp.asarray(state[f"{hf_prefix}.{name}"])

    qkv_w = jnp.concatenate(
        [T("self_attn.q_proj.weight"), T("self_attn.k_proj.weight"),
         T("self_attn.v_proj.weight")], axis=1,
    )
    qkv_b = jnp.concatenate(
        [A("self_attn.q_proj.bias"), A("self_attn.k_proj.bias"),
         A("self_attn.v_proj.bias")], axis=0,
    )
    return {
        "ln_1": {"scale": A("layer_norm1.weight"), "bias": A("layer_norm1.bias")},
        "ln_2": {"scale": A("layer_norm2.weight"), "bias": A("layer_norm2.bias")},
        "attn": {
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "out": {"kernel": T("self_attn.out_proj.weight"),
                    "bias": A("self_attn.out_proj.bias")},
        },
        "mlp_fc": {"kernel": T("mlp.fc1.weight"), "bias": A("mlp.fc1.bias")},
        "mlp_proj": {"kernel": T("mlp.fc2.weight"), "bias": A("mlp.fc2.bias")},
    }


def _load_torch_state(model_dir: str):
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.isfile(st_path):
        from safetensors import safe_open

        state = {}
        with safe_open(st_path, framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
        return state
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.isfile(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no model.safetensors / pytorch_model.bin in {model_dir}")


def _numpy_init(shapes, seed: int):
    """Fill an eval_shape param tree with scaled numpy gaussians (LN params
    get ones/zeros so activations stay bounded)."""
    rng = np.random.default_rng(seed)

    def leaf(path, s):
        name = "/".join(str(p) for p in path)
        if "scale" in name:
            return jnp.ones(s.shape, s.dtype)
        if "bias" in name:
            return jnp.zeros(s.shape, s.dtype)
        fan = s.shape[0] if len(s.shape) else 1
        return jnp.asarray(
            rng.standard_normal(s.shape).astype(np.float32) / np.sqrt(max(fan, 1)),
            s.dtype,
        )

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(leaf, shapes)


def _l2n(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


_default: Optional[CLIPEmbedder] = None


def load_default_embedder(embed_dim: int = 512) -> CLIPEmbedder:
    """Process-wide singleton (parity: clip/embedding.py get_instance).
    Honors TPUVDB_CLIP_MODEL / TPUVDB_CLIP_TOKENIZER env paths."""
    global _default
    if _default is None or _default.cfg.embed_dim != embed_dim:
        _default = CLIPEmbedder(
            CLIPConfig(embed_dim=embed_dim),
            model_dir=os.environ.get("TPUVDB_CLIP_MODEL"),
            tokenizer_path=os.environ.get("TPUVDB_CLIP_TOKENIZER"),
        )
    return _default
