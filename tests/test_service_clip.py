"""Service-level text->image search with an injected tiny CLIP embedder —
the end-to-end application path (embed -> ingest -> search -> results),
parity with clip/db_operation.py + clip/backend.py."""

import numpy as np
import pytest

from tpuvdb.api.service import DBService
from tpuvdb.core.config import DBConfig
from tpuvdb.embed.clip import CLIPConfig, CLIPEmbedder


@pytest.fixture(scope="module")
def svc():
    cfg = CLIPConfig(
        embed_dim=32, vocab_size=512, text_width=64, text_layers=2,
        text_heads=2, context_length=16, image_size=64, patch_size=32,
        vision_width=64, vision_layers=2, vision_heads=2,
    )
    embedder = CLIPEmbedder(cfg)
    dbc = DBConfig(vector_dim=32, shard_count=2, shard_capacity=1024,
                   block_size=128)
    return DBService(dbc, embedder=embedder)


def test_put_image_and_text_search(svc, tmp_path, rng):
    from PIL import Image

    paths = []
    for i in range(4):
        img = Image.fromarray(rng.integers(0, 255, (80, 80, 3), np.uint8))
        p = str(tmp_path / f"img_{i}.jpg")
        img.save(p)
        paths.append(p)

    for p in paths:
        r = svc.put_image(p, dataset="test")
        assert r["success"], r

    out = svc.text_search("anything", topk=3)
    assert len(out["results"]) == 3
    for res in out["results"]:
        assert res["file_path"].endswith(".jpg")
        assert res["metadata"]["dataset"] == "test"
        assert isinstance(res["score"], float)
    scores = [r["score"] for r in out["results"]]
    assert scores == sorted(scores)


def test_image_self_retrieval(svc, tmp_path, rng):
    """Searching by an image's own embedding returns that image first."""
    from PIL import Image

    img = Image.fromarray(rng.integers(0, 255, (80, 80, 3), np.uint8))
    p = str(tmp_path / "target.jpg")
    img.save(p)
    svc.put_image(p, key="target.jpg")
    vec = svc.embedder.image2vec(p)
    hits = svc.engine.search_hits(vec, 1)
    assert hits[0].key == "target.jpg"
    assert hits[0].score < 1e-3
