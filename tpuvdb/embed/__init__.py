from tpuvdb.embed.clip import CLIPEmbedder, CLIPConfig, load_default_embedder

__all__ = ["CLIPEmbedder", "CLIPConfig", "load_default_embedder"]
