from .embed_rpc import embed_with_cache, rpc_embed  # noqa: F401
