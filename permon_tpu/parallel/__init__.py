from .dist import make_mesh, shard_extension, shard_qp
