from eioku_tpu.parallel.mesh import make_mesh, shard_minilm_params, shard_yolo_params

__all__ = ["make_mesh", "shard_minilm_params", "shard_yolo_params"]
