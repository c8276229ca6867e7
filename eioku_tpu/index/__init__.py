from eioku_tpu.index.semantic import SemanticIndex

__all__ = ["SemanticIndex"]
