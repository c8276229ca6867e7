from eioku_tpu.config.settings import AppConfig, load_config

__all__ = ["AppConfig", "load_config"]
