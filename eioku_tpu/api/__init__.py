from eioku_tpu.api.app import AppContext, create_app

__all__ = ["create_app", "AppContext"]
