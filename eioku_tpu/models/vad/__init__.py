from eioku_tpu.models.vad.model import VadConfig, init_vad_params, vad_probs  # noqa: F401
