from eioku_tpu.models.speaker.model import (  # noqa: F401
    EcapaConfig,
    convert_speechbrain_state_dict,
    ecapa_embed,
    fbank,
    init_ecapa_params,
    load_ecapa,
)
