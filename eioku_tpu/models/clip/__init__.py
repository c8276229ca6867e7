from eioku_tpu.models.clip.model import (  # noqa: F401
    ClipConfig,
    clip_encode_image,
    clip_encode_text,
    convert_hf_state_dict,
    init_clip_params,
    load_clip,
    preprocess_images,
)
