from pcdms_tpu.compat.torch_convert import (
    state_dict_to_numpy,
    convert_linear, convert_conv, convert_norm,
    convert_unet, convert_vae, convert_prior,
    convert_image_proj, convert_pose_proj,
    convert_clip_vision, convert_dinov2,
    split_reference_checkpoint,
)
