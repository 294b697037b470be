"""Auxiliary NN condition detectors (controlnet-aux parity family).

JAX-native re-implementations of the detector models the reference
vendors in /root/reference/src/controlnet_aux/ — HED, PiDiNet, LineArt,
LineArt-Anime, M-LSD, the OpenPose body/hand/face CPMs, the DWPose pair
(YOLOX-l + RTMPose-l), MiDaS DPT-hybrid depth, LeReS
(ResNeXt101 + FFM decoder), NormalBae (EfficientNet-B5 + NNET), and
ZoeDepth (BEiT-L DPT + metric bins), and SAM (vit_h/l/b/t encoders
incl. the MobileSAM TinyViT, + two-way mask decoder + automatic mask
generator) — as NHWC param
pytrees with torch-checkpoint converters, plus the LeReS++ pix2pix
merge network and boosting protocol. Only mediapipe_face (external
mediapipe dependency) stays gated in pcdms_tpu.pose.processors; PCDMs
itself only ever calls DWPose.
"""

from pcdms_tpu.pose.detectors.hed import (
    HEDdetector, convert_hed, hed_apply, hed_init,
)
from pcdms_tpu.pose.detectors.leres import (
    LeresDetector, convert_leres, leres_apply, leres_init,
)
from pcdms_tpu.pose.detectors.leres_boost import (
    convert_pix2pix4depth, estimateboost, pix2pix_apply, pix2pix_init,
)
from pcdms_tpu.pose.detectors.lineart import (
    LineartDetector, convert_lineart, lineart_apply, lineart_init,
)
from pcdms_tpu.pose.detectors.lineart_anime import (
    LineartAnimeDetector, convert_lineart_anime, lineart_anime_apply,
    lineart_anime_init,
)
from pcdms_tpu.pose.detectors.midas import (
    MidasDetector, convert_dpt_hybrid, dpt_hybrid_apply, dpt_hybrid_init,
)
from pcdms_tpu.pose.detectors.mlsd import (
    MLSDdetector, convert_mlsd, decode_lines, mlsd_apply, mlsd_init,
)
from pcdms_tpu.pose.detectors.normalbae import (
    NormalBaeDetector, convert_nnet, nnet_apply, nnet_init,
)
from pcdms_tpu.pose.detectors.openpose import (
    OpenposeDetector, body_apply, body_init, convert_body, convert_face,
    convert_hand, face_apply, face_init, hand_apply, hand_init,
)
from pcdms_tpu.pose.detectors.pidi import (
    PidiNetDetector, convert_pidinet, pidinet_apply, pidinet_init,
)
from pcdms_tpu.pose.detectors.rtmpose import (
    convert_rtmpose, rtmpose_apply, rtmpose_init,
)
from pcdms_tpu.pose.detectors.sam import (
    SAM_CONFIGS, SamConfig, convert_sam, sam_init,
)
from pcdms_tpu.pose.detectors.sam_amg import (
    SamAutomaticMaskGenerator, SamDetector,
)
from pcdms_tpu.pose.detectors.tiny_vit import (
    convert_tiny_vit, tiny_vit_apply, tiny_vit_init,
)
from pcdms_tpu.pose.detectors.zoe import (
    ZoeDetector, convert_zoedepth, zoe_apply, zoe_init,
)
from pcdms_tpu.pose.detectors.yolox import (
    convert_yolox, yolox_apply, yolox_init,
)

__all__ = [
    "HEDdetector", "convert_hed", "hed_apply", "hed_init",
    "OpenposeDetector", "body_apply", "body_init", "convert_body",
    "convert_face", "convert_hand", "face_apply", "face_init",
    "hand_apply", "hand_init",
    "LineartDetector", "convert_lineart", "lineart_apply", "lineart_init",
    "LineartAnimeDetector", "convert_lineart_anime", "lineart_anime_apply",
    "lineart_anime_init",
    "MLSDdetector", "convert_mlsd", "decode_lines", "mlsd_apply",
    "mlsd_init",
    "MidasDetector", "convert_dpt_hybrid", "dpt_hybrid_apply",
    "dpt_hybrid_init",
    "LeresDetector", "convert_leres", "leres_apply", "leres_init",
    "convert_pix2pix4depth", "estimateboost", "pix2pix_apply",
    "pix2pix_init",
    "NormalBaeDetector", "convert_nnet", "nnet_apply", "nnet_init",
    "PidiNetDetector", "convert_pidinet", "pidinet_apply", "pidinet_init",
    "convert_rtmpose", "rtmpose_apply", "rtmpose_init",
    "convert_yolox", "yolox_apply", "yolox_init",
    "ZoeDetector", "convert_zoedepth", "zoe_apply", "zoe_init",
    "SAM_CONFIGS", "SamConfig", "convert_sam", "sam_init",
    "SamAutomaticMaskGenerator", "SamDetector",
    "convert_tiny_vit", "tiny_vit_apply", "tiny_vit_init",
]
