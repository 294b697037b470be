"""Auxiliary NN condition detectors (controlnet-aux parity family).

JAX-native re-implementations of the edge/line detector models the
reference vendors in /root/reference/src/controlnet_aux/ — HED, PiDiNet,
LineArt, LineArt-Anime — as NHWC param pytrees with torch-checkpoint
converters. The heavyweight depth/normal/segmentation detectors (midas,
zoe, leres, normalbae, sam, mediapipe_face) stay weight-gated in
pcdms_tpu.pose.processors; PCDMs itself only ever calls DWPose.
"""

from pcdms_tpu.pose.detectors.hed import (
    HEDdetector, convert_hed, hed_apply, hed_init,
)
from pcdms_tpu.pose.detectors.lineart import (
    LineartDetector, convert_lineart, lineart_apply, lineart_init,
)
from pcdms_tpu.pose.detectors.lineart_anime import (
    LineartAnimeDetector, convert_lineart_anime, lineart_anime_apply,
    lineart_anime_init,
)
from pcdms_tpu.pose.detectors.mlsd import (
    MLSDdetector, convert_mlsd, decode_lines, mlsd_apply, mlsd_init,
)
from pcdms_tpu.pose.detectors.pidi import (
    PidiNetDetector, convert_pidinet, pidinet_apply, pidinet_init,
)

__all__ = [
    "HEDdetector", "convert_hed", "hed_apply", "hed_init",
    "LineartDetector", "convert_lineart", "lineart_apply", "lineart_init",
    "LineartAnimeDetector", "convert_lineart_anime", "lineart_anime_apply",
    "lineart_anime_init",
    "MLSDdetector", "convert_mlsd", "decode_lines", "mlsd_apply",
    "mlsd_init",
    "PidiNetDetector", "convert_pidinet", "pidinet_apply", "pidinet_init",
]
