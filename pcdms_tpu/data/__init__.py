from pcdms_tpu.data.preprocess import (
    load_image, to_neg1_1, clip_preprocess, make_side_by_side,
    CLIP_IMAGE_MEAN, CLIP_IMAGE_STD,
)
from pcdms_tpu.data.datasets import (
    PairList, Stage1Dataset, Stage2Dataset, Stage3Dataset, batch_iterator,
)
from pcdms_tpu.data.loader import DataLoader, prefetch_to_device
