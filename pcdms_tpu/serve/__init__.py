from pcdms_tpu.serve.engine import (
    DynamicBatcher, EngineClosed, EngineStats, InferenceEngine,
)
from pcdms_tpu.serve.router import ShapeRouter
from pcdms_tpu.serve.stage2 import CascadeService, Stage2Service
