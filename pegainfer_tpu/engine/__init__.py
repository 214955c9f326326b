from pegainfer_tpu.engine.contract import (  # noqa: F401
    EngineHandle,
    EngineLoadOptions,
    FinishReason,
    GenerateRequest,
    SamplingParams,
    TokenChannel,
)
from pegainfer_tpu.engine.scheduler import Scheduler, start_scheduler  # noqa: F401
