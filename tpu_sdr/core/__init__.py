from tpu_sdr.core.config import (  # noqa: F401
    CommMode,
    FilterMode,
    PipelineConfig,
    default_config,
)
from tpu_sdr.core import qformat  # noqa: F401
