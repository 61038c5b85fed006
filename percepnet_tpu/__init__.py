"""percepnet-tpu: a TPU-native PercepNet speech-enhancement framework.

Public API re-exports; see README.md for the layer map.
"""

__version__ = "0.1.0"

from percepnet_tpu import constants  # noqa: F401
from percepnet_tpu.pipeline import (  # noqa: F401
    PipelineState, enhance_chunk, enhance_utterance, init_pipeline_state,
)
