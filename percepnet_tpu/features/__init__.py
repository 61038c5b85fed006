from percepnet_tpu.features.frontend import (  # noqa: F401
    analyze_batch, analyze_utterance)
from percepnet_tpu.features.labels import make_labels, make_records  # noqa: F401
