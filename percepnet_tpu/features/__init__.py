from percepnet_tpu.features.frontend import analyze_utterance  # noqa: F401
from percepnet_tpu.features.labels import make_labels, make_records  # noqa: F401
