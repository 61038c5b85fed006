from percepnet_tpu.models.percepnet import (  # noqa: F401
    PercepNetParams, init_params, forward, forward_stream, init_model_state,
    param_count)
