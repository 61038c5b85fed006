"""percepnet-tpu: a TPU-native PercepNet speech-enhancement framework.

Public API re-exports; see README.md for the layer map.

Re-exports are lazy (PEP 562): importing `percepnet_tpu` must not touch
JAX, because multi-host entry points (cli.train --distributed) have to
call jax.distributed.initialize() before anything initializes the XLA
backend — and several op modules build device constants at import.
"""

__version__ = "0.1.0"

_PIPELINE_EXPORTS = ("PipelineState", "enhance_chunk", "enhance_utterance",
                     "init_pipeline_state")


def __getattr__(name):
    import importlib
    if name == "constants":
        return importlib.import_module("percepnet_tpu.constants")
    if name in _PIPELINE_EXPORTS:
        pipeline = importlib.import_module("percepnet_tpu.pipeline")
        return getattr(pipeline, name)
    raise AttributeError(f"module 'percepnet_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | {"constants"} | set(_PIPELINE_EXPORTS))
