"""TPU-native DSP and NN ops (JAX/XLA/Pallas).

Every op is batched: it accepts arbitrary leading batch/time dimensions and
contracts over the trailing axis, so the same code serves single-frame
streaming and whole-utterance offline processing.
"""

from percepnet_tpu.ops.dft import forward_dft, inverse_dft  # noqa: F401
from percepnet_tpu.ops.bands import (  # noqa: F401
    band_energy, band_corr, interp_band_gain)
from percepnet_tpu.ops.window import apply_window  # noqa: F401
from percepnet_tpu.ops.activations import (  # noqa: F401
    tansig_approx, sigmoid_approx)
from percepnet_tpu.ops.postfilter import post_filter  # noqa: F401
from percepnet_tpu.ops.comb import comb_filter_windows  # noqa: F401
from percepnet_tpu.ops.pitch import (  # noqa: F401
    pitch_downsample, pitch_search, pitch_track)
