"""Import PyTorch PercepNet checkpoints (rnn_train.py state_dicts).

The reference's deployment path serializes the model as generated C source
(dump_percepnet.py); our native path is an Orbax checkpoint of the params
pytree.  This module bridges legacy torch checkpoints into that pytree.

Layout mapping (torch -> ours):
  Linear.weight [out, in]        -> w [in, out]  (transpose)
  Conv1d.weight [out, in, k]     -> w [k, in, out]  (transpose(2,1,0));
                                    torch tap k=0 is the oldest sample under
                                    the reference's causal pad+trim, matching
                                    our _causal_conv convention.
  GRU.weight_ih_l0 [3N, in]      -> wi [in, 3N]  (transpose; gate order
                                    (r,z,n) is kept as-is)
  GRU.bias_ih_l0 / bias_hh_l0    -> bi / bh
"""

from __future__ import annotations

import numpy as np

from percepnet_tpu.models.percepnet import PercepNetParams


def _lin(sd, name):
    return {"w": np.ascontiguousarray(sd[f"{name}.0.weight"].T),
            "b": np.asarray(sd[f"{name}.0.bias"])}


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.0.weight"])          # [out, in, k]
    return {"w": np.ascontiguousarray(w.transpose(2, 1, 0)),
            "b": np.asarray(sd[f"{name}.0.bias"])}


def _gru(sd, name):
    return {
        "wi": np.ascontiguousarray(np.asarray(sd[f"{name}.weight_ih_l0"]).T),
        "wh": np.ascontiguousarray(np.asarray(sd[f"{name}.weight_hh_l0"]).T),
        "bi": np.asarray(sd[f"{name}.bias_ih_l0"]),
        "bh": np.asarray(sd[f"{name}.bias_hh_l0"]),
    }


def params_from_state_dict(sd) -> PercepNetParams:
    """Build a params pytree from a torch state_dict (tensors or ndarrays)."""
    sd = {k: np.asarray(getattr(v, "cpu", lambda: v)().numpy()
                        if hasattr(v, "numpy") else v)
          for k, v in sd.items()}
    return PercepNetParams(
        fc=_lin(sd, "fc"),
        conv1=_conv(sd, "conv1"),
        conv2=_conv(sd, "conv2"),
        gru1=_gru(sd, "gru1"),
        gru2=_gru(sd, "gru2"),
        gru3=_gru(sd, "gru3"),
        gru_gb=_gru(sd, "gru_gb"),
        gru_rb=_gru(sd, "gru_rb"),
        fc_gb=_lin(sd, "fc_gb"),
        fc_rb=_lin(sd, "fc_rb"),
    )
