"""Data-parallel inference/serving over the 8-device virtual mesh.

Training DP equivalence lives in test_train.py; here the ENHANCE path is
jitted over the mesh with batch-sharded signals and replicated params —
the multi-chip serving layout.
"""

import numpy as np
import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C
from percepnet_tpu import pipeline
from percepnet_tpu.models import percepnet
from percepnet_tpu.parallel import mesh as pm


def test_sharded_enhance_matches_single_device():
    params = percepnet.init_params(jax.random.PRNGKey(0))
    bsz = 8
    sig = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                  (bsz, 8 * C.FRAME_SIZE), jnp.float32)
    ref, _ = pipeline.enhance_chunk(params, sig,
                                    pipeline.init_pipeline_state(bsz))

    mesh = pm.make_mesh()
    assert mesh.devices.size == 8
    data_s = pm.batch_sharding(mesh)
    rep_s = pm.replicated_sharding(mesh)

    params_r = pm.replicate(mesh, params)
    state_r = jax.device_put(pipeline.init_pipeline_state(bsz), data_s)
    sig_s = jax.device_put(sig, data_s)

    step = jax.jit(pipeline.enhance_chunk,
                   in_shardings=(rep_s, data_s, data_s),
                   out_shardings=(data_s, data_s))
    out, new_state = step(params_r, sig_s, state_r)

    # per-stream state stays sharded with its stream; values match the
    # single-device run (per-stream compute is independent, so unlike the
    # batched-matmul GRU case there is no cross-batch tiling difference
    # large enough to matter at 8 frames)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    assert out.sharding.is_equivalent_to(data_s, out.ndim)
