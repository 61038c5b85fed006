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


def test_index_steps_over_mesh_match_gathered_steps():
    """Device-resident training (index-only steps) over the mesh == the
    regular sharded-batch steps fed the same gathered rows.

    The index path keeps the whole corpus replicated on-device and gathers
    the batch inside the jit (train/state.py::make_jitted_index_steps);
    only the int32 indices cross the host link.  Same mesh, same rows =>
    the two paths must agree to float tolerance."""
    import optax
    from percepnet_tpu.train import state as ts

    mesh = pm.make_mesh()
    tx = ts.make_optimizer(1e-3)
    key = jax.random.PRNGKey(0)
    n_chunks, seq_len, bsz = 16, 12, 8
    x_all = jax.random.uniform(key, (n_chunks, seq_len, 70), jnp.float32)
    y_all = jax.random.uniform(jax.random.PRNGKey(1),
                               (n_chunks, seq_len, 68), jnp.float32) * 0.9

    step_idx, eval_idx = ts.make_jitted_index_steps(tx, mesh)
    step_ref, eval_ref = ts.make_jitted_steps(tx, mesh)

    rep_s = pm.replicated_sharding(mesh)
    s_i = jax.device_put(ts.init_train_state(jax.random.PRNGKey(2), tx),
                         rep_s)
    s_r = jax.device_put(ts.init_train_state(jax.random.PRNGKey(2), tx),
                         rep_s)
    x_r = jax.device_put(x_all, rep_s)
    y_r = jax.device_put(y_all, rep_s)

    rng = np.random.default_rng(3)
    for _ in range(3):
        idx = jnp.asarray(rng.choice(n_chunks, size=bsz, replace=False))
        idx_r = jax.device_put(idx, rep_s)
        s_i, loss_i = step_idx(s_i, x_r, y_r, idx_r)
        xb, yb = pm.shard_batch(mesh, (x_all[np.asarray(idx)],
                                       y_all[np.asarray(idx)]))
        s_r, loss_r = step_ref(s_r, xb, yb)
        np.testing.assert_allclose(float(loss_i), float(loss_r), rtol=1e-5)

    for got, ref in zip(jax.tree.leaves(s_i.params),
                        jax.tree.leaves(s_r.params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)
    ev_i = float(eval_idx(s_i, x_r, y_r,
                          jax.device_put(jnp.arange(bsz), rep_s)))
    ev_r = float(eval_ref(s_r, *pm.shard_batch(
        mesh, (x_all[:bsz], y_all[:bsz]))))
    np.testing.assert_allclose(ev_i, ev_r, rtol=1e-5)


def test_bf16_serve_over_mesh_matches_single_device():
    """The bf16 serving tier steps over the mesh (replicated params,
    slot-sharded state) and tracks the single-device bf16 server."""
    from percepnet_tpu.serve import StreamingServer
    params = percepnet.init_params(jax.random.PRNGKey(0))
    mesh = pm.make_mesh()
    srv = StreamingServer(params, capacity=8, mesh=mesh,
                          model_dtype=jnp.bfloat16)
    solo = StreamingServer(params, capacity=8, model_dtype=jnp.bfloat16)

    rng = np.random.default_rng(4)
    sig = (0.1 * rng.normal(size=5 * C.FRAME_SIZE)).astype(np.float32)
    a_id, b_id = srv.attach(), solo.attach()
    for t in range(5):
        frame = sig[t * C.FRAME_SIZE : (t + 1) * C.FRAME_SIZE]
        srv.submit(a_id, frame)
        solo.submit(b_id, frame)
        a = srv.step()[a_id]
        b = solo.step()[b_id]
        # bf16 model tier: sharding changes matmul tiling, and the GRU
        # recurrence amplifies bf16 reassociation to ~1e-3 in g/r
        # (PARITY.md); PCM tracks within a few 1e-3 of the 0.1-amplitude
        # signal.  A sharding/state bug would be orders louder.
        np.testing.assert_allclose(a, b, atol=5e-3)
