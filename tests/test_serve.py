"""StreamingServer: slot lifecycle, per-stream isolation, correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from percepnet_tpu import constants as C
from percepnet_tpu import pipeline
from percepnet_tpu.models import percepnet
from percepnet_tpu.serve import StreamingServer


def test_server_matches_batch_pipeline():
    params = percepnet.init_params(jax.random.PRNGKey(0))
    srv = StreamingServer(params, capacity=3)
    n_frames = 8
    sig = 0.1 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (1, n_frames * C.FRAME_SIZE)))

    # Reference at the SAME batch size as the server's slot pool (row 0 =
    # signal, rows 1-2 silent).  The per-frame tick (T=1 graph) and the
    # one-shot (T=8 scan graph) are DIFFERENT XLA compilations, and the
    # GRU recurrence amplifies their matmul-reassociation differences to
    # ~1e-4..1e-3 within a few frames (PARITY.md; observed 2.7e-4 at
    # frame 8 in-suite) — so the bound is the documented amplification
    # level, same as test_server_slot_lifecycle_and_isolation.  What this
    # test pins is the SERVER logic: state carry, slot surfacing, frame
    # alignment — a bug there is orders-of-magnitude louder.
    sig3 = np.zeros((3, n_frames * C.FRAME_SIZE), sig.dtype)
    sig3[0] = sig[0]
    ref, _ = pipeline.enhance_chunk(
        params, jnp.asarray(sig3), pipeline.init_pipeline_state(3))

    sid = srv.attach()
    assert sid == 0
    got = []
    for t in range(n_frames):
        srv.submit(sid, sig[0, t * C.FRAME_SIZE : (t + 1) * C.FRAME_SIZE])
        got.append(srv.step()[sid])
    got = np.concatenate(got)
    ref0 = np.asarray(ref)[0]
    np.testing.assert_allclose(got, ref0, atol=2e-3)
    # the signal itself is ~0.1 RMS; require real agreement, not just
    # small absolute error on a silent output
    assert np.abs(got[5 * C.FRAME_SIZE :]).max() > 0.01
    corr = np.corrcoef(got[2 * C.FRAME_SIZE :],
                       ref0[2 * C.FRAME_SIZE :])[0, 1]
    assert corr > 0.9999, corr


def test_server_slot_lifecycle_and_isolation():
    params = percepnet.init_params(jax.random.PRNGKey(0))
    srv = StreamingServer(params, capacity=2)
    a = srv.attach()
    b = srv.attach()
    assert a != b
    try:
        srv.attach()
        raise AssertionError("expected capacity error")
    except RuntimeError:
        pass

    rng = np.random.default_rng(2)
    sig_a = (0.1 * rng.normal(size=6 * C.FRAME_SIZE)).astype(np.float32)

    # stream b gets silence; its output must stay silent while a's doesn't
    outs_a = []
    for t in range(6):
        srv.submit(a, sig_a[t * C.FRAME_SIZE : (t + 1) * C.FRAME_SIZE])
        out = srv.step()
        outs_a.append(out[a])
        np.testing.assert_allclose(out[b], 0.0, atol=1e-6)
    assert np.abs(np.concatenate(outs_a)).max() > 0

    # detaching and re-attaching reuses the slot with FRESH state
    srv.detach(b)
    c = srv.attach()
    assert c == b
    ref_solo, _ = pipeline.enhance_chunk(
        params, jnp.asarray(sig_a[None, : 6 * C.FRAME_SIZE]),
        pipeline.init_pipeline_state(1))
    outs_c = []
    for t in range(6):
        srv.submit(c, sig_a[t * C.FRAME_SIZE : (t + 1) * C.FRAME_SIZE])
        outs_c.append(srv.step()[c])
    # capacity-2 batch vs batch-1 reference: GRU recurrence amplifies the
    # different matmul tiling to ~1e-4..1e-3 (see test_pipeline notes); a
    # state-isolation bug would be orders louder
    np.testing.assert_allclose(np.concatenate(outs_c),
                               np.asarray(ref_solo)[0], atol=2e-3)


def test_server_frames_per_tick():
    """N-frames-per-submit batched tick == per-frame tick, stream-aligned.

    frames_per_tick amortizes the fixed per-dispatch cost on remote-tunnel
    links (serve.py module docstring); the T=4 tick and the T=8 one-shot
    are different XLA compilations, so the bound is the documented
    cross-graph GRU-amplification level (see
    test_server_matches_batch_pipeline).
    """
    params = percepnet.init_params(jax.random.PRNGKey(0))
    srv = StreamingServer(params, capacity=2, frames_per_tick=4)
    n_frames = 8
    sig = 0.1 * np.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (n_frames * C.FRAME_SIZE,)), np.float32)

    sig2 = np.zeros((2, n_frames * C.FRAME_SIZE), np.float32)
    sig2[0] = sig
    ref, _ = pipeline.enhance_chunk(
        params, jnp.asarray(sig2), pipeline.init_pipeline_state(2))

    sid = srv.attach()
    tick = 4 * C.FRAME_SIZE
    got = []
    for t in range(n_frames // 4):
        srv.submit(sid, sig[t * tick : (t + 1) * tick])
        out = srv.step()[sid]
        assert out.shape == (tick,)
        got.append(out)
    got = np.concatenate(got)
    ref0 = np.asarray(ref)[0]
    np.testing.assert_allclose(got, ref0, atol=2e-3)
    corr = np.corrcoef(got[2 * C.FRAME_SIZE :],
                       ref0[2 * C.FRAME_SIZE :])[0, 1]
    assert corr > 0.9999, corr


def test_server_over_device_mesh():
    """Slots shard across the 8-device mesh; behavior matches single-device."""
    from percepnet_tpu.parallel import mesh as pm
    params = percepnet.init_params(jax.random.PRNGKey(0))
    mesh = pm.make_mesh()
    srv = StreamingServer(params, capacity=8, mesh=mesh)
    solo = StreamingServer(params, capacity=1)

    rng = np.random.default_rng(3)
    sig = (0.1 * rng.normal(size=5 * C.FRAME_SIZE)).astype(np.float32)
    sid = srv.attach()
    ss = solo.attach()
    for t in range(5):
        frame = sig[t * C.FRAME_SIZE : (t + 1) * C.FRAME_SIZE]
        srv.submit(sid, frame)
        solo.submit(ss, frame)
        a = srv.step()[sid]
        b = solo.step()[ss]
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_server_int16_wire():
    """io_int16 == float mode with on-device /32768 in and C-cast out.

    The int16 wire halves link bytes on remote-device links (serve.py);
    device-side scaling must match feeding the equivalent float frame,
    and the output must be the C-truncation int16 of the float output
    (allow 1 LSB where the extra convert ops reassociate)."""
    params = percepnet.init_params(jax.random.PRNGKey(0))
    srv_f = StreamingServer(params, capacity=2)
    srv_i = StreamingServer(params, capacity=2, io_int16=True)
    n_frames = 6
    pcm16 = (20000 * 0.3 * np.asarray(jax.random.normal(
        jax.random.PRNGKey(7), (n_frames * C.FRAME_SIZE,)),
        np.float32)).astype(np.int16)

    sf = srv_f.attach()
    si = srv_i.attach()
    out_f, out_i = [], []
    for t in range(n_frames):
        fr = pcm16[t * C.FRAME_SIZE : (t + 1) * C.FRAME_SIZE]
        srv_f.submit(sf, fr.astype(np.float32) / 32768.0)
        srv_i.submit(si, fr)
        out_f.append(srv_f.step()[sf])
        out_i.append(srv_i.step()[si])
    out_f = np.concatenate(out_f)
    out_i = np.concatenate(out_i)
    assert out_i.dtype == np.int16
    expect = np.trunc(np.clip(out_f * 32768.0, -32768, 32767))
    assert np.max(np.abs(out_i.astype(np.float64) - expect)) <= 1.0
