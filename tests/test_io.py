"""Frame codec + session + background compressor (SURVEY.md §4 plan).

Acceptance mirrors the reference's implicit contracts: format-1 frames
round-trip bit-exact; format-2 int16 deltas are within 1/(2*1000) per
component (reference scale x1000, tools/record.py:259); delta chains decode
through the batch base; resume finds the newest checkpoint.
"""

import numpy as np
import pytest

from spatialsim_tpu.io import codec, session
from spatialsim_tpu.io.compressor import BackgroundCompressor


@pytest.fixture
def frames(rng):
    n = 500
    pos = rng.normal(size=(n, 3)).astype(np.float32) * 100
    out = []
    for k in range(7):
        pos = pos + rng.normal(size=(n, 3)).astype(np.float32) * 0.05
        col = rng.random((n, 3)).astype(np.float32)
        out.append((pos.copy(), col))
    return out


def test_absolute_roundtrip_bitexact(frames):
    pos, col = frames[0]
    blob = codec.compress_frame(pos, col)
    assert codec.peek_format(blob) == codec.FORMAT_ABSOLUTE
    p2, c2 = codec.decompress_frame(blob)
    np.testing.assert_array_equal(p2, pos)
    np.testing.assert_array_equal(c2, col)


def test_delta_roundtrip_quantization_bound(frames):
    (p0, c0), (p1, c1) = frames[0], frames[1]
    blob = codec.compress_frame(p1, c1, p0, c0)
    assert codec.peek_format(blob) == codec.FORMAT_DELTA
    p2, c2 = codec.decompress_frame(blob, p0, c0)
    # Half-step quantization plus f32 ulp at coordinate magnitude ~300.
    assert np.max(np.abs(p2 - p1)) <= 0.5 / codec.DELTA_SCALE + 1e-4
    assert np.max(np.abs(c2 - c1)) <= 0.5 / codec.DELTA_SCALE + 1e-6


def test_delta_saturation_falls_back_to_absolute(frames):
    """Per-step motion beyond 32.767 units can't be delta-encoded (int16
    x1000 saturates); the encoder must emit an absolute frame instead of
    silently corrupting the delta chain."""
    (p0, c0) = frames[0]
    p1 = p0 + 50.0  # 50 units/step: x1000 = 50000 > 32767
    c1 = c0
    blob = codec.compress_frame(p1, c1, p0, c0)
    assert codec.peek_format(blob) == codec.FORMAT_ABSOLUTE
    p2, c2 = codec.decompress_frame(blob)
    np.testing.assert_array_equal(p2, p1)
    np.testing.assert_array_equal(c2, c1)


def test_native_and_numpy_encoders_agree(frames):
    """The numpy fallback must produce the same bytes as the native
    kernel, including saturation behavior."""
    from spatialsim_tpu.io import _native
    (p0, _), (p1, _) = frames[0], frames[1]
    big = p1.copy()
    big[0, 0] = p0[0, 0] + 100.0  # force one saturated element
    lib = _native._load()
    if lib is None:
        pytest.skip("native codec unavailable")
    d_native, sat_native = _native.delta_encode(big, p0, codec.DELTA_SCALE)
    # Forge the fallback path.
    _native._lib, _native._tried = None, True
    try:
        d_np, sat_np = _native.delta_encode(big, p0, codec.DELTA_SCALE)
    finally:
        _native._lib, _native._tried = lib, True
    np.testing.assert_array_equal(d_native, d_np)
    assert sat_native == sat_np == 1


def test_staged_save_load(tmp_path, frames):
    pos, col = frames[0]
    codec.save_frame(tmp_path, 0, pos, col)
    p2, c2 = codec.load_frame(tmp_path, 0)
    np.testing.assert_array_equal(p2, pos)


def test_compressor_batches_and_chain_decode(tmp_path, frames):
    for k, (pos, col) in enumerate(frames):
        codec.save_frame(tmp_path, k, pos, col)
    comp = BackgroundCompressor(tmp_path, batch_size=3)
    comp.start()
    comp.check_and_queue(len(frames) - 1)
    comp.compress_remaining(len(frames))
    comp.stop()
    assert comp.get_compressed_count() == len(frames)
    # Staged files gone, packed files exist; batch heads are bases.
    for k in range(len(frames)):
        assert not codec.frame_npz(tmp_path, k).exists()
        blob = codec.frame_zstd(tmp_path, k).read_bytes()
        expected = (codec.FORMAT_ABSOLUTE if k % 3 == 0
                    else codec.FORMAT_DELTA)
        assert codec.peek_format(blob) == expected
    # Random access decodes through the delta chain.
    for k in (0, 2, 4, 6):
        p, c = codec.load_frame(tmp_path, k)
        np.testing.assert_allclose(p, frames[k][0], atol=2e-3)
        np.testing.assert_allclose(c, frames[k][1], atol=2e-3)
    # Sequential decode with explicit prev matches too.
    prev_p = prev_c = None
    for k in range(len(frames)):
        prev_p, prev_c = codec.load_frame(tmp_path, k, prev_p, prev_c)
        np.testing.assert_allclose(prev_p, frames[k][0], atol=2e-3)


def test_compressor_counts_contiguous_and_latest_state(tmp_path, rng):
    pos = rng.normal(size=(10, 3)).astype(np.float32)
    vel = rng.normal(size=(10, 3)).astype(np.float32)
    for k in (0, 1, 2, 4):  # gap at 3
        codec.save_frame(tmp_path, k, pos, pos)
    assert session.get_completed_frames(tmp_path) == 3
    session.save_state(tmp_path, 49, pos, vel)
    session.save_state(tmp_path, 99, pos, vel)
    # Trailing delete removed state_0049.
    assert not session.state_path(tmp_path, 49).exists()
    path, frame = session.find_latest_state(tmp_path, 200)
    assert frame == 99
    p, v, m = session.load_state(path)
    np.testing.assert_array_equal(p, pos)
    assert m is None  # reference-layout state (no masses key)
    session.save_state(tmp_path, 149, pos, vel, masses=np.ones(10))
    _, _, m = session.load_state(session.state_path(tmp_path, 149))
    np.testing.assert_array_equal(m, np.ones(10))


def test_metadata_roundtrip(tmp_path):
    cfg = {"session_name": "t", "num_bodies": 123, "total_frames": 10,
           "theta": 0.8}
    session.save_metadata(tmp_path, cfg, start_time=1000.0)
    meta = session.load_metadata(tmp_path)
    assert meta["num_bodies"] == 123
    assert meta["start_time"] == 1000.0
    assert "start_datetime" in meta
