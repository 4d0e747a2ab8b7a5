import numpy as np
import pytest

from menelaus_spark import audio


def test_wav_roundtrip():
    rng = np.random.default_rng(7)
    pcm = (rng.standard_normal(1600) * 8000).astype(np.int16)
    buf = audio.wav_encode(pcm, 16000)
    sr, out = audio.wav_decode(buf)
    assert sr == 16000
    assert np.array_equal(out, pcm)


def test_decode_clip_snr_identity():
    pcm = (np.sin(np.linspace(0, 20, 800)) * 20000).astype(np.int16)
    buf = audio.wav_encode(pcm, 8000)
    sr, f = audio.decode_clip(buf, "pcm")
    assert sr == 8000
    # exact container round-trip -> infinite SNR
    assert audio.snr_db(pcm.astype(np.float64) / 32768.0, f) == float("inf")


def test_snr_db_threshold():
    rng = np.random.default_rng(3)
    ref = rng.standard_normal(4000)
    noisy = ref + 0.01 * rng.standard_normal(4000)
    assert audio.snr_db(ref, noisy) > 30.0
    assert audio.snr_db(ref, ref + 0.5 * rng.standard_normal(4000)) < 30.0


def test_non_wav_raises():
    with pytest.raises(NotImplementedError):
        audio.decode_clip(b"\x00\x01\x02\x03garbage", "opus")


def test_feature_vector_shape_and_determinism():
    pcm = (np.sin(np.linspace(0, 50, 3200)) * 15000).astype(np.int16)
    f1 = audio.extract_features(pcm.astype(np.float64) / 32768.0, 16000)
    f2 = audio.extract_features(pcm.astype(np.float64) / 32768.0, 16000)
    assert f1.shape == (audio.N_FEATURES,)
    assert np.array_equal(f1, f2)
    assert np.isfinite(f1).all()
