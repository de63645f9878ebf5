"""Host transform tests: PSTS pitch/stretch, phase mangle, descriptors,
beat clock."""

import numpy as np

from after_tpu.dataset.transforms import (audio_descriptors, estimate_beats,
                                          get_beat_signal,
                                          pitch_shift_time_stretch,
                                          random_phase_mangle, random_silence)


def _dominant_freq(x, sr):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.fft.rfftfreq(len(x), 1 / sr)[spec.argmax()]


def test_pitch_shift_moves_fundamental():
    sr = 22050
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    up = pitch_shift_time_stretch(x, sr, semitones=12.0)
    f = _dominant_freq(up[2000:-2000], sr)
    assert abs(f - 880) < 30, f
    down = pitch_shift_time_stretch(x, sr, semitones=-12.0)
    f = _dominant_freq(down[2000:-2000], sr)
    assert abs(f - 220) < 15, f


def test_time_stretch_changes_duration_not_pitch():
    sr = 22050
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 330 * t).astype(np.float32)
    y = pitch_shift_time_stretch(x, sr, semitones=0.0, stretch=2.0)
    assert abs(len(y) - 2 * len(x)) < sr // 10
    f = _dominant_freq(y[4000:-4000], sr)
    assert abs(f - 330) < 15, f


def test_phase_mangle_preserves_magnitude_spectrum():
    sr = 44100
    rng = np.random.RandomState(0)
    x = rng.randn(sr).astype(np.float32) * 0.1
    y = random_phase_mangle(x, rng=rng, sr=sr)
    sx = np.abs(np.fft.rfft(x))[50:-50]
    sy = np.abs(np.fft.rfft(y))[50:-50]
    # allpass: magnitudes essentially unchanged
    rel = np.abs(sx - sy) / (sx + 1e-6)
    assert np.median(rel) < 0.05


def test_random_silence():
    rng = np.random.RandomState(0)
    x = np.ones(1000, np.float32)
    y = random_silence(x, p=1.0, rng=rng)
    assert (y == 0).any() and (y == 1).any()


def test_audio_descriptors_track_brightness():
    sr = 22050
    t = np.arange(sr) / sr
    dull = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    bright = np.sin(2 * np.pi * 4000 * t).astype(np.float32)
    d1 = audio_descriptors(dull, sr, n_latent=32)
    d2 = audio_descriptors(bright, sr, n_latent=32)
    assert d2["centroid"].mean() > d1["centroid"].mean() * 3
    assert d1["centroid"].shape == (32,)


def test_beat_clock():
    sr = 22050
    bpm_true = 120.0
    period = 60 / bpm_true
    x = np.zeros(sr * 4, np.float32)
    for b in np.arange(0, 4, period):
        i = int(b * sr)
        x[i:i + 200] += np.hanning(200).astype(np.float32)
    bpm, beats = estimate_beats(x, sr)
    assert abs(bpm - bpm_true) < 6 or abs(bpm - 2 * bpm_true) < 12, bpm
    sig = get_beat_signal(beats, 4.0, 128)
    assert sig.shape == (128,)
    assert 0 <= sig.min() and sig.max() < 1.0001


def test_downbeat_estimation():
    from after_tpu.dataset.transforms import estimate_downbeats

    sr = 22050
    period = 0.5  # 120 bpm
    x = np.zeros(sr * 8, np.float32)
    for k, b in enumerate(np.arange(0, 8, period)):
        i = int(b * sr)
        amp = 1.0 if k % 4 == 0 else 0.3   # accented downbeat every bar
        x[i:i + 200] += amp * np.hanning(200).astype(np.float32)
    bpm, beats = estimate_beats(x, sr)
    downs = estimate_downbeats(x, sr, beats)
    assert len(downs) >= 3
    gaps = np.diff(downs)
    assert np.allclose(gaps, 2.0, atol=0.1), gaps
    # downbeats sit on the accented clicks (multiples of 2 s)
    assert np.all(np.abs(downs / 2.0 - np.round(downs / 2.0)) < 0.08), downs


def test_dbn_postprocessor_decodes_regular_grid():
    """The bar-pointer DBN (reference Postprocessor(type="dbn") via madmom,
    beat_this/model/postprocessor.py:31-38) decodes a steady 150-bpm 4/4
    pulse and, unlike minimal peak picking, restores a MISSING beat from
    the tempo prior."""
    import numpy as np

    from after_tpu.dataset.beat_tracker import (FPS, Postprocessor,
                                                postprocess_dbn,
                                                postprocess_minimal)

    T, period, bar = 400, 20, 4  # 20 frames @ 50 fps = 150 bpm, 4/4
    beat_logits = np.full(T, -6.0)
    down_logits = np.full(T, -6.0)
    beat_frames = np.arange(10, T, period)
    for i, f in enumerate(beat_frames):
        beat_logits[f] = 6.0
        if i % bar == 0:
            down_logits[f] = 6.0

    # knock one beat out entirely (frame 10 + 8*20 = 170)
    beat_logits[170] = -6.0

    beats, downs = postprocess_dbn(beat_logits, down_logits)
    assert len(beats) >= 18
    iv = np.diff(beats)
    np.testing.assert_allclose(iv, period / FPS, atol=1.5 / FPS)
    # the missing beat is reconstructed on the grid
    assert np.min(np.abs(beats - 170 / FPS)) < 2.0 / FPS
    # minimal peak picking cannot: it has no tempo model
    mb, _ = postprocess_minimal(beat_logits, down_logits)
    assert np.min(np.abs(mb - 170 / FPS)) > 5.0 / FPS
    # downbeats are a subset of beats, one per bar
    assert all(np.min(np.abs(beats - d)) < 1e-9 for d in downs)
    assert 4 <= len(downs) <= 6
    dv = np.diff(downs)
    np.testing.assert_allclose(dv, bar * period / FPS, atol=2.5 / FPS)

    # the reference-shaped API dispatches both types
    pp = Postprocessor(type="dbn")
    b2, d2 = pp(beat_logits, down_logits)
    np.testing.assert_allclose(b2, beats)
    np.testing.assert_allclose(d2, downs)
    assert Postprocessor(type="minimal")(beat_logits, down_logits)
