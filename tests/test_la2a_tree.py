"""Real-LA2A-tree shape hardening (BASELINE config 4 residual risk).

The 21 GB SignalTrain LA2A corpus itself is unreachable in this environment,
so these tests pin every *structural* quirk of a real recorded-hardware tree
against a synthetic replica, exercising the exact code paths a user would hit
pointing `--effect files --path` at the Zenodo download:

- effect_info.ini in the documented format (reference audio.py:634-646
  docstring: quoted-or-not name with spaces and '/', python-list knob
  names/ranges, no 'inverse' key) parsed by FileEffect;
- target filenames whose effect token itself contains single underscores
  ('LA2A_2c') — the double-underscore knob convention must still parse
  (reference datasets.py:178-186);
- integer knob strings ('0', '45') with no decimal point;
- UNPADDED file indices (input_2_ vs input_10_): lexicographic sort order
  differs from numeric order, and input_/target_ lists must still pair up
  row-for-row (reference datasets.py:105-114 relies on this silently);
- input/target length mismatches resolved by align-to-end
  (reference datasets.py:143-152), without breaking pair correspondence;
- int16 PCM wavs at the corpus sample rate.

Each input file is a distinct DC level so pairing errors are detectable from
batch content, not just shapes.
"""

import os

import jax
import numpy as np
import pytest

from signaltrain_tpu.data import file_data
from signaltrain_tpu.dsp import effects

SR = 44100
N_FILES = 12  # indices 1..12: lexicographic sort 1,10,11,12,2,... != numeric
CHUNK = 1024

INI = """[effect]
name = LA2A w/ switch
knob_names = ['Limit/Comp', 'Gain', 'Gain Reduction']
knob_ranges = [[0,1], [0,100], [0,100]]
"""


def _dc(i):
    return (i + 1) / 100.0


def _knobs_wc(i):
    return np.array([i % 2, (7 * i) % 100, (13 * i) % 100], dtype=np.float32)


@pytest.fixture(scope="module")
def la2a_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("la2a")
    (root / "effect_info.ini").write_text(INI)
    for sub, lo, hi in [("Train", 1, N_FILES + 1), ("Val", N_FILES + 1, N_FILES + 4)]:
        d = root / sub
        d.mkdir()
        for i in range(lo, hi):
            n = 2600 + 10 * i
            x = np.full(n, _dc(i), np.float32)
            # target runs LONGER than input for odd i (real recorded trees
            # have sub-second trailing mismatches) -> align_end must trim.
            y = np.full(n + (37 if i % 2 else 0), _dc(i), np.float32)
            sw, gain, red = _knobs_wc(i)
            from scipy.io import wavfile

            wavfile.write(str(d / f"input_{i}_.wav"), SR,
                          (x * 32767).astype(np.int16))
            wavfile.write(
                str(d / f"target_{i}_LA2A_2c__{int(sw)}__{int(gain)}__{int(red)}.wav"),
                SR, (y * 32767).astype(np.int16))
    return str(root)


def test_file_effect_la2a_ini(la2a_tree):
    fe = effects.make_effect("files", path=la2a_tree)
    assert fe.name == "LA2A w/ switch(files)"
    assert fe.knob_names == ["Limit/Comp", "Gain", "Gain Reduction"]
    np.testing.assert_allclose(fe.knob_ranges, [[0, 1], [0, 100], [0, 100]])
    assert not fe.is_inverse  # no 'inverse' key in the ini


def test_la2a_knob_string_quirks():
    # effect token with single underscores + integer knob strings
    k = file_data.parse_knob_string("target_7_LA2A_2c__1__49__91.wav")
    np.testing.assert_allclose(k, [1.0, 49.0, 91.0])
    # decimals and negatives still parse (gen_dataset-style names)
    k = file_data.parse_knob_string(
        "target_9400_Compressor_4c__-10.95__3.428__0.005043__0.01308.wav")
    np.testing.assert_allclose(k, [-10.95, 3.428, 0.005043, 0.01308], rtol=1e-6)


def test_la2a_pairing_align_and_normalization(la2a_tree):
    fe = effects.make_effect("files", path=la2a_tree)
    ds = file_data.FileDataset(
        os.path.join(la2a_tree, "Train"), fe, chunk_size=CHUNK, y_size=CHUNK,
        augment=False,
    )
    assert ds.device_resident
    x = np.asarray(ds.x, np.float32)
    assert x.shape[0] == N_FILES
    for row in range(N_FILES):
        # recover which numeric file index this row holds from its DC level
        dc = x[row, 0]
        i = int(round(dc * 100 - 1))  # invert _dc(i) = (i+1)/100
        assert 1 <= i <= N_FILES
        # pairing: the knobs stored for this row must be file i's knobs
        kw = _knobs_wc(i)
        kr = np.asarray(fe.knob_ranges, np.float32)
        expect_nn = (kw - kr[:, 0]) / (kr[:, 1] - kr[:, 0]) - 0.5
        np.testing.assert_allclose(ds.knobs_nn[row], expect_nn, atol=1e-6)
        # align_end: mismatched pair trimmed to the INPUT length, same DC
        assert int(ds.lengths[row]) == 2600 + 10 * i
        y_row = np.asarray(ds.y[row, : ds.lengths[row]])
        np.testing.assert_allclose(y_row, _dc(i), atol=1e-3)  # int16 quantized


def test_la2a_batch_content_matches_knobs(la2a_tree):
    fe = effects.make_effect("files", path=la2a_tree)
    ds = file_data.FileDataset(
        os.path.join(la2a_tree, "Train"), fe, chunk_size=CHUNK, y_size=CHUNK,
        augment=False,
    )
    keys = jax.random.split(jax.random.PRNGKey(3), 16)
    x, y, knobs = jax.jit(ds.batch_fn)(keys)
    x, y, knobs = np.asarray(x), np.asarray(y), np.asarray(knobs)
    assert x.shape == (16, CHUNK) and knobs.shape == (16, 3)
    kr = np.asarray(fe.knob_ranges, np.float32)
    for b in range(16):
        # every crop is constant (DC input) and inside the un-padded region
        assert np.ptp(x[b]) < 1e-3 and abs(x[b, 0]) > 1e-3
        i = int(round(float(x[b, 0]) * 100 - 1))
        expect_nn = (_knobs_wc(i) - kr[:, 0]) / (kr[:, 1] - kr[:, 0]) - 0.5
        np.testing.assert_allclose(knobs[b], expect_nn, atol=1e-6)
        np.testing.assert_allclose(y[b], x[b], atol=2e-4)  # identity pair


def test_la2a_host_path_matches_device(la2a_tree):
    fe = effects.make_effect("files", path=la2a_tree)
    ds = file_data.FileDataset(
        os.path.join(la2a_tree, "Train"), fe, chunk_size=CHUNK, y_size=CHUNK,
        augment=False, device_resident_limit_bytes=1,
    )
    assert not ds.device_resident
    x, y, knobs = ds.host_batch(8, np.random.default_rng(0))
    kr = np.asarray(fe.knob_ranges, np.float32)
    for b in range(8):
        i = int(round(float(x[b, 0]) * 100 - 1))
        expect_nn = (_knobs_wc(i) - kr[:, 0]) / (kr[:, 1] - kr[:, 0]) - 0.5
        np.testing.assert_allclose(knobs[b], expect_nn, atol=1e-6)
