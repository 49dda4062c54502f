'''Native C++ xyz parser/formatter: byte-for-byte and value parity with
the pure-Python io_xyz path, plus the error vocabulary.'''

import numpy as np
import pytest

from tscode_tpu import native
from tscode_tpu import io_xyz
from tscode_tpu.errors import CCReadError

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native xyz_io failed to build')

rng = np.random.default_rng(11)


def _make_ensemble(tmp_path, n_frames=5, n_atoms=7):
    coords = rng.normal(size=(n_frames, n_atoms, 3)) * 4
    atomnos = np.resize(
        np.array([6, 1, 1, 8, 7, 17, 35], dtype=np.int64), n_atoms)
    titles = [f'frame {i} E=-{i}.5' for i in range(n_frames)]
    path = tmp_path / 'ens.xyz'
    io_xyz.write_ensemble(str(path), coords, atomnos, titles)
    return path, coords, atomnos, titles


def test_roundtrip_matches_python_reader(tmp_path):
    path, coords, atomnos, titles = _make_ensemble(tmp_path)
    data = io_xyz.read_xyz(str(path))
    assert np.array_equal(data.atomnos, atomnos)
    assert data.comments == titles
    np.testing.assert_allclose(data.atomcoords, coords, atol=5e-7)


def test_native_output_is_byte_identical_to_python_writer(tmp_path):
    coords = rng.normal(size=(3, 5, 3)) * 3
    atomnos = np.array([6, 1, 8, 16, 9], dtype=np.int64)
    titles = ['a', 'b title with spaces', 'c']

    import io
    buf = io.StringIO()
    for c, t in zip(coords, titles):
        io_xyz.write_xyz(c, atomnos, buf, title=t)
    py_text = buf.getvalue().encode()

    native_text = native.format_ensemble(coords, atomnos, titles)
    assert native_text == py_text


def test_parse_handles_blank_lines_and_numeric_symbols(tmp_path):
    p = tmp_path / 'odd.xyz'
    p.write_text('\n2\ncmt\n6 0 0 0\n1 1.5 0 0\n\n\n2\ncmt2\nC 0 0 0.25\n'
                 'H 1.5 0 0\n')
    data = io_xyz.read_xyz(str(p))
    assert data.atomcoords.shape == (2, 2, 3)
    assert list(data.atomnos) == [6, 1]
    assert data.atomcoords[1, 0, 2] == 0.25


@pytest.mark.parametrize('content,match', [
    ('2\ncmt\nC 0 0 0\n', 'truncated frame'),
    ('nonsense\n', 'expected atom count'),
    ('1\ncmt\nQq 0 0 0\n', 'unknown element symbol'),
    ('1\ncmt\nC 0 0\n', 'bad atom line'),
    ('1\ncmt\nC 0 0 0\n1\ncmt\nN 0 0 0\n', 'inconsistent atoms'),
    ('', 'no frames'),
])
def test_error_vocabulary(tmp_path, content, match):
    p = tmp_path / 'bad.xyz'
    p.write_text(content)
    with pytest.raises(CCReadError, match=match):
        io_xyz.read_xyz(str(p))


def test_large_ensemble_parity(tmp_path):
    path, coords, atomnos, _ = _make_ensemble(tmp_path, n_frames=200,
                                              n_atoms=30)
    got = io_xyz.read_xyz(str(path))
    # parse the same bytes with the pure-Python fallback
    import tscode_tpu.io_xyz as mod
    saved = mod.native_io
    try:
        mod.native_io = None
        want = io_xyz.read_xyz(str(path))
    finally:
        mod.native_io = saved
    np.testing.assert_array_equal(got.atomcoords, want.atomcoords)
    assert np.array_equal(got.atomnos, want.atomnos)
    assert got.comments == want.comments


def test_native_tfd_lru_matches_python_replay(monkeypatch):
    '''The C++ novelty filter and the numpy replay must agree (away
    from exact-threshold borderlines, which random data avoids).'''
    import numpy as np

    from tscode_tpu import native
    from tscode_tpu.ops.tfd import is_new_structure_lru

    if not native.tfd_available():
        import pytest
        pytest.skip('native toolchain unavailable')

    rng = np.random.default_rng(11)
    base = rng.uniform(-180, 180, size=(40, 7)).astype(np.float32)
    fps = (base[rng.integers(0, 40, size=600)]
           + rng.normal(size=(600, 7)).astype(np.float32) * 3)
    accept = rng.random(600) > 0.2

    got = native.tfd_lru_filter(fps, accept, 10.0)

    monkeypatch.setattr(native, 'tfd_available', lambda: False)
    want = is_new_structure_lru(fps, accept, thresh=10)
    np.testing.assert_array_equal(got, want)
    assert 0 < got.sum() < accept.sum()
