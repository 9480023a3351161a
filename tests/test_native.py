"""Native (C++) reader/filler tests — parity with the Python layer."""
import numpy as np
import pytest

from ubresnet_tpu.data import EventFileReader, make_synthetic_file

native = pytest.importorskip("ubresnet_tpu.data.native")

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("native") / "ev.uevt")
    return make_synthetic_file(path, n_events=10, hw=(64, 96), seed=5)


def test_native_reader_matches_python(synth):
    py = EventFileReader(synth)
    nat = native.NativeEventFile(synth)
    assert len(nat) == len(py)
    for entry in (0, 3, 9):
        ref = py.read_entry(entry)["wire"][0]
        got = nat.read_image(entry, "wire", plane=2)
        np.testing.assert_array_equal(got.pixels, ref.pixels)
        assert got.rse == ref.rse
        assert got.meta == ref.meta
    with pytest.raises(KeyError):
        nat.read_image(0, "nope")


def test_native_filler_batches(synth):
    loader = native.NativeBatchLoader(
        synth, batch_size=3, plane=2, n_threads=2, seed=1
    ).start()
    try:
        b = loader[0]
        assert b["image"].shape == (3, 64, 96, 1)
        assert b["label"].shape == (3, 64, 96)
        assert b["label"].dtype == np.int32
        assert b["weight"].min() > 0
        # labels are valid class ids and images contain real content
        assert set(np.unique(b["label"])) <= {0, 1, 2}
        assert (b["image"] != 0).any()
        for _ in range(5):
            loader[0]
    finally:
        loader.stop()


def test_native_getbatch_honors_batch_size(synth):
    # reference getbatch(bs) semantics (larcv1_interface.py:47-66)
    loader = native.NativeBatchLoader(
        synth, batch_size=3, plane=2, n_threads=1, seed=4
    ).start()
    try:
        assert loader.getbatch()["image"].shape[0] == 3
        assert loader.getbatch(2)["image"].shape == (2, 64, 96, 1)
        b = loader.getbatch(5)
        assert b["image"].shape == (5, 64, 96, 1)
        assert b["label"].shape == (5, 64, 96)
        with pytest.raises(ValueError):
            loader.getbatch(-1)
    finally:
        loader.stop()


def test_native_filler_threshold_and_remap(synth):
    loader = native.NativeBatchLoader(
        synth, batch_size=2, plane=2, adc_threshold=20.0,
        class_map=[0, 2, 1], seed=2,
    ).start()
    try:
        b = loader[0]
        nz = b["image"][b["image"] != 0]
        assert nz.size == 0 or nz.min() >= 20.0
    finally:
        loader.stop()


def test_native_batches_match_python_content(synth):
    """Same entry read through both paths is identical (modulo batch
    sampling, so read a single known entry via the reader APIs)."""
    py = EventFileReader(synth)
    nat = native.NativeEventFile(synth)
    for prod in ("wire", "weight"):
        np.testing.assert_array_equal(
            nat.read_image(4, prod, 2).pixels, py.read_entry(4)[prod][0].pixels
        )


def test_make_loader_serves_root_config_natively(tmp_path, synth):
    """A DataConfig pointing at larcv .root files still gets the C++
    pthread filler: training_paths converts once to a cached UEVT
    (review finding: .root configs silently fell back to the Python
    loader and, worse, thrashed the native ROOT reader's single-slot
    basket cache)."""
    from ubresnet_tpu.cli.convert import main as convert_main
    from ubresnet_tpu.core.config import DataConfig
    from ubresnet_tpu.data.rootio import native_available as root_native
    from ubresnet_tpu.train.trainer import make_loader

    if not root_native():
        pytest.skip("native rootio unavailable")
    root = str(tmp_path / "t.root")
    assert convert_main(["--to-root", synth, root]) == 0

    cfg = DataConfig(files=[root], batch_size=3, plane=2,
                     weight_producer="weight")
    loader = make_loader(cfg)
    assert type(loader).__name__ == "NativeBatchLoader"
    loader.start()
    try:
        b = loader[0]
        assert b["image"].shape == (3, 64, 96, 1)
        assert np.isfinite(b["image"]).all()
    finally:
        loader.stop()
