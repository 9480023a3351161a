"""NPZ / ROOT → UEVT converter tests."""
import numpy as np
import pytest

from ubresnet_tpu.cli.convert import npz_to_uevt
from ubresnet_tpu.data import EventFileReader


def test_npz_to_uevt(tmp_path, rng):
    payload = {}
    for entry in range(2):
        payload[f"{entry}/rse"] = np.array([5, 6, 100 + entry])
        for producer in ("wire", "segment"):
            for plane in (0, 2):
                arr = (
                    rng.rand(16, 24).astype(np.float32) * 50
                    if producer == "wire"
                    else rng.randint(0, 3, (16, 24)).astype(np.int32)
                )
                key = f"{entry}/{producer}/{plane}"
                payload[key] = arr
                payload[f"{key}/meta"] = np.array(
                    [10.0, 0.0, 34.0, 32.0, 16, 24, plane]
                )
    npz = str(tmp_path / "ev.npz")
    np.savez_compressed(npz, **payload)

    out = str(tmp_path / "ev.uevt")
    n = npz_to_uevt(npz, out)
    assert n == 2

    r = EventFileReader(out)
    assert len(r) == 2
    assert r.rse(1) == (5, 6, 101)
    ev = r.read_entry(0)
    assert set(ev) == {"wire", "segment"}
    assert len(ev["wire"]) == 2  # two planes
    planes = sorted(im.meta.plane for im in ev["wire"])
    assert planes == [0, 2]
    m = ev["wire"][0].meta
    assert (m.min_x, m.max_y, m.rows, m.cols) == (10.0, 32.0, 16, 24)
    np.testing.assert_array_equal(
        ev["wire"][0].pixels, payload["0/wire/0"]
    )


@pytest.mark.parametrize(
    "layout",
    ["objectwise", "memberwise", "split", "split_memberwise"],
)
def test_root_to_uevt_all_layouts(tmp_path, layout):
    """root→uevt conversion ingests all three larcv storage layouts
    natively (no NPZ fallback): object-wise, member-wise streamed,
    and split trees (incl. a member-wise-streamed vector leaf)."""
    from ubresnet_tpu.data import rootio
    from root_synth import write_larcv_like

    if not rootio.native_available():
        pytest.skip("native rootio unavailable")
    path = str(tmp_path / "in.root")
    truth = write_larcv_like(
        path,
        producers=("wire", "segment"),
        n_entries=3,
        planes=(0, 2),
        memberwise="memberwise" in layout,
        split="split" in layout,
    )
    out = str(tmp_path / "out.uevt")
    n = rootio.root_to_uevt(path, out)
    assert n == 3
    r = EventFileReader(out)
    for e in range(3):
        arrs, metas, rse = truth["wire"][e]
        assert r.rse(e) == rse
        ev = r.read_entry(e)
        assert set(ev) == {"wire", "segment"}
        for img, arr, m in zip(ev["wire"], arrs, metas):
            np.testing.assert_array_equal(img.pixels, arr)
            assert img.meta.plane == m["plane"]
