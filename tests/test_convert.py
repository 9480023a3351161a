"""NPZ → UEVT converter test."""
import numpy as np

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
