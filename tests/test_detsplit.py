"""3-plane detector-consistent tiling (UBSplitDetector semantics,
run_ubresnet_wholeview.py:33-55) — geometry invariants + the wholeview
detsplit/passthrough deploy path."""
import numpy as np
import pytest

from ubresnet_tpu.ops.tiling import (
    DET_HALF_HEIGHT_CM,
    WIRE_PITCH_CM,
    coverage,
    detsplit_triplets,
    triplet_consistent,
    triplet_plane_grid,
    wire_coordinate,
)


def test_wire_coordinate_ranges():
    """Plane wire counts from geometry: Y=3456, U/V=2400 over the
    detector volume (z in [0, 1036.8] cm, y in +-116.5 cm)."""
    zmax = 3456 * WIRE_PITCH_CM
    assert wire_coordinate(2, 0.0, 0.0) == 0.0
    assert wire_coordinate(2, 0.0, zmax) == pytest.approx(3456)
    u = [
        wire_coordinate(0, y, z)
        for y in (-DET_HALF_HEIGHT_CM, DET_HALF_HEIGHT_CM)
        for z in (0.0, zmax)
    ]
    v = [
        wire_coordinate(1, y, z)
        for y in (-DET_HALF_HEIGHT_CM, DET_HALF_HEIGHT_CM)
        for z in (0.0, zmax)
    ]
    assert min(u) == pytest.approx(0.0)
    assert max(u) == pytest.approx(2400.9, abs=1.0)
    assert min(v) == pytest.approx(0.0)
    assert max(v) == pytest.approx(2400.9, abs=1.0)
    # U falls with y, V grows with y (mirror planes)
    assert wire_coordinate(0, 100.0, 500.0) < wire_coordinate(0, -100.0, 500.0)
    assert wire_coordinate(1, 100.0, 500.0) > wire_coordinate(1, -100.0, 500.0)


def test_triplets_cover_identical_z_and_are_consistent():
    trips = detsplit_triplets(1008, 3456)
    # reference defaults: 2 time bands x 12 z windows, <= MaxImages 1000
    assert len(trips) == 24
    # every triplet's z window is inside all three plane crops for all y
    for t in trips:
        assert triplet_consistent(t)
        # all three crops share the same time rows by construction
        assert len(set([t.row0])) == 1
    # the z windows jointly cover the full Y plane (FillCroppedYImage-
    # Completely: true) for each time band
    zcov = np.zeros(3456, np.int32)
    for t in trips:
        if t.row0 == 0:
            zcov[t.z_window[0] : t.z_window[1]] += 1
    assert (zcov >= 1).all()
    # Y-plane crops cover every pixel
    ygrid = triplet_plane_grid(trips, 2)
    cov = coverage(ygrid, 512, 832, 1008, 3456)
    assert (cov >= 1).all()


def test_triplet_crops_stay_in_bounds():
    for t in detsplit_triplets(1008, 3456):
        assert 0 <= t.row0 <= 1008 - 512
        for p in (0, 1, 2):
            assert 0 <= t.col0[p] <= 3456 - 832


def test_induction_crops_track_z():
    """U/V crop centers advance with the z window at cos(60) = half the
    Y-plane rate (wire-angle projection)."""
    trips = [t for t in detsplit_triplets(1008, 3456) if t.row0 == 0]
    # interior triplets (unclamped)
    mid = trips[3:-3]
    dy = np.diff([t.col0[2] for t in mid])
    du = np.diff([t.col0[0] for t in mid])
    assert np.allclose(du / dy, 0.5, atol=0.02)


def test_wholeview_detsplit_and_passthrough(tmp_path):
    """End-to-end: 3-plane whole views scored with consistent triplets,
    input content copied through (kBOTH mode)."""
    import jax

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.data.meta import Image2D, ImageMeta
    from ubresnet_tpu.data.uevt import EventFileReader, EventFileWriter
    from ubresnet_tpu.deploy import WholeViewRunner
    from ubresnet_tpu.models import get_model
    from ubresnet_tpu.train import init_model

    # small detector view: scaled geometry (rows 96, cols 256)
    rows, cols = 96, 256
    rng = np.random.RandomState(0)
    path = str(tmp_path / "whole.uevt")
    writer = EventFileWriter(path)
    for plane in (0, 1, 2):
        img = (rng.rand(rows, cols) * 50).astype(np.float32)
        meta = ImageMeta(0.0, 0.0, float(cols), float(rows), rows, cols, plane)
        writer.append("wire", Image2D(img, meta, 1, 0, 7))
    writer.set_id(1, 0, 7)
    writer.save_entry()
    writer.close()

    model = get_model("uresnet", policy=Policy.f32(), input_channels=1,
                      inplanes=2)
    variables = init_model(model, jax.random.PRNGKey(0),
                           np.zeros((1, 32, 64, 1), np.float32))
    # scaled-down detector: half height sized so the 64-px tile can
    # cover the full y span plus the 20-px z window
    hh = 6.0  # cm: 2*6*sin60/0.3 + 20*cos60 = 44.6 px <= 64
    runner = WholeViewRunner(
        model, variables, tile_rows=32, tile_cols=64, min_overlap_rows=8,
        crop_batch=4, sparse=False, covered_z_width=20,
        det_half_height_cm=hh,
    )
    from ubresnet_tpu.ops import tiling

    trips = tiling.detsplit_triplets(
        rows, cols, 32, 64, covered_z_width=20, min_overlap_rows=8,
        half_height_cm=hh,
    )
    for t in trips:
        assert tiling.triplet_consistent(t, tile_cols=64, half_height_cm=hh)

    out = str(tmp_path / "scores.uevt")
    runner.run(path, out, detsplit=True, passthrough=True)
    r = EventFileReader(out)
    ev = r.read_entry(0)
    # passthrough kept the ADC images alongside the scores
    assert "wire" in ev and len(ev["wire"]) == 3
    for plane in (0, 1, 2):
        assert f"ubsnet_plane{plane}" in ev
        scores = ev[f"ubsnet_plane{plane}"]
        assert len(scores) == 3  # one image per class
        total = sum(s.pixels for s in scores)
        # prob-sum = 1 wherever the plane's triplet crops cover
        # (induction planes have dead columns past their wire span)
        grid = tiling.triplet_plane_grid(trips, plane)
        cov = tiling.coverage(grid, 32, 64, rows, cols)
        np.testing.assert_allclose(total[cov >= 1], 1.0, atol=1e-4)
        if plane == 2:
            assert (cov >= 1).all()  # Y plane fully covered


def test_tile_grid_rejects_overlap_ge_tile():
    """min_overlap >= tile made the stride non-positive and the grid
    silently EMPTY (nothing scored); it must raise instead."""
    import pytest

    from ubresnet_tpu.ops.tiling import tile_grid

    with pytest.raises(ValueError, match="min_overlap"):
        tile_grid(128, 192, 64, 64, min_overlap_rows=8,
                  min_overlap_cols=176)
    with pytest.raises(ValueError, match="min_overlap"):
        tile_grid(128, 192, 64, 64, min_overlap_rows=64,
                  min_overlap_cols=8)
