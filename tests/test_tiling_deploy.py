"""Tiling ops + deploy runner tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from ubresnet_tpu.core.precision import Policy
from ubresnet_tpu.data import EventFileReader, make_synthetic_file
from ubresnet_tpu.deploy import PrecroppedRunner, WholeViewRunner
from ubresnet_tpu.models import UResNet, UResNetConfig
from ubresnet_tpu.ops.tiling import coverage, extract_tiles, stitch_tiles, tile_grid


def test_tile_grid_reference_geometry():
    """1008x3456 plane with 512x832 tiles covers fully with overlap."""
    grid = tile_grid(1008, 3456)
    cov = coverage(grid, 512, 832, 1008, 3456)
    assert cov.min() >= 1  # full coverage
    rows = sorted({r for r, _ in grid})
    cols = sorted({c for _, c in grid})
    assert rows[0] == 0 and rows[-1] == 1008 - 512
    assert cols[0] == 0 and cols[-1] == 3456 - 832
    # neighboring column tiles overlap by >= the requested amount
    for a, b in zip(cols, cols[1:]):
        assert a + 832 - b >= 176


def test_tile_grid_small_image():
    grid = tile_grid(512, 832, 512, 832)
    assert grid == ((0, 0),)
    with pytest.raises(ValueError):
        tile_grid(256, 256, 512, 832)


def test_extract_stitch_roundtrip(rng):
    """Extract + stitch of the identity reproduces the image exactly
    (overlap-averaging of identical values is exact)."""
    img = jnp.asarray(rng.rand(100, 120, 3).astype(np.float32))
    grid = tile_grid(100, 120, 32, 48, 8, 8)
    tiles = extract_tiles(img, grid, 32, 48)
    assert tiles.shape == (len(grid), 32, 48, 3)
    out = stitch_tiles(tiles, grid, (100, 120))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), rtol=1e-6)


def test_stitch_averages_overlaps():
    grid = ((0, 0), (0, 2))  # two 4-wide tiles overlapping cols 2-3
    tiles = jnp.stack([jnp.ones((4, 4, 1)), 3 * jnp.ones((4, 4, 1))])
    out = stitch_tiles(tiles, grid, (4, 6))
    np.testing.assert_allclose(np.asarray(out[:, 0:2, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(out[:, 2:4, 0]), 2.0)  # mean(1,3)
    np.testing.assert_allclose(np.asarray(out[:, 4:6, 0]), 3.0)


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    model = UResNet(
        config=UResNetConfig(num_classes=3, input_channels=1, inplanes=4,
                             final_conv_kernels=4),
        policy=Policy.f32(),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))
    )
    return model, variables


def test_precropped_runner(tmp_path, tiny_model):
    model, variables = tiny_model
    inp = make_synthetic_file(str(tmp_path / "in.uevt"), n_events=5, hw=(64, 64))
    out = str(tmp_path / "out.uevt")
    runner = PrecroppedRunner(model, variables, batch_size=2)
    timing = runner.run(inp, out, plane=2)
    assert timing["total"] > 0

    r = EventFileReader(out)
    assert len(r) == 5
    ev = r.read_entry(0)
    assert "uburn_plane2" in ev
    scores = ev["uburn_plane2"]
    assert len(scores) == 3  # one image per class
    total = sum(s.pixels for s in scores)
    np.testing.assert_allclose(total, 1.0, atol=1e-4)  # softmax sums to 1
    # rse propagated from input
    assert scores[0].rse == EventFileReader(inp).rse(0)
    # meta preserved
    assert scores[0].meta.rows == 64 and scores[0].meta.plane == 2


def test_precropped_runner_root_output(tmp_path, tiny_model):
    """Deploy writing scores directly into a larcv-compatible .root file
    (reference IOManager(kWRITE) flow, run_ubresnet_precropped.py:93-95,
    159-173), re-read by the native reader."""
    from ubresnet_tpu.data.rootio import RootFile, native_available

    if not native_available():
        pytest.skip("native rootio unavailable")
    model, variables = tiny_model
    inp = make_synthetic_file(str(tmp_path / "in.uevt"), n_events=3, hw=(64, 64))
    out = str(tmp_path / "out.root")
    runner = PrecroppedRunner(model, variables, batch_size=2)
    runner.run(inp, out, plane=2)

    src = EventFileReader(inp)
    with RootFile(out) as rf:
        tree, branch = "image2d_uburn_plane2_tree", "image2d_uburn_plane2_branch"
        assert rf.branches()[(tree, branch)]["entries"] == 3
        for e in range(3):
            rse, imgs = rf.read_event(tree, branch, e)
            assert rse == src.rse(e)
            assert len(imgs) == 3  # one image per class
            total = sum(i.pixels for i in imgs)
            np.testing.assert_allclose(total, 1.0, atol=1e-4)


@pytest.mark.parametrize("mode,atol", [(True, 2e-3), ("u8", 6e-3)])
def test_precropped_runner_compact_readback(tmp_path, tiny_model, mode, atol):
    """Compact D2H modes (f16 / u8 fixed point, K-1 classes + host
    1-sum reconstruction) match full-precision scores to the
    encoding's quantisation step."""
    model, variables = tiny_model
    inp = make_synthetic_file(str(tmp_path / "in.uevt"), n_events=4, hw=(64, 64))
    full = PrecroppedRunner(model, variables, batch_size=2)
    compact = PrecroppedRunner(
        model, variables, batch_size=2, compact_readback=mode
    )
    full.run(inp, str(tmp_path / "full.uevt"), plane=2)
    compact.run(inp, str(tmp_path / "compact.uevt"), plane=2)

    rf, rc = (
        EventFileReader(str(tmp_path / "full.uevt")),
        EventFileReader(str(tmp_path / "compact.uevt")),
    )
    for e in range(4):
        sf = rf.read_entry(e)["uburn_plane2"]
        sc = rc.read_entry(e)["uburn_plane2"]
        assert len(sc) == 3  # all classes present, incl. reconstructed
        np.testing.assert_allclose(
            sum(s.pixels for s in sc), 1.0, atol=atol
        )
        for a, b in zip(sf, sc):
            np.testing.assert_allclose(a.pixels, b.pixels, atol=atol)


def test_wholeview_runner(tmp_path, tiny_model):
    model, variables = tiny_model
    # small "whole view": 128x192 with 64x64 tiles
    inp = make_synthetic_file(str(tmp_path / "wv.uevt"), n_events=2, hw=(128, 192))
    out = str(tmp_path / "wvout.uevt")
    runner = WholeViewRunner(
        model, variables, tile_rows=64, tile_cols=64,
        min_overlap_rows=8, min_overlap_cols=8, crop_batch=4,
    )
    runner.run(inp, out, producer="wire")
    r = EventFileReader(out)
    assert len(r) == 2
    ev = r.read_entry(0)
    scores = ev["ubsnet_plane2"]
    assert len(scores) == 3
    assert scores[0].pixels.shape == (128, 192)
    total = sum(s.pixels for s in scores)
    # stitched probabilities still sum to ~1 (mean of distributions)
    np.testing.assert_allclose(total, 1.0, atol=1e-4)


def test_wholeview_matches_single_tile(tmp_path, tiny_model):
    """When the image equals the tile size, wholeview == plain forward."""
    import jax

    model, variables = tiny_model
    img = np.random.RandomState(0).rand(64, 64).astype(np.float32) * 5
    runner = WholeViewRunner(model, variables, tile_rows=64, tile_cols=64,
                             crop_batch=1)
    got = runner.score_image(img)
    ref = np.asarray(
        jnp.exp(model.apply(variables, jnp.asarray(img)[None, ..., None]))[0]
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_precropped_runner_root_input(tmp_path, tiny_model):
    """Deploy reading a larcv .root input directly (reference deploy
    reads ROOT natively, run_ubresnet_precropped.py:83-84; round-3
    serve accepted .root names but the runner failed them). Scores
    must match the same events served from .uevt."""
    from ubresnet_tpu.cli.convert import main as convert_main
    from ubresnet_tpu.data.rootio import native_available

    if not native_available():
        pytest.skip("native rootio unavailable")
    model, variables = tiny_model
    inp = make_synthetic_file(str(tmp_path / "in.uevt"), n_events=3,
                              hw=(64, 64))
    rootin = str(tmp_path / "in.root")
    assert convert_main(["--to-root", inp, rootin]) == 0

    runner = PrecroppedRunner(model, variables, batch_size=2)
    out_u = str(tmp_path / "from_uevt.uevt")
    out_r = str(tmp_path / "from_root.uevt")
    runner.run(inp, out_u, plane=2)
    runner.run(rootin, out_r, plane=2)

    ru, rr = EventFileReader(out_u), EventFileReader(out_r)
    assert len(rr) == 3
    for e in range(3):
        assert ru.rse(e) == rr.rse(e)
        su = ru.read_entry(e)["uburn_plane2"]
        sr = rr.read_entry(e)["uburn_plane2"]
        for a, b in zip(su, sr):
            np.testing.assert_allclose(a.pixels, b.pixels, atol=1e-5)


def test_wholeview_spatial_matches_unsharded(tmp_path, tiny_model):
    """Spatial mode (VERDICT round-3 item 9): one row-sharded forward
    over the 8-device virtual mesh == the same whole-plane forward on
    a single device — pins GSPMD's conv halo exchange at deploy
    shapes — and sanity vs the stitched path."""
    import jax
    from jax.sharding import Mesh

    model, variables = tiny_model
    mesh = Mesh(np.array(jax.devices()[:8]), ("devices",))
    img = np.random.RandomState(3).rand(100, 192).astype(np.float32) * 5
    img[img < 4.0] = 0.0  # sparse-ish like real ADC

    sp_runner = WholeViewRunner(model, variables, tile_rows=64,
                                tile_cols=64, crop_batch=4,
                                spatial_mesh=mesh)
    got = sp_runner.score_image(img)
    assert got.shape == (100, 192, 3)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-4)

    # unsharded reference through the same pad->apply->slice math
    pad = jnp.pad(jnp.asarray(img), ((0, 28), (0, 0)))[None, ..., None]
    ref = np.asarray(
        jnp.exp(model.apply(variables, pad))[0, :100, :192, :]
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)
    # (no numeric comparison against the stitched path: crop borders
    # see different receptive fields, and a random-init model saturates
    # log-softmax, so seam pixels legitimately flip class — the
    # sharded-vs-unsharded check above already pins the geometry)


def test_wholeview_spatial_runner_end_to_end(tmp_path, tiny_model):
    """runner.run with spatial_mesh: whole planes resident across the
    mesh, outputs carry the same producers/meta/rse as stitched mode."""
    import jax
    from jax.sharding import Mesh

    model, variables = tiny_model
    mesh = Mesh(np.array(jax.devices()[:8]), ("devices",))
    inp = make_synthetic_file(str(tmp_path / "wv.uevt"), n_events=2,
                              hw=(100, 192))
    out = str(tmp_path / "wvout.uevt")
    runner = WholeViewRunner(model, variables, spatial_mesh=mesh)
    runner.run(inp, out, producer="wire")
    r = EventFileReader(out)
    assert len(r) == 2
    scores = r.read_entry(0)["ubsnet_plane2"]
    assert len(scores) == 3
    assert scores[0].pixels.shape == (100, 192)
    np.testing.assert_allclose(sum(s.pixels for s in scores), 1.0,
                               atol=1e-4)
    assert scores[0].rse == EventFileReader(inp).rse(0)


def test_precropped_runner_f16_scores(tmp_path, tiny_model):
    """--f16-scores: half the written bytes, probabilities within the
    f16 quantum of the f32 run; .root outputs unaffected (f32)."""
    model, variables = tiny_model
    inp = make_synthetic_file(str(tmp_path / "in.uevt"), n_events=3,
                              hw=(64, 64))
    r32 = PrecroppedRunner(model, variables, batch_size=2)
    r16 = PrecroppedRunner(model, variables, batch_size=2,
                           score_dtype=np.float16)
    out32, out16 = str(tmp_path / "s32.uevt"), str(tmp_path / "s16.uevt")
    r32.run(inp, out32, plane=2)
    r16.run(inp, out16, plane=2)
    import os
    assert os.path.getsize(out16) < 0.6 * os.path.getsize(out32)
    a = EventFileReader(out32).read_entry(0)["uburn_plane2"]
    b = EventFileReader(out16).read_entry(0)["uburn_plane2"]
    for ia, ib in zip(a, b):
        assert ib.pixels.dtype == np.float16
        np.testing.assert_allclose(ib.pixels.astype(np.float32),
                                   ia.pixels, atol=5e-4)


def test_precropped_runner_int8(tmp_path, tiny_model):
    """--int8 deploy path: calibrate_from the input file, quantized
    scores close to the f32 run, probabilities still sum to 1."""
    import dataclasses

    model, variables = tiny_model
    qmodel = model.clone(policy=dataclasses.replace(
        Policy.tpu_int8(), compute_dtype=jnp.float32))
    inp = make_synthetic_file(str(tmp_path / "in.uevt"), n_events=4,
                              hw=(64, 64))
    out_q = str(tmp_path / "q.uevt")
    out_f = str(tmp_path / "f.uevt")
    qr = PrecroppedRunner(qmodel, variables, batch_size=2)
    assert qr.calibrate_from(inp, plane=2) == 4
    assert "quant" in qr.variables
    qr.run(inp, out_q, plane=2)
    PrecroppedRunner(model, variables, batch_size=2).run(inp, out_f, plane=2)
    for e in range(4):
        sq = EventFileReader(out_q).read_entry(e)["uburn_plane2"]
        sf = EventFileReader(out_f).read_entry(e)["uburn_plane2"]
        np.testing.assert_allclose(
            sum(s.pixels for s in sq), 1.0, atol=1e-3)
        err = np.mean([np.abs(a.pixels - b.pixels).mean()
                       for a, b in zip(sq, sf)])
        # inplanes=4 toy width carries ~3x the relative int8 noise of
        # real widths (cf. 1.3e-2 at inplanes=8, tests/test_quant.py)
        assert err < 0.06, f"entry {e}: mean |dp| {err}"


def test_wholeview_runner_int8(tmp_path, tiny_model):
    """Wholeview --int8 path: calibrate_from tiles the input with the
    scoring grid, keeps only occupied tiles, and the quantized stitched
    scores stay close to the f32 run (probabilities still sum to 1)."""
    import dataclasses

    model, variables = tiny_model
    qmodel = model.clone(policy=dataclasses.replace(
        Policy.tpu_int8(), compute_dtype=jnp.float32))
    inp = make_synthetic_file(str(tmp_path / "wv.uevt"), n_events=2,
                              hw=(128, 192))
    kw = dict(tile_rows=64, tile_cols=64, min_overlap_rows=8,
              min_overlap_cols=8, crop_batch=4)
    qr = WholeViewRunner(qmodel, variables, **kw)
    n_tiles = qr.calibrate_from(inp, n_images=2, percentile=99.9)
    assert n_tiles > 0
    assert "quant" in qr.variables
    out_q = str(tmp_path / "q.uevt")
    out_f = str(tmp_path / "f.uevt")
    qr.run(inp, out_q, planes=[2])
    WholeViewRunner(model, variables, **kw).run(inp, out_f, planes=[2])
    for e in range(2):
        sq = EventFileReader(out_q).read_entry(e)["ubsnet_plane2"]
        sf = EventFileReader(out_f).read_entry(e)["ubsnet_plane2"]
        np.testing.assert_allclose(
            sum(s.pixels for s in sq), 1.0, atol=2e-3)
        err = np.mean([np.abs(a.pixels - b.pixels).mean()
                       for a, b in zip(sq, sf)])
        assert err < 0.06, f"entry {e}: mean |dp| {err}"


def test_wholeview_calibrate_requires_occupied(tmp_path, tiny_model):
    """All-empty input -> calibrate_from raises (no occupied tiles)."""
    import dataclasses

    from ubresnet_tpu.data import EventFileWriter
    from ubresnet_tpu.data.meta import Image2D, ImageMeta

    model, variables = tiny_model
    qmodel = model.clone(policy=dataclasses.replace(
        Policy.tpu_int8(), compute_dtype=jnp.float32))
    path = str(tmp_path / "empty.uevt")
    w = EventFileWriter(path)
    meta = ImageMeta(0.0, 0.0, 192.0, 128.0, rows=128, cols=192, plane=2)
    w.append("wire", Image2D(np.zeros((128, 192), np.float32), meta, 1, 0, 0))
    w.set_id(1, 0, 0)
    w.save_entry()
    w.close()
    qr = WholeViewRunner(qmodel, variables, tile_rows=64, tile_cols=64,
                         min_overlap_rows=8, min_overlap_cols=8)
    with pytest.raises(ValueError, match="occupied"):
        qr.calibrate_from(path)


def test_wholeview_spatial_int8_matches_unsharded(tmp_path, tiny_model):
    """int8 quant_eval under the spatial row-sharded forward: the
    quantized whole-plane forward over the 8-device mesh == the same
    quantized forward on one device (integer conv math + scalar
    activation scales must be GSPMD-invariant)."""
    import dataclasses

    import jax
    from jax.sharding import Mesh

    model, variables = tiny_model
    qmodel = model.clone(policy=dataclasses.replace(
        Policy.tpu_int8(), compute_dtype=jnp.float32))
    inp = make_synthetic_file(str(tmp_path / "wv.uevt"), n_events=2,
                              hw=(128, 192))
    kw = dict(tile_rows=64, tile_cols=64, min_overlap_rows=8,
              min_overlap_cols=8, crop_batch=4)
    qr = WholeViewRunner(qmodel, variables, **kw)
    qr.calibrate_from(inp, n_images=2)
    qvars = qr.variables

    img = np.random.RandomState(3).rand(100, 192).astype(np.float32) * 30
    img[img < 24.0] = 0.0

    mesh = Mesh(np.array(jax.devices()[:8]), ("devices",))
    sp = WholeViewRunner(qmodel, qvars, spatial_mesh=mesh, **kw)
    got = sp.score_image(img)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-3)

    single = WholeViewRunner(qmodel, qvars, spatial_mesh=Mesh(
        np.array(jax.devices()[:1]), ("devices",)), **kw)
    ref = single.score_image(img)
    # NOT exact: quantize_act rounds the BN-folded f32 input, and a
    # 1-ULP layout-dependent difference at a rounding boundary flips a
    # quantized value; the random-init model saturates log-softmax so
    # a flip shows as a one-hot pixel (measured: 14/57600). Pin the
    # agreement fraction and the bulk error instead.
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.995, f"argmax agreement {agree}"
    close = np.abs(got - ref) < 2e-3
    assert close.mean() > 0.995, f"close fraction {close.mean()}"


def test_precropped_runner_data_parallel(tmp_path, tiny_model):
    """data_mesh deploy: batches sharded over the 8-device virtual mesh
    produce the same scores as the single-device runner (GSPMD
    data-parallel inference — pod-slice deploy), including the padded
    tail batch; batch_size must divide by the device count."""
    import jax
    from jax.sharding import Mesh

    model, variables = tiny_model
    inp = make_synthetic_file(str(tmp_path / "in.uevt"), n_events=5,
                              hw=(64, 64))
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    with pytest.raises(ValueError, match="divisible"):
        PrecroppedRunner(model, variables, batch_size=6, data_mesh=mesh)

    out_dp = str(tmp_path / "dp.uevt")
    out_1 = str(tmp_path / "one.uevt")
    PrecroppedRunner(model, variables, batch_size=8,
                     data_mesh=mesh).run(inp, out_dp, plane=2)
    PrecroppedRunner(model, variables, batch_size=8).run(inp, out_1,
                                                         plane=2)
    ra, rb = EventFileReader(out_dp), EventFileReader(out_1)
    assert len(ra) == len(rb) == 5
    for e in range(5):
        sa = ra.read_entry(e)["uburn_plane2"]
        sb = rb.read_entry(e)["uburn_plane2"]
        assert ra.rse(e) == rb.rse(e)
        for a, b in zip(sa, sb):
            # not bit-exact: GSPMD partitions the convs differently
            # than the single-device program, so f32 reduction order
            # shifts (measured max |dp| 8e-4 on a saturated softmax)
            np.testing.assert_allclose(a.pixels, b.pixels, atol=2e-3)


def test_precropped_runner_sparse_readback(tmp_path, tiny_model):
    """Sparse-readback mode: scores at charge pixels (+halo) match the
    full-precision run to the u8 quantisation step; pixels outside the
    halo carry the network's zero-input response field; every written
    pixel still sums to ~1 over classes."""
    from ubresnet_tpu.ops.sparse import dilate_mask

    model, variables = tiny_model
    inp = make_synthetic_file(str(tmp_path / "in.uevt"), n_events=4,
                              hw=(64, 64))
    full = PrecroppedRunner(model, variables, batch_size=2)
    sparse = PrecroppedRunner(
        model, variables, batch_size=2,
        compact_readback="sparse", readback_dilate=3,
    )
    full.run(inp, str(tmp_path / "full.uevt"), plane=2)
    sparse.run(inp, str(tmp_path / "sparse.uevt"), plane=2)

    import jax.numpy as jnp
    bg = np.asarray(
        jnp.exp(model.apply(variables, jnp.zeros((1, 64, 64, 1))))
    )[0]

    ri = EventFileReader(inp)
    rf = EventFileReader(str(tmp_path / "full.uevt"))
    rs = EventFileReader(str(tmp_path / "sparse.uevt"))
    for e in range(4):
        adc = [im for im in ri.read_entry(e)["wire"]
               if im.meta.plane == 2][0].pixels
        halo = dilate_mask((adc != 0)[None], 3)[0]
        assert halo.any() and not halo.all()
        sf = rf.read_entry(e)["uburn_plane2"]
        ss = rs.read_entry(e)["uburn_plane2"]
        assert len(ss) == 3
        np.testing.assert_allclose(
            sum(s.pixels for s in ss), 1.0, atol=6e-3
        )
        for a, b in zip(sf, ss):
            np.testing.assert_allclose(
                a.pixels[halo], b.pixels[halo], atol=6e-3
            )
        for c, s in enumerate(ss):
            np.testing.assert_allclose(
                s.pixels[~halo], bg[..., c][~halo], atol=1e-6
            )
