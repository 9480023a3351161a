"""Regression: sparse compact-readback across batches whose halo
capacity SHRINKS after growing — the round-4 bug trigger.

``PrecroppedRunner._dispatch`` keeps a sticky ``_out_cap`` so the
gather program compiles once; a later batch with fewer halo pixels is
padded up to capacity. Round 4 padded with index 0, so every pad slot
pasted its (garbage) gathered score onto flat pixel (0,0), clobbering
the background fill (VERDICT r4 weak #1; reference behavior this mode
accelerates: deploy/run_ubresnet_precropped.py score write-back).
The fix pads with the -1 sentinel and drops those slots on the host
paste (deploy/precropped.py:_fetch_sparse, ops/sparse.mask_indices).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ubresnet_tpu.data.meta import Image2D, ImageMeta
from ubresnet_tpu.data.uevt import EventFileReader, EventFileWriter


@pytest.fixture(scope="module")
def tiny_model():
    import jax.numpy as jnp

    from ubresnet_tpu.core.precision import Policy
    from ubresnet_tpu.models import get_model

    model = get_model(
        "uresnet",
        policy=Policy(pack_width=0, compute_dtype=jnp.float32),
        input_channels=1,
        inplanes=4,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    return model, variables


def _write_events(path, charges_per_event, hw=64, seed=7):
    """One plane-2 wire image per event with exactly ``n`` charged
    pixels, descending across events so a later batch's halo count is
    strictly below the sticky capacity set by the first."""
    rng = np.random.RandomState(seed)
    metas = ImageMeta(0.0, 0.0, hw * 0.5, hw * 0.5, hw, hw, 2)
    with EventFileWriter(path) as w:
        for e, n in enumerate(charges_per_event):
            px = np.zeros((hw, hw), np.float32)
            # keep charges >= 8 px from the border so the r=2 halo
            # never reaches pixel (0,0) — the bug-signature pixel
            ys = rng.randint(8, hw - 8, size=n)
            xs = rng.randint(8, hw - 8, size=n)
            px[ys, xs] = rng.uniform(20.0, 80.0, size=n).astype(np.float32)
            w.append("wire", Image2D(px, metas))
            w.set_id(1, 0, e)
            w.save_entry()


def test_sparse_readback_survives_capacity_shrink(tmp_path, tiny_model):
    from ubresnet_tpu.deploy.precropped import PrecroppedRunner
    from ubresnet_tpu.ops.sparse import dilate_mask

    model, variables = tiny_model
    inp = str(tmp_path / "in.uevt")
    # batch 1: dense events (large halo -> sets _out_cap); batch 2:
    # nearly-empty events (tiny halo -> padded to capacity with the
    # sentinel). With 0-padding every pad slot hits flat pixel (0,0).
    _write_events(inp, charges_per_event=[700, 650, 3, 2])

    runner = PrecroppedRunner(
        model, variables, batch_size=2,
        compact_readback="sparse", readback_dilate=2,
    )
    out = str(tmp_path / "out.uevt")
    runner.run(inp, out, plane=2)
    assert runner._out_cap > 0

    import jax.numpy as jnp
    bg = np.asarray(
        jnp.exp(model.apply(variables, jnp.zeros((1, 64, 64, 1))))
    )[0]

    ri, rs = EventFileReader(inp), EventFileReader(out)
    for e in range(4):
        adc = [im for im in ri.read_entry(e)["wire"]
               if im.meta.plane == 2][0].pixels
        halo = dilate_mask((adc != 0)[None], 2)[0]
        ss = rs.read_entry(e)["uburn_plane2"]
        # the bug signature: pixel (0,0) is outside every event's halo
        # and must carry the exact zero-input background score
        assert not halo[0, 0]
        for c, s in enumerate(ss):
            np.testing.assert_allclose(
                s.pixels[~halo], bg[..., c][~halo], atol=1e-6,
                err_msg=f"event {e} class {c}: out-of-halo pixels "
                        f"deviate from the background field",
            )
            np.testing.assert_allclose(s.pixels[0, 0], bg[0, 0, c],
                                       atol=1e-6)
