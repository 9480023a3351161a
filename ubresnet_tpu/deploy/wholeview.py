"""Whole-view inference — split, score, stitch, all device-resident.

Capability parity with deploy/run_ubresnet_wholeview.py (the reference
file is a partially-unadapted larflow copy, SURVEY.md §2 caveats; this
implements the *intended* ubresnet pipeline: single-input, per-plane,
3-class):

  1. read whole-plane ADC images (e.g. 1008x3456),
  2. tile into overlapping 512x832 crops (UBSplitDetector role —
     static grid, ops/tiling.py),
  3. batch crops through the network,
  4. overlap-average per-crop class scores back into whole-view score
     images (UBLArFlowStitcher role),
  5. write per-class images to producer ``ubsnet_plane%d`` with crop
     metas derived from the whole-image meta.

Split/score/stitch compile into one XLA program per plane; only the
final stitched scores return to the host.
"""
from __future__ import annotations

import time
from collections import OrderedDict
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ubresnet_tpu.data.meta import Image2D
from ubresnet_tpu.data.uevt import EventFileWriter
from ubresnet_tpu.ops.tiling import extract_tiles, stitch_tiles, tile_grid


class WholeViewRunner:
    def __init__(
        self,
        model,
        variables,
        tile_rows: int = 512,
        tile_cols: int = 832,
        min_overlap_rows: int = 16,
        min_overlap_cols: int = 176,
        crop_batch: int = 10,
        sparse: bool = True,
        sparse_bucket: int = 8192,
        covered_z_width: int = 310,
        det_half_height_cm: Optional[float] = None,
        spatial_mesh=None,
        score_dtype=np.float32,
    ):
        self.model = model
        self.variables = variables
        self.tile_rows = tile_rows
        self.tile_cols = tile_cols
        self.min_overlap_rows = min_overlap_rows
        self.min_overlap_cols = min_overlap_cols
        self.crop_batch = crop_batch
        self.sparse = sparse
        self.sparse_bucket = sparse_bucket
        self.covered_z_width = covered_z_width
        self.det_half_height_cm = det_half_height_cm
        # spatial_mesh: a jax.sharding.Mesh → score whole planes in ONE
        # forward with rows sharded over the mesh (GSPMD halo exchange)
        # instead of crop-and-stitch — the deploy-side CP analog
        # (SURVEY.md §5.7b; replaces the reference's only option,
        # UBSplitDetector+Stitcher crops, run_ubresnet_wholeview.py:199-287)
        self.spatial_mesh = spatial_mesh
        # score_dtype: storage dtype of written score images (float16
        # halves .uevt bytes at ~5e-4 quantisation — same lever as
        # PrecroppedRunner's --f16-scores)
        self.score_dtype = score_dtype
        self._cap = 0
        self._compiled = {}

    def _pipeline(self, hw: Tuple[int, int], cap: int = 0,
                  grid: Optional[Tuple[Tuple[int, int], ...]] = None):
        """Jitted split→forward→stitch for a whole-image size; when
        ``cap > 0`` the program takes a COO (indices, values) pair and
        densifies on device first. Cached per (hw, cap, grid)."""
        key = (hw, cap, grid)
        if key in self._compiled:
            return self._compiled[key]
        if grid is None:
            grid = tile_grid(
                hw[0],
                hw[1],
                self.tile_rows,
                self.tile_cols,
                self.min_overlap_rows,
                self.min_overlap_cols,
            )
        n_tiles = len(grid)
        # pad tile count to a multiple of crop_batch for static shapes
        n_pad = (-n_tiles) % self.crop_batch

        def body(variables, image):
            tiles = extract_tiles(image, grid, self.tile_rows, self.tile_cols)
            if n_pad:
                tiles = jnp.concatenate(
                    [tiles, jnp.zeros((n_pad,) + tiles.shape[1:], tiles.dtype)]
                )
            chunks = tiles.reshape(
                -1, self.crop_batch, self.tile_rows, self.tile_cols, tiles.shape[-1]
            )
            scores = jax.lax.map(
                lambda t: jnp.exp(self.model.apply(variables, t)), chunks
            )
            scores = scores.reshape(-1, *scores.shape[2:])[:n_tiles]
            return stitch_tiles(scores, grid, hw)

        if cap:
            from ubresnet_tpu.ops.sparse import densify

            @jax.jit
            def run(variables, idx, val):
                return body(variables, densify(idx, val, hw)[0])

        else:

            @jax.jit
            def run(variables, image):
                return body(variables, image)

        self._compiled[key] = (run, grid)
        return self._compiled[key]

    # UResNet downsamples by 2^5 (stem pool + four stride-2 encoders);
    # whole-plane spatial mode pads to this so the static decoder
    # output_size math round-trips at any view size (1008 -> 1024).
    SPATIAL_DIVISOR = 32

    def _spatial_pipeline(self, hw: Tuple[int, int], cap: int = 0):
        """Jitted whole-plane forward with rows sharded over
        ``spatial_mesh`` — pad to the stride multiple, one model.apply
        (GSPMD halo-exchanges the conv windows across row cuts), slice
        back. Cached per (hw, cap)."""
        key = ("spatial", hw, cap)
        if key in self._compiled:
            return self._compiled[key]
        from ubresnet_tpu.parallel import plane_sharding

        sh = plane_sharding(self.spatial_mesh)
        pad_r = (-hw[0]) % self.SPATIAL_DIVISOR
        pad_c = (-hw[1]) % self.SPATIAL_DIVISOR

        def body(variables, image):  # (h, w) f32 dense
            img4 = jnp.pad(image, ((0, pad_r), (0, pad_c)))[None, ..., None]
            img4 = jax.lax.with_sharding_constraint(img4, sh)
            probs = jnp.exp(self.model.apply(variables, img4))
            return probs[0, : hw[0], : hw[1], :]

        if cap:
            from ubresnet_tpu.ops.sparse import densify

            @jax.jit
            def run(variables, idx, val):
                return body(variables, densify(idx, val, hw)[0, ..., 0])

        else:

            @jax.jit
            def run(variables, image):
                return body(variables, image)

        self._compiled[key] = (run, None)
        return self._compiled[key]

    def calibrate_from(
        self,
        input_file: str,
        producer: str = "wire",
        planes: Optional[Sequence[int]] = None,
        n_images: int = 4,
        percentile: Optional[float] = None,
        adc_threshold: float = 10.0,
    ) -> int:
        """int8 PTQ calibration (ops/quant.py) from the first
        ``n_images`` whole-plane images of the input itself — the
        wholeview analog of PrecroppedRunner.calibrate_from. Each plane
        is tiled with the SAME static grid the scoring path uses and
        only occupied tiles (any pixel >= ``adc_threshold``) feed the
        calibration, so the recorded activation ranges match what eval
        actually sees (empty crops would only dilute the statistic).
        Requires ``quant_eval=True`` in the model policy
        (``Policy.tpu_int8()``); updates ``self.variables`` with the
        calibrated 'quant' collection. ``percentile``: outlier-robust
        scale statistic (see ops/quant.calibrate). Returns the number
        of calibration TILES used."""
        from ubresnet_tpu.data.rootio import open_event_file
        from ubresnet_tpu.ops.quant import calibrate

        reader = open_event_file(input_file)
        tiles = []
        n_planes = 0
        for i in range(len(reader)):
            if n_planes >= n_images:
                break
            ev = reader.read_entry(i, producers=[producer])
            for im in ev.get(producer, []):
                if planes is not None and im.meta.plane not in planes:
                    continue
                if n_planes >= n_images:
                    break
                n_planes += 1
                px = np.asarray(im.pixels, np.float32)
                grid = tile_grid(
                    px.shape[0], px.shape[1],
                    self.tile_rows, self.tile_cols,
                    self.min_overlap_rows, self.min_overlap_cols,
                )
                for r0, c0 in grid:
                    t = px[r0 : r0 + self.tile_rows,
                           c0 : c0 + self.tile_cols]
                    if (t >= adc_threshold).any():
                        tiles.append(t)
        if not tiles:
            raise ValueError(
                f"no occupied '{producer}' tiles in {input_file}"
            )
        batches = [
            np.stack(tiles[j : j + self.crop_batch])[..., None]
            for j in range(0, len(tiles), self.crop_batch)
        ]
        self.variables = calibrate(
            self.model, self.variables, batches, percentile=percentile
        )
        return len(tiles)

    def make_bboxes(
        self,
        image: np.ndarray,
        randomize: bool = False,
        n_random: int = 10,
        min_frac_pixels: float = 0.0,
        adc_threshold: float = 10.0,
        rng=None,
    ):
        """Tile-origin (row0, col0) sets for an image — the
        UBSplitDetector bbox-producer role (OutputBBox2DProducer,
        RandomizeCrops, MinFracPixelsInCrop,
        run_ubresnet_wholeview.py:35-47). The stitched scoring path
        always uses the full static grid (coverage is required);
        this is for crop-level consumers."""
        from ubresnet_tpu.ops.tiling import filter_occupied, random_grid, tile_grid

        if randomize:
            grid = random_grid(
                image.shape[0], image.shape[1], self.tile_rows, self.tile_cols,
                n_tiles=n_random, rng=rng,
            )
        else:
            grid = tile_grid(
                image.shape[0], image.shape[1], self.tile_rows, self.tile_cols,
                self.min_overlap_rows, self.min_overlap_cols,
            )
        return filter_occupied(
            image, grid, self.tile_rows, self.tile_cols, min_frac_pixels,
            adc_threshold,
        )

    def dispatch_image(
        self,
        image: np.ndarray,
        grid: Optional[Tuple[Tuple[int, int], ...]] = None,
    ) -> jax.Array:
        """Asynchronously dispatch the split→score→stitch program for
        one plane; returns the device array. JAX dispatch is async, so
        callers can enqueue several planes and read them back in order
        — the D2H of plane k then overlaps the compute of plane k+1
        (same one-deep-pipeline idea as deploy/precropped.py).

        With ``spatial_mesh`` set, the plane is scored in one
        row-sharded forward instead of crop-and-stitch (``grid`` is
        then ignored — there are no crops)."""
        spatial = self.spatial_mesh is not None
        if not self.sparse:
            if spatial:
                run, _ = self._spatial_pipeline(image.shape[:2])
                return run(self.variables, jnp.asarray(image, jnp.float32))
            run, _ = self._pipeline(image.shape[:2], grid=grid)
            return run(self.variables, jnp.asarray(image, jnp.float32)[..., None])
        from ubresnet_tpu.ops.sparse import sparsify

        sp = sparsify(image[None].astype(np.float32), bucket=self.sparse_bucket)
        k = sp["indices"].shape[1]
        self._cap = max(self._cap, k)
        if k < self._cap:
            pad = self._cap - k
            sp["indices"] = np.pad(sp["indices"], ((0, 0), (0, pad)))
            sp["values"] = np.pad(sp["values"], ((0, 0), (0, pad)))
        if spatial:
            run, _ = self._spatial_pipeline(image.shape[:2], cap=self._cap)
        else:
            run, _ = self._pipeline(image.shape[:2], cap=self._cap, grid=grid)
        return run(
            self.variables,
            jax.device_put(sp["indices"]),
            jax.device_put(sp["values"]),
        )

    def score_image(
        self,
        image: np.ndarray,
        grid: Optional[Tuple[Tuple[int, int], ...]] = None,
    ) -> np.ndarray:
        """(h, w) ADC -> (h, w, classes) stitched probabilities.

        Sparse mode ships the whole plane as COO nonzeros (a 1008x3456
        view is ~14 MB dense, typically <1% occupied) and densifies
        on-device before the split→score→stitch program. ``grid``
        overrides the default per-plane tile grid (used by the
        detector-consistent triplet path)."""
        return np.asarray(jax.device_get(self.dispatch_image(image, grid)))

    def _detsplit_grids(self, hw: Tuple[int, int]):
        """Per-plane grids from 3D-consistent triplets (UBSplitDetector
        semantics, ops/tiling.py detsplit_triplets). Cached per shape."""
        from ubresnet_tpu.ops.tiling import detsplit_triplets, triplet_plane_grid

        key = ("detsplit", hw)
        if key not in self._compiled:
            kw = {}
            if self.det_half_height_cm is not None:
                kw["half_height_cm"] = self.det_half_height_cm
            trips = detsplit_triplets(
                hw[0], hw[1], self.tile_rows, self.tile_cols,
                covered_z_width=self.covered_z_width,
                min_overlap_rows=self.min_overlap_rows, **kw,
            )
            self._compiled[key] = {
                p: triplet_plane_grid(trips, p) for p in (0, 1, 2)
            }
        return self._compiled[key]

    def run(
        self,
        input_file: str,
        output_file: str,
        producer: str = "wire",
        planes: Optional[Sequence[int]] = None,
        n_entries: Optional[int] = None,
        detsplit: bool = False,
        passthrough: bool = False,
        verbose: bool = False,
    ) -> OrderedDict:
        """Score whole views. ``detsplit`` positions each plane's crops
        by the 3D-consistent triplet math (the reference's
        UBSplitDetector behavior) instead of independent per-plane
        grids. ``passthrough`` copies the input event content into the
        output file alongside the scores — the reference's
        IOManager(kBOTH) mode (run_ubresnet_wholeview.py:130-133), so
        downstream consumers keep ADC/truth images."""
        timing = OrderedDict(
            [("total", 0.0), ("read", 0.0), ("splitscore", 0.0), ("write", 0.0)]
        )
        t_total = time.time()
        from ubresnet_tpu.data.rootio import open_event_file

        reader = open_event_file(input_file)
        if output_file.endswith(".root"):
            # write-back path: scores flow to larcv consumers (reference
            # IOManager(kWRITE), run_ubresnet_wholeview.py:130-133)
            from ubresnet_tpu.data.rootio import RootWriter

            writer = RootWriter(output_file)
            # RootWriter stores float32 (larcv Image2D is float)
            out_dt = np.float32
        else:
            writer = EventFileWriter(output_file)
            out_dt = self.score_dtype
        n = len(reader) if n_entries is None else min(n_entries, len(reader))

        for i in range(n):
            t0 = time.time()
            ev = reader.read_entry(i, producers=None if passthrough else [producer])
            images = ev[producer]
            if planes is not None:
                images = [im for im in images if im.meta.plane in planes]
            timing["read"] += time.time() - t0

            if passthrough:
                t0 = time.time()
                for prod, imgs in ev.items():
                    for im in imgs:
                        writer.append(prod, im)
                timing["write"] += time.time() - t0

            # dispatch every plane of the entry first (async enqueue),
            # then drain in order: plane k's D2H readback overlaps
            # plane k+1's on-device compute
            t0 = time.time()
            in_flight = []
            for img in images:
                grid = None
                if detsplit:
                    grid = self._detsplit_grids(img.pixels.shape[:2])[
                        img.meta.plane
                    ]
                in_flight.append((img, self.dispatch_image(img.pixels,
                                                           grid=grid)))
            timing["splitscore"] += time.time() - t0

            for img, dev in in_flight:
                t0 = time.time()
                scores = np.asarray(jax.device_get(dev))
                timing["splitscore"] += time.time() - t0

                t0 = time.time()
                for c in range(scores.shape[-1]):
                    writer.append(
                        f"ubsnet_plane{img.meta.plane}",
                        Image2D(scores[..., c].astype(out_dt),
                                img.meta, *img.rse),
                    )
                timing["write"] += time.time() - t0
            # one output entry per event, all planes (reference writes
            # per-event via save_entry, run_ubresnet_wholeview.py:284-286)
            t0 = time.time()
            if images:
                writer.set_id(*images[0].rse)
            writer.save_entry()
            timing["write"] += time.time() - t0
            if verbose:
                print(f"entry {i}: {len(images)} planes scored", flush=True)

        writer.close()
        timing["total"] = time.time() - t_total
        if verbose:
            print("------ timing -------")
            for k, v in timing.items():
                print(f"{k} : {v:.3f} s / {v / max(n, 1):.5f} s per event")
        return timing
