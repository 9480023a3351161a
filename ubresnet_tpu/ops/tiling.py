"""Device-resident crop-and-stitch — the wholeview pipeline's core ops.

The reference splits whole detector views (3456x1008) into overlapping
512x832 crops with larcv::UBSplitDetector and reassembles per-crop
network output with larcv::UBLArFlowStitcher, both C++ host code
(deploy/run_ubresnet_wholeview.py:33-55,136,272). Here the tile grid is
*static* Python data (compiled into the XLA program) and extraction /
stitching are jitted gathers / scatter-adds, so whole-plane tensors
never leave the device between split, inference, and stitch.

Overlap policy: UBLArFlowStitcher's C++ resolution rule is not
readable from the reference; we define overlap-averaging (mean of all
covering crops) — deterministic and validated by exactness tests on
constant fields (SURVEY.md §7 hard parts).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _axis_positions(size: int, tile: int, min_overlap: int) -> List[int]:
    """Evenly-spaced tile starts covering [0, size) with >= min_overlap
    between neighbors and first/last flush with the edges."""
    if tile >= size:
        return [0]
    if min_overlap >= tile:
        # stride would be <= 0: ceil(span/stride) goes negative and the
        # grid silently comes out EMPTY (nothing scored). Always a
        # misconfiguration — e.g. shrinking tile_cols while keeping the
        # default 176-col overlap.
        raise ValueError(
            f"min_overlap ({min_overlap}) must be < tile ({tile})"
        )
    span = size - tile
    stride = tile - min_overlap
    n = int(np.ceil(span / stride)) + 1
    return [round(i * span / (n - 1)) for i in range(n)]


def tile_grid(
    rows: int,
    cols: int,
    tile_rows: int = 512,
    tile_cols: int = 832,
    min_overlap_rows: int = 16,
    min_overlap_cols: int = 176,
) -> Tuple[Tuple[int, int], ...]:
    """Static (row0, col0) tile-origin grid covering a (rows, cols)
    image. Defaults reproduce the reference geometry on a 1008x3456
    plane: 2x5 = 10 crops of 512x832 (BBoxPixelHeight/Width + Z
    overlap, run_ubresnet_wholeview.py:38-44)."""
    if tile_rows > rows or tile_cols > cols:
        raise ValueError(
            f"tile ({tile_rows},{tile_cols}) larger than image ({rows},{cols})"
        )
    rpos = _axis_positions(rows, tile_rows, min_overlap_rows)
    cpos = _axis_positions(cols, tile_cols, min_overlap_cols)
    return tuple((r, c) for r in rpos for c in cpos)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def extract_tiles(
    image: jax.Array,
    grid: Tuple[Tuple[int, int], ...],
    tile_rows: int,
    tile_cols: int,
) -> jax.Array:
    """(h, w, c) image -> (n_tiles, tile_rows, tile_cols, c) crops.

    Static offsets: XLA lowers each crop to a slice and fuses the
    stack; no host round-trip (reference slices in numpy per crop,
    run_ubresnet_wholeview.py:244-249).
    """
    crops = [
        jax.lax.dynamic_slice(
            image, (r, c, 0), (tile_rows, tile_cols, image.shape[-1])
        )
        for r, c in grid
    ]
    return jnp.stack(crops)


@functools.partial(jax.jit, static_argnums=(1, 2))
def stitch_tiles(
    tiles: jax.Array,
    grid: Tuple[Tuple[int, int], ...],
    out_hw: Tuple[int, int],
) -> jax.Array:
    """(n, th, tw, c) per-crop output -> (h, w, c) overlap-averaged.

    Scatter-add of values and coverage counts, one divide at the end —
    the UBLArFlowStitcher role, on device.
    """
    n, th, tw, ch = tiles.shape
    h, w = out_hw
    acc = jnp.zeros((h, w, ch), tiles.dtype)
    cnt = jnp.zeros((h, w, 1), tiles.dtype)
    one = jnp.ones((th, tw, 1), tiles.dtype)
    for i, (r, c) in enumerate(grid):
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(acc, (r, c, 0), (th, tw, ch)) + tiles[i],
            (r, c, 0),
        )
        cnt = jax.lax.dynamic_update_slice(
            cnt,
            jax.lax.dynamic_slice(cnt, (r, c, 0), (th, tw, 1)) + one,
            (r, c, 0),
        )
    return acc / jnp.maximum(cnt, 1.0)


def random_grid(
    rows: int,
    cols: int,
    tile_rows: int = 512,
    tile_cols: int = 832,
    n_tiles: int = 10,
    rng: Optional[np.random.RandomState] = None,
    max_tiles: int = 1000,
) -> Tuple[Tuple[int, int], ...]:
    """Random tile origins (UBSplitDetector RandomizeCrops /
    MaxRandomAttempts, run_ubresnet_wholeview.py:44-46). Training-style
    crop sampling over whole views."""
    rng = rng or np.random.RandomState()
    n = min(n_tiles, max_tiles)
    rs = rng.randint(0, rows - tile_rows + 1, size=n)
    cs = rng.randint(0, cols - tile_cols + 1, size=n)
    return tuple((int(r), int(c)) for r, c in zip(rs, cs))


def filter_occupied(
    image: np.ndarray,
    grid: Sequence[Tuple[int, int]],
    tile_rows: int,
    tile_cols: int,
    min_frac_pixels: float = 0.0,
    threshold: float = 10.0,
) -> Tuple[Tuple[int, int], ...]:
    """Drop tiles whose above-threshold occupancy is below
    min_frac_pixels (UBSplitDetector MinFracPixelsInCrop,
    run_ubresnet_wholeview.py:47). Host-side: selection changes tile
    COUNT, which must stay off the compiled path."""
    if min_frac_pixels <= 0:
        return tuple(grid)
    out = []
    npx = tile_rows * tile_cols
    for r, c in grid:
        occ = (image[r : r + tile_rows, c : c + tile_cols] > threshold).sum()
        if occ / npx >= min_frac_pixels:
            out.append((r, c))
    return tuple(out)


def coverage(grid: Sequence[Tuple[int, int]], tile_rows: int, tile_cols: int,
             rows: int, cols: int) -> np.ndarray:
    """Host-side coverage counts (for tests / grid sanity checks)."""
    cov = np.zeros((rows, cols), np.int32)
    for r, c in grid:
        cov[r : r + tile_rows, c : c + tile_cols] += 1
    return cov


# ------------------------------------------------ 3-plane consistency
#
# UBSplitDetector (run_ubresnet_wholeview.py:33-55) emits 3D-consistent
# bbox TRIPLETS: one 512x832 crop per wire plane (U=0, V=1, Y=2) such
# that all three cover the same detector (y, z) region. The C++ source
# is in an unmounted submodule, so the wire-range math is derived here
# from MicroBooNE geometry first principles:
#
#   * wire pitch 0.3 cm on every plane;
#   * Y (collection) wires are vertical: wire = z / pitch, 3456 wires
#     over z in [0, 1036.8] cm;
#   * U/V (induction) wires run at +-60 deg from vertical: their wire
#     coordinate mixes z and y, 2400 wires over the 720 cm normal span
#     (detector half-height 116.5 cm);
#   * an 832-pixel (249.6 cm) induction crop therefore covers the FULL
#     detector height (233 cm * sin60 = 201.8 cm) plus a z slab of
#     310 px * 0.3 cm * cos60 = 46.5 cm -- 828 px total. That is
#     exactly why the reference pairs BBoxPixelWidth: 832 with
#     CoveredZWidth: 310: the central 310-pixel z window of the Y crop
#     is guaranteed visible in the matching U and V crops at EVERY y.

WIRE_PITCH_CM = 0.3
DET_HALF_HEIGHT_CM = 116.5
_UV_COS = 0.5  # cos(60 deg): z contribution to U/V wire coordinate
_UV_SIN = float(np.sqrt(3.0) / 2.0)  # sin(60 deg): y contribution


def wire_coordinate(
    plane: int,
    y_cm: float,
    z_cm: float,
    half_height_cm: float = DET_HALF_HEIGHT_CM,
) -> float:
    """Fractional wire number of detector point (y, z) on a plane —
    the larcv Geometry::WireCoordinate role for the wholeview split.
    ``half_height_cm`` parameterizes the detector for scaled tests."""
    if plane == 2:  # collection (Y): vertical wires
        return z_cm / WIRE_PITCH_CM
    if plane == 0:  # induction U: wire number grows with z, falls with y
        return (
            z_cm * _UV_COS + (half_height_cm - y_cm) * _UV_SIN
        ) / WIRE_PITCH_CM
    if plane == 1:  # induction V: mirror of U in y
        return (
            z_cm * _UV_COS + (y_cm + half_height_cm) * _UV_SIN
        ) / WIRE_PITCH_CM
    raise ValueError(f"plane must be 0, 1 or 2, got {plane}")


@dataclasses.dataclass(frozen=True)
class TripletCrop:
    """One 3D-consistent crop set: same rows (time) on all planes,
    per-plane column origins, and the detector-z pixel window the
    triplet is guaranteed to share."""

    row0: int
    col0: Tuple[int, int, int]  # (U, V, Y) column origins
    z_window: Tuple[int, int]  # Y-plane columns [z0, z1) covered on all planes

    def origin(self, plane: int) -> Tuple[int, int]:
        return (self.row0, self.col0[plane])


def detsplit_triplets(
    rows: int = 1008,
    cols: int = 3456,
    tile_rows: int = 512,
    tile_cols: int = 832,
    covered_z_width: int = 310,
    min_overlap_rows: int = 16,
    half_height_cm: float = DET_HALF_HEIGHT_CM,
) -> Tuple[TripletCrop, ...]:
    """3-plane consistent tiling of a whole detector view — the
    UBSplitDetector configuration of run_ubresnet_wholeview.py:33-55
    (BBoxPixelHeight/Width 512x832, CoveredZWidth 310,
    FillCroppedYImageCompletely).

    The z axis (Y-plane columns) is tiled in consecutive
    ``covered_z_width`` windows covering all ``cols`` columns; each
    window yields, per time band, one crop per plane positioned so the
    window's full (y, z) slab is inside all three crops.
    """
    if tile_cols > cols:
        raise ValueError(f"tile_cols {tile_cols} > image cols {cols}")
    span_needed = (
        2 * half_height_cm * _UV_SIN / WIRE_PITCH_CM
        + covered_z_width * _UV_COS
    )
    if span_needed > tile_cols:
        raise ValueError(
            f"covered_z_width {covered_z_width} needs {span_needed:.0f} "
            f"induction columns > tile_cols {tile_cols}"
        )
    rpos = _axis_positions(rows, tile_rows, min_overlap_rows)
    zpos = _axis_positions(cols, covered_z_width, 0)

    triplets = []
    for z0px in zpos:
        z1px = z0px + covered_z_width
        z0, z1 = z0px * WIRE_PITCH_CM, z1px * WIRE_PITCH_CM
        origins = []
        for plane in (0, 1, 2):
            corners = [
                wire_coordinate(plane, y, z, half_height_cm)
                for y in (-half_height_cm, half_height_cm)
                for z in (z0, z1)
            ]
            center = (min(corners) + max(corners)) / 2.0
            c0 = int(round(center - tile_cols / 2.0))
            origins.append(int(np.clip(c0, 0, cols - tile_cols)))
        for r in rpos:
            triplets.append(
                TripletCrop(int(r), tuple(origins), (z0px, z1px))
            )
    return tuple(triplets)


def triplet_plane_grid(
    triplets: Sequence[TripletCrop], plane: int
) -> Tuple[Tuple[int, int], ...]:
    """Per-plane (row0, col0) grid view of a triplet set — feeds the
    existing extract_tiles/stitch_tiles device path."""
    return tuple(t.origin(plane) for t in triplets)


def triplet_consistent(
    t: TripletCrop,
    tile_cols: int = 832,
    half_height_cm: float = DET_HALF_HEIGHT_CM,
) -> bool:
    """True iff every detector point (y, z) in the triplet's z window
    maps inside the crop on all three planes (the 3D-consistency
    invariant UBSplitDetector guarantees)."""
    z0, z1 = (px * WIRE_PITCH_CM for px in t.z_window)
    for plane in (0, 1, 2):
        lo, hi = t.col0[plane], t.col0[plane] + tile_cols
        for y in (-half_height_cm, half_height_cm):
            for z in (z0, z1):
                w = wire_coordinate(plane, y, z, half_height_cm)
                if not (lo - 1e-6 <= w <= hi + 1e-6):
                    return False
    return True
