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
