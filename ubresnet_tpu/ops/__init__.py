from ubresnet_tpu.ops.tiling import (  # noqa: F401
    tile_grid,
    extract_tiles,
    stitch_tiles,
)
