from ubresnet_tpu.data.meta import ImageMeta, Image2D  # noqa: F401
from ubresnet_tpu.data.uevt import EventFileReader, EventFileWriter  # noqa: F401
from ubresnet_tpu.data.synthetic import make_synthetic_file, synth_event  # noqa: F401
from ubresnet_tpu.data.loader import BatchLoader, SegmentDataset, DevicePrefetcher  # noqa: F401
from ubresnet_tpu.data.augment import mirror, pad_and_crop, remap_labels  # noqa: F401
