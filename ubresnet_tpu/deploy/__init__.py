from ubresnet_tpu.deploy.precropped import PrecroppedRunner  # noqa: F401
from ubresnet_tpu.deploy.wholeview import WholeViewRunner  # noqa: F401
from ubresnet_tpu.deploy.importers import (  # noqa: F401
    import_torch_checkpoint,
    load_reference_model,
)
