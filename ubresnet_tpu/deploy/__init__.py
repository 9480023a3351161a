from ubresnet_tpu.deploy.precropped import PrecroppedRunner  # noqa: F401
from ubresnet_tpu.deploy.wholeview import WholeViewRunner  # noqa: F401
from ubresnet_tpu.deploy.importers import (  # noqa: F401
    import_torch_checkpoint,
    load_reference_model,
)
from ubresnet_tpu.deploy.exporters import (  # noqa: F401
    export_uresnet_state_dict,
    save_reference_checkpoint,
)
