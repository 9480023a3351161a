from ubresnet_tpu.core.precision import Policy  # noqa: F401
from ubresnet_tpu.core.mesh import make_mesh, batch_sharding  # noqa: F401
