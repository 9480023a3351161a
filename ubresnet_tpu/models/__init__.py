from ubresnet_tpu.models.blocks import (  # noqa: F401
    BasicBlock,
    DoubleResNet,
    Deconv2x,
    DecoderBlock,
    ASPP,
    ASPPCombine,
)
from ubresnet_tpu.models.uresnet import UResNet, UResNetConfig  # noqa: F401
from ubresnet_tpu.models.aspp_resnet import ASPPResNet, ASPPResNetConfig  # noqa: F401
from ubresnet_tpu.models.registry import get_model, MODEL_REGISTRY  # noqa: F401
