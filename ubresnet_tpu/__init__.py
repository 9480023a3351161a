"""ubresnet_tpu — TPU-native semantic-segmentation framework for LArTPC images.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the
NuTufts/ubresnet reference stack (U-ResNet / ASPP-ResNet encoder-decoder
nets labelling every pixel of a MicroBooNE wire-plane image as
background / shower / track), designed TPU-first:

  * models:   flax/linen NHWC encoder-decoders feeding the MXU
              (reference: /root/reference/models/ub_uresnet.py,
               /root/reference/models/ASPP_ResNet.py)
  * losses:   pixel-weighted NLL, fused log-softmax path
              (reference: /root/reference/training/pixelwise_nllloss.py)
  * data:     event-file IO + threaded host prefetch + device
              double-buffering (reference: larcv ThreadProcessor /
              ThreadDatumFiller C++ stack)
  * parallel: jax.sharding Mesh + pjit data/model parallelism
              (reference: nn.DataParallel, SURVEY.md §2.3)
  * deploy:   precropped + wholeview crop-and-stitch inference
              (reference: /root/reference/deploy/)
"""

__version__ = "0.1.0"

from ubresnet_tpu.core.precision import Policy  # noqa: F401
